"""Scale-safe global-ordering primitives (no single-partition windows).

A bare whole-table ``ORDER BY`` window (``row_number()`` / running sum
with no PARTITION BY) plans as ``Exchange SinglePartition`` — every row
funnels through ONE task, which is correct at test scale and dead at
100 TB.  These helpers compute the exact same answers with the classic
two-phase distributed-rank pattern instead:

1. approximate range boundaries over the sort key
   (``percentile_approx``, one tiny driver list) assign each row to an
   ordered range bucket — ties share a bucket, so bucket order is a
   total pre-order of the sort key;
2. exact per-bucket weight totals (≤ #buckets rows to the driver)
   become cumulative offsets, broadcast back as a literal map;
3. the only window is per-bucket (bounded at ~n/buckets rows):
   global prefix sum = offset[bucket] + within-bucket prefix sum.

Bucket count tracks ``spark.sql.shuffle.partitions`` so the plan scales
with the cluster instead of a fixed-width funnel.  ``distributed_ntile``
(operators/advanced.py) and the corpus-packing / global-id operators
(operators/pipeline.py) are all built on this one primitive.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W


def distributed_prefix_sum(spark: SparkSession, df: DataFrame,
                           weight: Column, value: str, tiebreak: str,
                           out: str = "cum") -> tuple[DataFrame, int]:
    """``df`` plus column ``out`` = the inclusive prefix sum of
    ``weight`` over the global ``(value, tiebreak)`` order, computed
    without any whole-table window.  Returns ``(df, grand_total)``.

    ``weight`` must be an integral Column (per-bucket subtotals are
    collected to the driver as Python ints); ``value`` must be numeric
    (range boundaries come from ``percentile_approx``); ``(value,
    tiebreak)`` must be a total order for the result to be
    deterministic.  A constant ``F.lit(1)`` weight yields the global
    ``row_number``.
    """
    n_buckets = max(
        int(spark.conf.get("spark.sql.shuffle.partitions", "32")), 2)
    probs = [i / n_buckets for i in range(1, n_buckets)]
    head = df.select(F.percentile_approx(value, probs).alias("b")).first()
    raw = head["b"] if head is not None else None
    if raw is None:  # empty input: nothing to rank
        return df.withColumn(out, F.lit(None).cast("bigint")), 0
    bounds = sorted(set(float(x) for x in raw))
    barr = F.array(*[F.lit(x) for x in bounds])
    bucket = F.size(F.filter(barr, lambda b: F.col(value) > b))
    bucketed = df.withColumn("__bkt", bucket)

    per = {r["__bkt"]: r["s"] for r in
           bucketed.groupBy("__bkt").agg(F.sum(weight).alias("s")).collect()}
    offsets, acc = {}, 0
    for b in sorted(per):
        offsets[b] = acc
        acc += per[b]
    off_map = F.create_map(*[F.lit(v) for b in sorted(offsets)
                             for v in (b, offsets[b])])

    w = (W.partitionBy("__bkt").orderBy(value, tiebreak)
          .rowsBetween(W.unboundedPreceding, W.currentRow))
    cum = F.sum(weight).over(w) + F.element_at(off_map, F.col("__bkt"))
    return (bucketed.withColumn(out, cum.cast("bigint")).drop("__bkt"), acc)
