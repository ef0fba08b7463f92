"""Advanced operator coverage (SURVEY §2B): as-of join, exact percentiles,
unpivot, ntile, bucketed range join, row dedup, approximate aggregates,
and the oracle-checked volume bridge query.

The bucketed range join and the as-of join are the two patterns Spark
lacks natively; both are built as compositions of built-in ops (the
preferred strategy) with the bucketing trick keeping the join linear at
scale instead of O(n²).
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from bigarrays_jl_spark.operators.ordering import distributed_prefix_sum
from bigarrays_jl_spark.sources.tables import load


# --------------------------------------------------------------------------
# q24 — as-of join: each purchase matched to the user's most recent prior
# click.  Composition: union-tag + ordered window with last(ignorenulls) —
# one shuffle on user_id, no per-group Python.
# --------------------------------------------------------------------------

def q24_asof_join(spark: SparkSession, sf: str) -> DataFrame:
    e = load(spark, sf, "events").filter(F.col("event_type").isin("click", "purchase"))
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    click_ts = F.when(F.col("event_type") == "click", F.col("ts"))
    tagged = e.withColumn(
        "last_click", F.last(click_ts, ignorenulls=True).over(w))
    gap = F.expr("(unix_micros(ts) - unix_micros(last_click)) div 1000000")
    return (tagged.filter(F.col("event_type") == "purchase")
            .select("user_id", "event_id",
                    F.col("ts").alias("purchase_ts"),
                    "last_click",
                    F.when(F.col("last_click").isNotNull(), gap)
                     .alias("gap_seconds")))


Q24_SQL = """
WITH t AS (
  SELECT user_id, event_id, ts, event_type,
         last_value(CASE WHEN event_type = 'click' THEN ts END IGNORE NULLS)
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_click
  FROM events WHERE event_type IN ('click', 'purchase'))
SELECT user_id, event_id, ts AS purchase_ts, last_click,
       CASE WHEN last_click IS NOT NULL
            THEN (epoch_us(ts) - epoch_us(last_click)) // 1000000
       END AS gap_seconds
FROM t WHERE event_type = 'purchase'
"""


# --------------------------------------------------------------------------
# q25 — exact percentiles (linear interpolation — Spark `percentile` and
# DuckDB `quantile_cont` share the definition)
# --------------------------------------------------------------------------

def q25_percentiles(spark: SparkSession, sf: str) -> DataFrame:
    o = load(spark, sf, "orders")
    return (o.groupBy("o_orderstatus")
             .agg(F.round(F.percentile("o_totalprice", 0.5), 2).alias("p50"),
                  F.round(F.percentile("o_totalprice", 0.9), 2).alias("p90"),
                  F.round(F.percentile("o_totalprice", 0.99), 2).alias("p99"),
                  F.count("*").alias("n")))


Q25_SQL = """
SELECT o_orderstatus,
       round(quantile_cont(o_totalprice, 0.5), 2) AS p50,
       round(quantile_cont(o_totalprice, 0.9), 2) AS p90,
       round(quantile_cont(o_totalprice, 0.99), 2) AS p99,
       count(*) AS n
FROM orders GROUP BY o_orderstatus
"""


# --------------------------------------------------------------------------
# q26 — unpivot (stack): wide metrics → long form
# --------------------------------------------------------------------------

def q26_unpivot(spark: SparkSession, sf: str) -> DataFrame:
    l = load(spark, sf, "lineitem")
    long = l.select("l_returnflag", F.expr(
        "stack(3, 'quantity', l_quantity, 'price', l_extendedprice, "
        "'discount', l_discount) AS (metric, v)"))
    # decimal accumulation: quantity/price/discount all carry <=2dp, so
    # DECIMAL(18,2) sums are exact and partition-order independent (a
    # raw double F.sum could flip a half-cent boundary vs the oracle's
    # sequential fold at a different partitioning).  The OUTPUT column
    # is double (q36 pattern): a decimal-typed result column formats as
    # "506627.00" in Spark vs float "506627.0" through DuckDB→pandas,
    # which diverges any string-canonicalizing comparator even when the
    # values are identical.  Decimal partials internal, double out.
    return (long.groupBy("l_returnflag", "metric")
                .agg(F.sum(F.col("v").cast("decimal(18,2)")).alias("_t"),
                     F.count("*").alias("n"))
                .select("l_returnflag", "metric",
                        F.round(F.col("_t").cast("double"), 2).alias("total"),
                        "n"))


Q26_SQL = """
WITH long AS (
  SELECT l_returnflag, 'quantity' AS metric, l_quantity AS v FROM lineitem
  UNION ALL SELECT l_returnflag, 'price', l_extendedprice FROM lineitem
  UNION ALL SELECT l_returnflag, 'discount', l_discount FROM lineitem)
SELECT l_returnflag, metric,
       round(CAST(sum(CAST(v AS DECIMAL(18,2))) AS DOUBLE), 2) AS total,
       count(*) AS n
FROM long GROUP BY 1, 2
"""


# --------------------------------------------------------------------------
# q27 — scalar math functions (exact-representable outputs: abs/ceil/
# floor/mod/pow2; transcendentals rounded)
# --------------------------------------------------------------------------

def q27_math_funcs(spark: SparkSession, sf: str) -> DataFrame:
    l = load(spark, sf, "lineitem").filter(F.col("l_orderkey") <= 100)
    return l.select(
        "l_orderkey", "l_linenumber",
        F.abs(F.col("l_discount") - 0.05).alias("abs_d"),
        F.ceil("l_extendedprice").cast("bigint").alias("ceil_price"),
        F.floor("l_extendedprice").cast("bigint").alias("floor_price"),
        (F.col("l_orderkey") % 7).cast("bigint").alias("mod7"),
        F.round(F.pow(F.col("l_quantity"), 2), 2).alias("qty_sq"),
        F.round(F.log(F.col("l_extendedprice") + 1), 6).alias("log_price"),
        F.round(F.sqrt("l_quantity"), 6).alias("sqrt_qty"))


Q27_SQL = """
SELECT l_orderkey, l_linenumber,
       abs(l_discount - 0.05) AS abs_d,
       CAST(ceil(l_extendedprice) AS BIGINT) AS ceil_price,
       CAST(floor(l_extendedprice) AS BIGINT) AS floor_price,
       CAST(l_orderkey % 7 AS BIGINT) AS mod7,
       round(pow(l_quantity, 2), 2) AS qty_sq,
       round(ln(l_extendedprice + 1), 6) AS log_price,
       round(sqrt(l_quantity), 6) AS sqrt_qty
FROM lineitem WHERE l_orderkey <= 100
"""


# --------------------------------------------------------------------------
# q28 — ntile quartiles (deterministic: unique tie-break in the ordering)
#
# Scale shape: a bare `ntile(4) OVER (ORDER BY ...)` funnels the whole
# table through ONE task (Exchange SinglePartition) — correct at sf0.1,
# dead at 100 TB.  Instead we compute the exact global rank with the
# classic distributed-rank pattern and apply the standard ntile formula:
#   1. approx range boundaries (percentile_approx, one tiny driver list)
#      assign each row a range bucket — ties share a bucket, so bucket
#      order is a total pre-order of the sort key;
#   2. per-bucket row counts (a few dozen rows to the driver) become
#      cumulative offsets, broadcast back as a literal map;
#   3. rank = offset[bucket] + row_number within the bucket — the only
#      window is per-bucket, each bounded at ~n/buckets rows.
# Bucket count tracks spark.sql.shuffle.partitions, so the plan scales
# with the cluster instead of a fixed-width funnel.
# --------------------------------------------------------------------------

N_TILES = 4


def distributed_ntile(spark: SparkSession, df: DataFrame, n_tiles: int,
                      value: str, tiebreak: str) -> DataFrame:
    """``df`` plus a ``tile`` column (1..n_tiles) — exact ntile over
    (value, tiebreak) with no global window.

    rank = distributed_prefix_sum with a constant weight of 1 (the
    two-phase range-bucket pattern, operators/ordering.py); the
    standard ntile split (first n % n_tiles tiles get an extra row)
    then maps rank to tile.
    """
    ranked, total = distributed_prefix_sum(
        spark, df, F.lit(1), value, tiebreak, out="__rank")
    if total == 0:  # empty input: no rows to tile
        return ranked.withColumn("tile", F.lit(None).cast("int")) \
                     .drop("__rank")
    from bigarrays_jl_spark.operators.ordering import rank_to_tile
    return (ranked.withColumn(
        "tile", rank_to_tile(F.col("__rank"), F.lit(total), n_tiles))
        .drop("__rank"))


def q28_ntile(spark: SparkSession, sf: str) -> DataFrame:
    o = load(spark, sf, "orders").select("o_orderkey", "o_totalprice")
    tiled = distributed_ntile(spark, o, N_TILES, "o_totalprice", "o_orderkey")
    return (tiled.withColumnRenamed("tile", "quartile")
            .groupBy("quartile")
            .agg(F.count("*").alias("n_orders"),
                 F.round(F.min("o_totalprice"), 2).alias("lo"),
                 F.round(F.max("o_totalprice"), 2).alias("hi")))


Q28_SQL = """
WITH q AS (SELECT o_totalprice,
                  ntile(4) OVER (ORDER BY o_totalprice, o_orderkey) AS quartile
           FROM orders)
SELECT quartile, count(*) AS n_orders,
       round(min(o_totalprice), 2) AS lo, round(max(o_totalprice), 2) AS hi
FROM q GROUP BY quartile
"""


# --------------------------------------------------------------------------
# q29 — bucketed range join: pairs of events by the same user within 60
# seconds.  Scale path: bucket epoch÷60 and join on (user, bucket) with
# the earlier side exploded to {b, b+1} — linear in events, never O(n²);
# the exact Δt≤60 filter runs post-join.  Orientation is by TIME
# (earlier event on the exploded side), which makes the two-bucket
# cover complete by construction: the later event's bucket is always
# b or b+1.  An id-based orientation would silently drop pairs whose
# smaller id has the later timestamp.
# --------------------------------------------------------------------------

def q29_bucketed_range_join(spark: SparkSession, sf: str) -> DataFrame:
    e = (load(spark, sf, "events")
         .select("user_id", "event_id", F.col("ts").cast("long").alias("sec")))
    a = (e.withColumn("b", F.explode(F.array(
            (F.col("sec") / 60).cast("long"), (F.col("sec") / 60).cast("long") + 1)))
         .select(F.col("user_id").alias("u"), F.col("event_id").alias("ea"),
                 F.col("sec").alias("sa"), "b"))
    b = e.select(F.col("user_id").alias("u"), F.col("event_id").alias("eb"),
                 F.col("sec").alias("sb"),
                 (F.col("sec") / 60).cast("long").alias("b"))
    earlier = ((F.col("sa") < F.col("sb"))
               | ((F.col("sa") == F.col("sb")) & (F.col("ea") < F.col("eb"))))
    pairs = (a.join(b, ["u", "b"])
              .filter(earlier & (F.col("sb") - F.col("sa") <= 60)))
    return (pairs.select("u", F.least("ea", "eb").alias("e1"),
                         F.greatest("ea", "eb").alias("e2")).distinct()
                 .groupBy("u").agg(F.count("*").alias("n_close_pairs")))


# floor(epoch_us/1e6) floors like Spark's cast(ts as long) for ALL
# timestamps: DuckDB's epoch() *rounds* fractional seconds and its `//`
# truncates toward zero (wrong pre-1970).  The double division is exact
# enough: |epoch_us| < 2^53 so the quotient's nearest-double error is
# below half an ulp (~2.4e-7 s at 2025 epochs), smaller than the 1e-6 s
# granularity separating a true quotient from the next integer.
Q29_SQL = """
SELECT a.user_id AS u, count(*) AS n_close_pairs
FROM events a JOIN events b
  ON a.user_id = b.user_id AND a.event_id < b.event_id
 AND abs(CAST(floor(epoch_us(a.ts) / 1000000) AS BIGINT)
         - CAST(floor(epoch_us(b.ts) / 1000000) AS BIGINT)) <= 60
GROUP BY a.user_id
"""


# --------------------------------------------------------------------------
# q30 — row-level dedup: keep the earliest event per (user, type, day)
# --------------------------------------------------------------------------

def q30_dedup_rows(spark: SparkSession, sf: str) -> DataFrame:
    e = load(spark, sf, "events")
    day = F.date_trunc("day", F.col("ts"))
    w = W.partitionBy("user_id", "event_type", day).orderBy("ts", "event_id")
    return (e.withColumn("rn", F.row_number().over(w))
             .filter(F.col("rn") == 1)
             .select("user_id", "event_type", day.alias("day"), "event_id"))


Q30_SQL = """
WITH r AS (
  SELECT user_id, event_type, CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
         event_id,
         row_number() OVER (PARTITION BY user_id, event_type, date_trunc('day', ts)
                            ORDER BY ts, event_id) AS rn
  FROM events)
SELECT user_id, event_type, day, event_id FROM r WHERE rn = 1
"""


# --------------------------------------------------------------------------
# q31 — approximate aggregates (HLL + approx quantile).  The raw sketch
# values are engine-specific, so they can't be hash-compared — but the
# sketches' ACCURACY CONTRACT is deterministic: Spark's HLL++ and GK
# quantile are seedless (same data → same estimate), so
# |approx − exact| ≤ tol·exact is a stable boolean both engines agree
# on (the oracle asserts TRUE because the contract is the spec).  The
# output carries the exact values plus those booleans — fully
# hash-comparable, no raw sketch cells.
#   Q31_HLL_TOL: approx_count_distinct's default rsd is 0.05 (1σ), so a
#   5% gate would flip on ordinary 1-2σ estimation error; 15% ≈ 3σ.
#   The quantile gate stays at 5%: percentile_approx picks a real
#   element, and adjacent-element gaps are ≪5% at any SF here.
# --------------------------------------------------------------------------

Q31_HLL_TOL = 0.15
Q31_P50_TOL = 0.05


def q31_approx_aggs(spark: SparkSession, sf: str) -> DataFrame:
    l = load(spark, sf, "lineitem")
    g = (l.groupBy("l_returnflag")
          .agg(F.approx_count_distinct("l_partkey").alias("_acd"),
               F.countDistinct("l_partkey").alias("exact_parts"),
               F.percentile_approx("l_extendedprice", 0.5).alias("_ap50"),
               F.percentile("l_extendedprice", 0.5).alias("_ep50")))
    return g.select(
        "l_returnflag", "exact_parts",
        F.round(F.col("_ep50"), 2).alias("exact_p50"),
        (F.abs(F.col("_acd") - F.col("exact_parts"))
         <= F.lit(Q31_HLL_TOL) * F.col("exact_parts")).alias("cd_within_tol"),
        (F.abs(F.col("_ap50") - F.col("_ep50"))
         <= F.lit(Q31_P50_TOL) * F.abs(F.col("_ep50")))
         .alias("p50_within_tol"))


Q31_SQL = """
SELECT l_returnflag,
       count(DISTINCT l_partkey) AS exact_parts,
       round(quantile_cont(l_extendedprice, 0.5), 2) AS exact_p50,
       TRUE AS cd_within_tol,
       TRUE AS p50_within_tol
FROM lineitem GROUP BY l_returnflag
"""


# --------------------------------------------------------------------------
# volume bridge: the chunked-array engine answering a relational query.
# The voxel pattern is closed-form ((x*31+y*7+z) % 256), so DuckDB can
# oracle the full pipeline: ingest → chunk store → pruned cutout → voxel
# view → aggregation.
# --------------------------------------------------------------------------

def demo_volume(spark: SparkSession):
    """The PID-keyed scratch volume shared by every volume↔relational
    bridge query (64³ uint8, value = (x·31 + y·7 + z) % 256 — closed
    form, so DuckDB oracles reproduce any slice with range())."""
    import numpy as np
    from bigarrays_jl_spark.infos import Info
    from bigarrays_jl_spark.volume import Volume

    info = Info.from_dict({
        "num_channels": 1, "type": "image", "data_type": "uint8",
        "scales": [{"encoding": "gzip", "chunk_sizes": [[16, 16, 16]],
                    "key": "1_1_1", "resolution": [1, 1, 1],
                    "voxel_offset": [0, 0, 0], "size": [64, 64, 64]}]})
    # one scratch volume per process, keyed by PID: repeated invocations
    # (driver grading, benches, test reruns) reuse it instead of leaking
    # a fresh mkdtemp + paying the ingest write per call.  Reuse keys on
    # a SENTINEL written only after the chunk write completed — `info`
    # alone exists as soon as Volume.create returns, so keying on it
    # would silently reopen a half-ingested volume after a crash (or a
    # PID-colliding process) and return wrong sums instead of rebuilding
    root = os.path.join(tempfile.gettempdir(),
                        f"bigarrays_volq_{os.getpid()}", "vol")
    sentinel = os.path.join(os.path.dirname(root), "INGEST_COMPLETE")
    if os.path.exists(sentinel):
        vol = Volume.open(spark, root)
    else:
        import shutil
        shutil.rmtree(root, ignore_errors=True)  # partial earlier attempt
        vol = Volume.create(spark, root, info)
        x, y, z = np.meshgrid(np.arange(64), np.arange(64), np.arange(64),
                              indexing="ij")
        arr = ((x * 31 + y * 7 + z) % 256).astype(np.uint8)
        vol.write(arr, (0, 0, 0))
        with open(sentinel, "w") as f:
            f.write("ok")
    return vol


def volume_cutout_sum(spark: SparkSession, sf: str) -> DataFrame:
    vol = demo_volume(spark)
    vox = vol.voxels(((8, 40), (16, 48), (0, 32)), columns=("z", "value"))
    return (vox.groupBy("z")
               .agg(F.sum("value").cast("bigint").alias("sum_v"),
                    F.count("*").alias("n_voxels")))


VOLUME_CUTOUT_SUM_SQL = """
WITH v AS (
  SELECT CAST(x.range AS BIGINT) AS x, CAST(y.range AS BIGINT) AS y,
         CAST(z.range AS BIGINT) AS z
  FROM range(8, 40) x, range(16, 48) y, range(0, 32) z)
SELECT CAST(z AS INT) AS z,
       CAST(sum((x * 31 + y * 7 + z) % 256) AS BIGINT) AS sum_v,
       count(*) AS n_voxels
FROM v GROUP BY z
"""


# --------------------------------------------------------------------------
# q32 — left outer join with null-aware aggregation (customers keep a row
# even with zero orders)
# --------------------------------------------------------------------------

def q32_left_outer(spark: SparkSession, sf: str) -> DataFrame:
    c = load(spark, sf, "customer")
    o = load(spark, sf, "orders")
    return (c.join(o, c.c_custkey == o.o_custkey, "left_outer")
             .groupBy("c_custkey", "c_mktsegment")
             .agg(F.count("o_orderkey").alias("n_orders"),
                  F.round(F.coalesce(F.sum("o_totalprice"), F.lit(0.0)), 2)
                   .alias("total_spend")))


Q32_SQL = """
SELECT c_custkey, c_mktsegment, count(o_orderkey) AS n_orders,
       round(CAST(coalesce(sum(o_totalprice), 0.0) AS DOUBLE), 2) AS total_spend
FROM customer LEFT OUTER JOIN orders ON c_custkey = o_custkey
GROUP BY c_custkey, c_mktsegment
"""


# --------------------------------------------------------------------------
# q33 — full outer join: parts catalog vs parts actually shipped
# --------------------------------------------------------------------------

def q33_full_outer(spark: SparkSession, sf: str) -> DataFrame:
    p = load(spark, sf, "part").select("p_partkey", "p_type")
    shipped = (load(spark, sf, "lineitem")
               .groupBy("l_partkey").agg(F.count("*").alias("n_shipped")))
    return (p.join(shipped, p.p_partkey == shipped.l_partkey, "full_outer")
             .select(F.coalesce("p_partkey", "l_partkey").alias("partkey"),
                     F.col("p_type").alias("p_type"),
                     F.coalesce("n_shipped", F.lit(0)).cast("bigint")
                      .alias("n_shipped"),
                     F.col("p_partkey").isNotNull().alias("in_catalog")))


Q33_SQL = """
SELECT coalesce(p_partkey, l_partkey) AS partkey, p_type,
       CAST(coalesce(n_shipped, 0) AS BIGINT) AS n_shipped,
       p_partkey IS NOT NULL AS in_catalog
FROM part FULL OUTER JOIN
     (SELECT l_partkey, count(*) AS n_shipped FROM lineitem GROUP BY l_partkey) s
  ON p_partkey = l_partkey
"""


# --------------------------------------------------------------------------
# q34 — explicit cross join (dimension grid)
# --------------------------------------------------------------------------

def q34_cross_join(spark: SparkSession, sf: str) -> DataFrame:
    r = load(spark, sf, "region").select("r_name")
    s = load(spark, sf, "orders").select("o_orderstatus").distinct()
    return r.crossJoin(s).select("r_name", "o_orderstatus")


Q34_SQL = """
SELECT r_name, o_orderstatus
FROM region CROSS JOIN (SELECT DISTINCT o_orderstatus FROM orders)
"""


# --------------------------------------------------------------------------
# q35 — whole-partition statistics: each order vs its priority class
# (avg/share) — the "compare to group aggregate" pattern.
#
# Scale shape: `OVER (PARTITION BY o_orderpriority)` pushes the whole
# fact table through ~5 reducers — the exact skew q36 exists to avoid.
# Instead: salted two-phase aggregation of (count, sum) per class (the
# q36 pattern), then a broadcast join back onto the rows — identical
# result, no window, no low-cardinality shuffle.  Sums are exact
# DECIMAL(18,2) so the two-phase fold is order-insensitive and the
# derived avg is bit-identical on both engines.
# --------------------------------------------------------------------------

def q35_window_partition_stats(spark: SparkSession, sf: str) -> DataFrame:
    o = load(spark, sf, "orders")
    dec = F.col("o_totalprice").cast("decimal(18,2)")
    partial = (o.withColumn("salt", F.pmod(F.hash("o_orderkey"),
                                           F.lit(SALT_BUCKETS)))
                .groupBy("o_orderpriority", "salt")
                .agg(F.count("*").alias("n"), F.sum(dec).alias("s")))
    stats = (partial.groupBy("o_orderpriority")
             .agg(F.sum("n").alias("n"), F.sum("s").alias("s"))
             .select("o_orderpriority",
                     (F.col("s").cast("double") / F.col("n")).alias("cls_avg"),
                     F.col("s").cast("double").alias("cls_sum")))
    return (o.join(F.broadcast(stats), "o_orderpriority")
             .select("o_orderkey", "o_orderpriority",
                     F.round(F.col("o_totalprice") - F.col("cls_avg"), 2)
                      .alias("delta_from_avg"),
                     F.round(F.col("o_totalprice") / F.col("cls_sum") * 100, 6)
                      .alias("pct_of_class")))


# exact decimal class sums, then one double division — both engines see
# the identical double inputs, so round() agrees everywhere
Q35_SQL = """
WITH s AS (
  SELECT o_orderpriority AS k, count(*) AS n,
         CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS s
  FROM orders GROUP BY 1)
SELECT o_orderkey, o_orderpriority,
       round(o_totalprice - s / n, 2) AS delta_from_avg,
       round(o_totalprice / s * 100, 6) AS pct_of_class
FROM orders JOIN s ON o_orderpriority = k
"""


# --------------------------------------------------------------------------
# q37 — map-typed columns: build a per-status priority→count map
# (map_from_entries), then query it with map_keys / element_at / an
# aggregate fold over map_values.  The oracle computes the same numbers
# relationally — verifying the map round-trip end-to-end.
# --------------------------------------------------------------------------

def q37_map_funcs(spark: SparkSession, sf: str) -> DataFrame:
    o = load(spark, sf, "orders")
    counts = (o.groupBy("o_orderstatus", "o_orderpriority")
               .agg(F.count("*").alias("cnt")))
    m = (counts.groupBy("o_orderstatus")
         .agg(F.map_from_entries(
             F.array_sort(F.collect_list(F.struct("o_orderpriority", "cnt"))))
             .alias("prio_map")))
    return m.select(
        "o_orderstatus",
        F.size(F.map_keys("prio_map")).alias("n_priorities"),
        F.coalesce(F.element_at("prio_map", "1-URGENT"), F.lit(0))
         .cast("bigint").alias("urgent_cnt"),
        F.aggregate(F.map_values("prio_map"), F.lit(0).cast("bigint"),
                    lambda acc, x: acc + x).alias("total_orders"))


Q37_SQL = """
SELECT o_orderstatus,
       CAST(count(DISTINCT o_orderpriority) AS INT) AS n_priorities,
       CAST(count(*) FILTER (WHERE o_orderpriority = '1-URGENT') AS BIGINT)
         AS urgent_cnt,
       CAST(count(*) AS BIGINT) AS total_orders
FROM orders GROUP BY o_orderstatus
"""


# --------------------------------------------------------------------------
# q36 — salted two-phase aggregation: the skew pattern.  event_type has
# ~5 values; at 100 TB a straight groupBy(event_type) funnels the whole
# table into 5 reducers.  Salting fans each hot key across 16 partial
# groups (map-side combine still applies), then a second, tiny
# aggregation folds the partials.  Decomposing avg into sum/count makes
# the two-phase fold exact.
# --------------------------------------------------------------------------

SALT_BUCKETS = 16


def q36_salted_agg(spark: SparkSession, sf: str) -> DataFrame:
    e = load(spark, sf, "events")
    partial = (e.withColumn("salt", F.pmod(F.hash("event_id"),
                                           F.lit(SALT_BUCKETS)))
                .groupBy("event_type", "salt")
                .agg(F.count("*").alias("n"),
                     # DECIMAL(25,10) partials: the two-phase fold is then
                     # genuinely exact/partition-order independent (a double
                     # fold is not, whatever the phase count)
                     F.sum(F.col("value").cast("decimal(25,10)")).alias("s")))
    return (partial.groupBy("event_type")
            .agg(F.sum("n").cast("bigint").alias("n_events"),
                 F.round(F.sum("s").cast("double"), 2).alias("total_value"),
                 F.round(F.sum("s").cast("double") / F.sum("n"), 6)
                  .alias("avg_value")))


Q36_SQL = """
SELECT event_type, CAST(count(*) AS BIGINT) AS n_events,
       round(CAST(sum(CAST(value AS DECIMAL(25,10))) AS DOUBLE), 2)
         AS total_value,
       round(CAST(sum(CAST(value AS DECIMAL(25,10))) AS DOUBLE) / count(*), 6)
         AS avg_value
FROM events GROUP BY event_type
"""


# --------------------------------------------------------------------------
# q38 — salted skew JOIN: the broadcast-ineligible-skew counterpart of
# q36's salted aggregation.  event_type has ~5 values, so a plain
# shuffle join funnels the whole fact table through 5 reducers — and
# AQE's skew split cannot help a *hash* partitioning where one key IS
# one partition's entire contents on both sides of the same exchange.
# Salting: fact rows draw salt = hash(event_id) % S; the dim replicates
# S ways; joining on (key, salt) spreads every hot key across S
# partitions.  The shuffle_hash hint stands in for "dim too large to
# broadcast" (with a genuinely tiny dim Spark would broadcast and the
# demo would be vacuous).  Weighted sums accumulate in exact decimals
# (the _dsum2 rule) so the salted fold order cannot flip a rounding.
# --------------------------------------------------------------------------

EVENT_WEIGHTS = [("click", "1.50"), ("view", "0.25"), ("purchase", "10.00"),
                 ("signup", "5.00"), ("error", "0.00")]


def q38_salted_join(spark: SparkSession, sf: str) -> DataFrame:
    e = load(spark, sf, "events")
    dim = spark.sql(
        "SELECT * FROM VALUES "
        + ", ".join(f"('{t}', CAST({w} AS DECIMAL(4,2)))"
                    for t, w in EVENT_WEIGHTS)
        + " AS dim(event_type, weight)")
    fact = e.withColumn("salt", F.pmod(F.hash("event_id"),
                                       F.lit(SALT_BUCKETS)))
    dim_r = (dim.withColumn("salt", F.explode(F.array(
                 *[F.lit(i) for i in range(SALT_BUCKETS)])))
                .hint("shuffle_hash"))
    j = fact.join(dim_r, ["event_type", "salt"])
    return (j.groupBy("event_type")
             .agg(F.count("*").alias("n_events"),
                  F.round(F.sum(F.col("value").cast("decimal(18,6)")
                                * F.col("weight")), 2)
                   .cast("double").alias("weighted_value")))


Q38_SQL = f"""
WITH dim(event_type, weight) AS (VALUES {", ".join(
    f"('{t}', CAST({w} AS DECIMAL(4,2)))" for t, w in EVENT_WEIGHTS)})
SELECT e.event_type, count(*) AS n_events,
       CAST(round(sum(CAST(value AS DECIMAL(18,6)) * weight), 2) AS DOUBLE)
         AS weighted_value
FROM events e JOIN dim d ON e.event_type = d.event_type
GROUP BY e.event_type
"""


# --------------------------------------------------------------------------
# q39 — RANGE-frame window: trailing 10-minute per-user event stats.
# Complements q08's ROWS frame: RANGE frames bound by the ORDER value
# (peers included), not row position.  Ordering is integer epoch
# seconds (floored identically on both engines); the frame sum
# accumulates in exact decimals so frame evaluation order can't drift.
# Scale shape: window partitioned by high-cardinality user_id — state
# per task is one user's trailing horizon, never a global funnel.
# --------------------------------------------------------------------------

def q39_range_frame_window(spark: SparkSession, sf: str) -> DataFrame:
    e = load(spark, sf, "events").filter(F.col("user_id") < 30)
    sec = F.col("ts").cast("long")
    w = W.partitionBy("user_id").orderBy(sec).rangeBetween(-600, 0)
    return e.select(
        "user_id", "event_id",
        F.count("*").over(w).alias("n_trailing_10m"),
        F.round(F.sum(F.col("value").cast("decimal(18,6)")).over(w), 2)
         .cast("double").alias("value_trailing_10m"))


Q39_SQL = """
SELECT user_id, event_id,
       count(*) OVER w AS n_trailing_10m,
       CAST(round(sum(CAST(value AS DECIMAL(18,6))) OVER w, 2) AS DOUBLE)
         AS value_trailing_10m
FROM (SELECT user_id, event_id, value,
             CAST(floor(epoch_us(ts) / 1000000) AS BIGINT) AS sec
      FROM events WHERE user_id < 30)
WINDOW w AS (PARTITION BY user_id ORDER BY sec
             RANGE BETWEEN 600 PRECEDING AND CURRENT ROW)
"""


# --------------------------------------------------------------------------
# q40 — correlated scalar subquery (TPC-H Q17 shape): revenue from
# "small-quantity" lineitems, where small means below half the average
# quantity FOR THAT PART.  Written SQL-first so Catalyst's decorrelation
# does the rewrite: the per-row correlated aggregate becomes ONE
# grouped aggregate over lineitem joined back on l_partkey — no
# nested-loop re-execution per outer row.  (l_quantity is
# integer-valued, so avg() is an exact double on both engines and the
# `<` comparison can't flip on fold order.)
# Scale shape: two scans of lineitem, one hash agg keyed by the
# high-cardinality l_partkey, equi-joins all the way — the same plan
# you'd hand-write, derived automatically from the declarative form.
# --------------------------------------------------------------------------

Q40_SQL = """
SELECT p.p_brand,
       CAST(round(sum(CAST(l.l_extendedprice AS DECIMAL(18,6))), 2) AS DOUBLE)
         AS small_qty_revenue,
       count(*) AS n_small
FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
WHERE p.p_size <= 10
  AND l.l_quantity < (SELECT 0.5 * avg(l2.l_quantity) FROM lineitem l2
                      WHERE l2.l_partkey = l.l_partkey)
GROUP BY p.p_brand
"""


def q40_correlated_scalar(spark: SparkSession, sf: str) -> DataFrame:
    from bigarrays_jl_spark.sources.tables import register_views
    register_views(spark, sf, tables=["part", "lineitem"])
    return spark.sql(Q40_SQL)



# --------------------------------------------------------------------------
# q42 — statistical aggregates (variance / stddev / covariance /
# correlation) computed from exact DECIMAL power sums, not the built-in
# streaming moment aggregates.  Spark's stddev/corr use an
# order-dependent incremental update, so their last-ulp result varies
# with partitioning; the power-sum formulation (n, Σx, Σy, Σx², Σy²,
# Σxy accumulated in DECIMAL(28,6)) is bit-reproducible on any cluster
# size and lets both engines evaluate the identical closed forms.
# Per-row products are exact in double here (quantity is integer-valued
# ≤ 50, price has 2 decimals < 2^53 after squaring), so the decimal
# casts lose nothing.
# Scale shape: one map-side-partial hash agg on the group key — the
# same single-shuffle plan as any sum; no second pass, no window.
# --------------------------------------------------------------------------

def q42_stats_aggs(spark: SparkSession, sf: str) -> DataFrame:
    l = load(spark, sf, "lineitem")
    d = lambda c: F.sum(c.cast("decimal(28,6)"))  # noqa: E731
    x, y = F.col("l_quantity"), F.col("l_extendedprice")
    agg = l.groupBy("l_returnflag").agg(
        F.count("*").alias("n"),
        d(x).alias("sx"), d(y).alias("sy"),
        d(x * x).alias("sxx"), d(y * y).alias("syy"),
        d(x * y).alias("sxy"))
    nd = F.col("n").cast("double")
    sx, sy = F.col("sx").cast("double"), F.col("sy").cast("double")
    sxx, syy = F.col("sxx").cast("double"), F.col("syy").cast("double")
    sxy = F.col("sxy").cast("double")
    var_q = (sxx - sx * sx / nd) / (nd - 1)
    covar = (sxy - sx * sy / nd) / (nd - 1)
    corr = ((nd * sxy - sx * sy)
            / (F.sqrt(nd * sxx - sx * sx) * F.sqrt(nd * syy - sy * sy)))
    return agg.select(
        "l_returnflag", "n",
        F.round(var_q, 4).alias("var_qty"),
        F.round(F.sqrt(var_q), 6).alias("stddev_qty"),
        F.round(covar, 2).alias("covar_qty_price"),
        F.round(corr, 6).alias("corr_qty_price"))


Q42_SQL = """
WITH s AS (
  SELECT l_returnflag, count(*) AS n,
         sum(CAST(l_quantity AS DECIMAL(28,6))) AS sx,
         sum(CAST(l_extendedprice AS DECIMAL(28,6))) AS sy,
         sum(CAST(l_quantity * l_quantity AS DECIMAL(28,6))) AS sxx,
         sum(CAST(l_extendedprice * l_extendedprice AS DECIMAL(28,6))) AS syy,
         sum(CAST(l_quantity * l_extendedprice AS DECIMAL(28,6))) AS sxy
  FROM lineitem GROUP BY l_returnflag),
c AS (
  SELECT l_returnflag, n,
         CAST(n AS DOUBLE) AS nd,
         CAST(sx AS DOUBLE) AS sx, CAST(sy AS DOUBLE) AS sy,
         CAST(sxx AS DOUBLE) AS sxx, CAST(syy AS DOUBLE) AS syy,
         CAST(sxy AS DOUBLE) AS sxy
  FROM s)
SELECT l_returnflag, n,
       round((sxx - sx * sx / nd) / (nd - 1), 4) AS var_qty,
       round(sqrt((sxx - sx * sx / nd) / (nd - 1)), 6) AS stddev_qty,
       round((sxy - sx * sy / nd) / (nd - 1), 2) AS covar_qty_price,
       round((nd * sxy - sx * sy)
             / (sqrt(nd * sxx - sx * sx) * sqrt(nd * syy - sy * sy)), 6)
         AS corr_qty_price
FROM c
"""


QUERIES = {
    "q24_asof_join": q24_asof_join,
    "q25_percentiles": q25_percentiles,
    "q26_unpivot": q26_unpivot,
    "q27_math_funcs": q27_math_funcs,
    "q28_ntile": q28_ntile,
    "q29_bucketed_range_join": q29_bucketed_range_join,
    "q30_dedup_rows": q30_dedup_rows,
    "q31_approx_aggs": q31_approx_aggs,
    "q32_left_outer": q32_left_outer,
    "q33_full_outer": q33_full_outer,
    "q34_cross_join": q34_cross_join,
    "q35_window_partition_stats": q35_window_partition_stats,
    "q36_salted_agg": q36_salted_agg,
    "q37_map_funcs": q37_map_funcs,
    "q38_salted_join": q38_salted_join,
    "q39_range_frame_window": q39_range_frame_window,
    "q40_correlated_scalar": q40_correlated_scalar,
    "q42_stats_aggs": q42_stats_aggs,
    "volume_cutout_sum": volume_cutout_sum,
}

ORACLES = {
    "q24_asof_join": Q24_SQL,
    "q25_percentiles": Q25_SQL,
    "q26_unpivot": Q26_SQL,
    "q27_math_funcs": Q27_SQL,
    "q28_ntile": Q28_SQL,
    "q29_bucketed_range_join": Q29_SQL,
    "q30_dedup_rows": Q30_SQL,
    "q31_approx_aggs": Q31_SQL,
    "q32_left_outer": Q32_SQL,
    "q33_full_outer": Q33_SQL,
    "q34_cross_join": Q34_SQL,
    "q35_window_partition_stats": Q35_SQL,
    "q36_salted_agg": Q36_SQL,
    "q37_map_funcs": Q37_SQL,
    "q38_salted_join": Q38_SQL,
    "q39_range_frame_window": Q39_SQL,
    "q40_correlated_scalar": Q40_SQL,
    "q42_stats_aggs": Q42_SQL,
    "volume_cutout_sum": VOLUME_CUTOUT_SUM_SQL,
}

# (r7: q31 moved to a full hash oracle — the sketch cells were replaced
# by deterministic accuracy booleans, see Q31_SQL above — so this module
# no longer needs a TOLERANCE_ORACLES escape hatch.)
