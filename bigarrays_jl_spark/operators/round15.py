"""Round-15 batch (builder extension, SURVEY §2C):

``cm_heavyhitters`` — Count-Min sketch audit over document word
bigrams: a D×W integer bucket table (D=4 hash rows, W=1024 buckets —
4096 counters TOTAL at any corpus size) summarizes every bigram's
frequency; the query grades the sketch against exact truth by
estimating the exact top-20 bigrams through the sketch and reporting
the per-gram overestimate.  CM sketches never underestimate
(``cm_est ≥ exact_n`` structurally — each of the d counters holding a
gram is the gram's count plus its bucket-collisions), so the audit's
``overest`` column is a non-negative integer and the whole result is
hash-exact across engines: the bucket hash is the repo's md5-nibble
idiom (``conv(substr(md5(j:gram),1,8),16,10) % W`` — pure integer ops
both sides), counts are integers, no tolerance band anywhere.

This completes the mergeable-sketch family (KMV distinct counts,
decimal-HDR quantiles, and now CM frequencies): like the others the
sketch state is BOUNDED (4096 integers) and EXACTLY MERGEABLE (bucket
counts add), so ``streaming/cm.py`` runs the same sketch as per-batch
partials with snapshot == batch pinned, and N shards/datacenters merge
by bucket addition.

Scale shape: one map-side shingle fold to (distinct grams) rows, a ×D
explode shuffled onto D×W = 4096 keys, and the audit side joins only
the top-20 grams (broadcast-sized) against the 4096-row sketch.  At
100 TB the sketch is still 4096 integers; only the exact-truth leg
(the thing the sketch exists to replace) scales with the corpus, and
in production only the sketch side runs — the same exact-vs-sketch
pairing as sketch_union_distinct.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from bigarrays_jl_spark.functions.expressions import shingle_array
from bigarrays_jl_spark.sources.tables import load

CM_D = 4            # hash rows
CM_W = 1024         # buckets per row
CM_TOPK = 20


def cm_bucket(j: int, gram: Column) -> Column:
    """Row-``j`` CM bucket of a gram: first 8 md5 nibbles of
    ``"j:gram"`` as an exact BIGINT, mod W — the repo's cross-engine
    hash idiom (dedup.py minhash, round11d.py KMV)."""
    return (F.conv(F.substring(
        F.md5(F.concat(F.lit(f"{j}:"), gram)), 1, 8), 16, 10)
        .cast("bigint") % CM_W)


def gram_counts_of(docs: DataFrame) -> DataFrame:
    """Exact (gram, n) word-bigram counts of a ``text``-bearing frame —
    the shared front-end of the exact leg, the sketch build, and the
    streaming twin's per-batch partials (one canon, split on single
    spaces like the other n-gram operators)."""
    d = docs.select(F.split(F.col("text"), " ").alias("ws"))
    return (d.select(F.explode(shingle_array("ws", 2)).alias("gram"))
            .groupBy("gram").agg(F.count("*").alias("n")))


def gram_counts(spark: SparkSession, sf: str) -> DataFrame:
    return gram_counts_of(load(spark, sf, "documents"))


def cm_sketch_of(grams: DataFrame) -> DataFrame:
    """(gram, n) counts → the D×W bucket table ``(j, bucket, n)``.
    Built from the counted grams (not the raw explode) so the shuffle
    carries distinct-gram rows, then folds onto 4096 keys."""
    rows = grams.select(F.explode(F.array(*[
        F.struct(F.lit(j).alias("j"),
                 cm_bucket(j, F.col("gram")).alias("bucket"))
        for j in range(CM_D)])).alias("e"), "n")
    return (rows.select(F.col("e.j").alias("j"),
                        F.col("e.bucket").alias("bucket"), "n")
            .groupBy("j", "bucket").agg(F.sum("n").alias("n")))


def cm_heavyhitters(spark: SparkSession, sf: str) -> DataFrame:
    exact = gram_counts(spark, sf).localCheckpoint(eager=False)
    sketch = cm_sketch_of(exact)
    top = (exact.orderBy(F.col("n").desc(), "gram").limit(CM_TOPK)
           .select("gram", F.col("n").alias("exact_n")))
    probes = top.select("gram", "exact_n", F.explode(F.array(*[
        F.struct(F.lit(j).alias("j"),
                 cm_bucket(j, F.col("gram")).alias("bucket"))
        for j in range(CM_D)])).alias("e")) \
        .select("gram", "exact_n", "e.j", "e.bucket")
    return (probes.join(sketch, ["j", "bucket"])
            .groupBy("gram", "exact_n")
            .agg(F.min("n").cast("bigint").alias("cm_est"))
            .select("gram",
                    F.col("exact_n").cast("bigint").alias("exact_n"),
                    "cm_est",
                    (F.col("cm_est") - F.col("exact_n")).cast("bigint")
                    .alias("overest")))


# 8 md5 nibbles → exact int, digit-wise (DuckDB has no conv(); the
# KMV/simhash oracle idiom, round11d.py)
def _hex8(expr: str) -> str:
    return " + ".join(
        f"(strpos('0123456789abcdef', substr({expr}, {i + 1}, 1)) - 1) "
        f"* {16 ** (7 - i)}" for i in range(8))


CM_HEAVYHITTERS_SQL = f"""
WITH w AS (
  SELECT string_split(text, ' ') AS ws FROM documents),
g AS (
  SELECT ws[i] || ' ' || ws[i + 1] AS gram
  FROM w, UNNEST(range(1, len(ws))) u(i)
  WHERE len(ws) >= 2),
exact AS (
  SELECT gram, count(*) AS n FROM g GROUP BY gram),
b AS (
  SELECT gram, n, j,
         CAST({_hex8("md5(CAST(j AS VARCHAR) || ':' || gram)")} AS BIGINT) % {CM_W}
           AS bucket
  FROM exact, UNNEST(range(0, {CM_D})) u(j)),
sketch AS (
  SELECT j, bucket, sum(n) AS bn FROM b GROUP BY j, bucket),
top AS (
  SELECT gram, n AS exact_n FROM exact
  ORDER BY n DESC, gram LIMIT {CM_TOPK}),
est AS (
  SELECT t.gram, t.exact_n, min(s.bn) AS cm_est
  FROM top t
  JOIN b ON b.gram = t.gram
  JOIN sketch s ON s.j = b.j AND s.bucket = b.bucket
  GROUP BY t.gram, t.exact_n)
SELECT gram, CAST(exact_n AS BIGINT) AS exact_n,
       CAST(cm_est AS BIGINT) AS cm_est,
       CAST(cm_est - exact_n AS BIGINT) AS overest
FROM est
"""


QUERIES = {
    "cm_heavyhitters": cm_heavyhitters,
}

ORACLES = {
    "cm_heavyhitters": CM_HEAVYHITTERS_SQL,
}
