"""Round-11 batch 4 (builder extension, SURVEY §2C):

- ``kmv_distinct_users`` — K-Minimum-Values distinct-count sketch made
  cross-engine DETERMINISTIC: the hash is md5 (identical text in both
  engines, first 15 hex digits → 60-bit integer), so the k-th minimum
  — and therefore the KMV estimate (k−1)/(kth_min/2⁶⁰) — is the same
  EXACT value on both sides, letting a sketch algorithm ride the full
  value-hash oracle instead of a tolerance band.  Per event type:
  exact distinct users, the KMV estimate from k = 64 minima, and the
  signed relative error.  The sketch class every 100 TB cardinality
  dashboard runs (HLL's plan shape, but auditable).
- ``markov_backtest`` — next-event-type prediction backtest: the
  per-type modal successor is TRAINED on the first three weeks of
  per-user transitions and SCORED on the rest (temporal split, no
  leakage).  Min-type tie canon for the argmax; exact integer
  accuracy per antecedent type.  The model-evaluation class next to
  q83's seasonal-naive forecast backtest.
- ``text_zipf_fit`` — Zipf/power-law diagnostic of the corpus token
  distribution: OLS slope of ln(freq) on ln(rank) over the full
  rank-frequency table.  Ranks are exact integers from one count sort;
  the ln terms go through the round-9-decimal canon
  (text_bigram_logprob's rule) so the five OLS moments are exact
  decimals and the slope closes in doubles once.

Scale: KMV pre-prunes with a two-level top-K-min — per-(type,
hash-range-bucket) counts (map-side combinable) pick the prefix of
1024 ordered buckets covering the first k rows, so the per-type rank
window sees ~k + n/1024 candidate rows instead of every distinct
(type, user); the backtest reduces facts to per-user lead()
transitions (user-keyed window), then to (type, next) cells; Zipf's
global frequency rank is a distributed_prefix_sum (ordering.py), not
a whole-vocabulary ORDER BY window — the vocabulary grows ~Heaps-law
with the corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from bigarrays_jl_spark.operators.ordering import distributed_prefix_sum
from bigarrays_jl_spark.sources.tables import load

KMV_K = 64
HASH_BITS = 60                      # 15 hex digits: exact in int64/double
TRAIN_DAYS = 21


def kmv_distinct_users(spark: SparkSession, sf: str) -> DataFrame:
    """Per event type: exact distinct users, the deterministic KMV
    estimate from the 64 smallest md5 values, and the relative error."""
    e = (load(spark, sf, "events")
         .select("event_type", "user_id").distinct()
         .withColumn("h", F.conv(F.substring(
             F.md5(F.col("user_id").cast("string")), 1, 15), 16, 10)
             .cast("bigint")))
    # exact k-th-min with a REAL pre-prune (not just a per-type window:
    # one event type can hold most of a 100 TB corpus's users, so the
    # bare rank window funnels that type through one task).  Two-level
    # top-K-min: bucket h into NB ordered range slices (shiftright —
    # exact, monotone in h), count per (type, bucket) — map-side
    # combinable — then keep only the prefix of buckets needed to cover
    # the first K rows (cum − c < K ⇒ the bucket still contributes).
    # The cumulative window runs over ≤ NB rows per type (fixed domain,
    # allowlisted); the rank window then sees ~K + n/NB candidate rows
    # per type instead of every distinct (type, user).  Exact for ANY
    # distribution: skew only widens the candidate set, never drops the
    # true k-th minimum.
    NB_SHIFT = HASH_BITS - 10                     # 1024 range buckets
    b = e.withColumn("bk", F.shiftright(F.col("h"), NB_SHIFT))
    cnt = b.groupBy("event_type", "bk").agg(F.count("*").alias("c"))
    cw = (W.partitionBy("event_type").orderBy("bk")
          .rowsBetween(W.unboundedPreceding, 0))
    cut = (cnt.withColumn("cum", F.sum("c").over(cw))
           .filter(F.col("cum") - F.col("c") < KMV_K)
           .groupBy("event_type").agg(F.max("bk").alias("cut_bk")))
    cand = b.join(F.broadcast(cut), "event_type") \
            .filter(F.col("bk") <= F.col("cut_bk"))
    w = W.partitionBy("event_type").orderBy("h", "user_id")
    kth = (cand.withColumn("rn", F.row_number().over(w))
           .filter(F.col("rn") == KMV_K)
           .select("event_type", F.col("h").alias("kth")))
    exact = (e.groupBy("event_type")
             .agg(F.countDistinct("user_id").alias("n_exact")))
    # sub-k keys (a corpus with fewer than k distinct users) estimate
    # exactly by fill count — the standard KMV small-cardinality case,
    # and what the streaming twin reports before its sketch fills
    est = (F.when(F.col("kth").isNull(),
                  F.col("n_exact").cast("double"))
           .otherwise(F.lit(float(KMV_K - 1))
                      / (F.col("kth").cast("double")
                         / F.lit(float(2 ** HASH_BITS)))))
    return (exact.join(kth, "event_type", "left")
            .select("event_type",
                    F.col("n_exact").cast("bigint").alias("n_exact"),
                    F.round(est, 4).alias("kmv_estimate"),
                    F.round((est - F.col("n_exact").cast("double"))
                            / F.col("n_exact").cast("double"), 6)
                    .alias("rel_err")))


# hex → int digit-wise (the simhash-oracle idiom): DuckDB has no
# conv(); 15 nibbles keep the value < 2^60, exact in BIGINT
_HEX15 = " + ".join(
    f"(strpos('0123456789abcdef', substr(md, {i + 1}, 1)) - 1) "
    f"* {16 ** (14 - i)}" for i in range(15))

KMV_SQL = f"""
WITH e AS (
  SELECT DISTINCT event_type, user_id FROM events),
h AS (
  SELECT event_type, user_id, CAST({_HEX15} AS BIGINT) AS h
  FROM (SELECT event_type, user_id,
               md5(CAST(user_id AS VARCHAR)) AS md FROM e)),
kth AS (
  SELECT event_type, h AS kth FROM (
    SELECT event_type, h,
           row_number() OVER (PARTITION BY event_type
                              ORDER BY h, user_id) AS rn
    FROM h) WHERE rn = {KMV_K}),
exact AS (
  SELECT event_type, count(DISTINCT user_id) AS n_exact FROM e GROUP BY 1)
SELECT event_type, CAST(n_exact AS BIGINT) AS n_exact,
       round(CASE WHEN kth IS NULL THEN CAST(n_exact AS DOUBLE)
             ELSE CAST({KMV_K - 1} AS DOUBLE)
                  / (CAST(kth AS DOUBLE)
                     / CAST({2 ** HASH_BITS} AS DOUBLE)) END, 4)
         AS kmv_estimate,
       round((CASE WHEN kth IS NULL THEN CAST(n_exact AS DOUBLE)
              ELSE CAST({KMV_K - 1} AS DOUBLE)
                   / (CAST(kth AS DOUBLE)
                      / CAST({2 ** HASH_BITS} AS DOUBLE)) END
              - CAST(n_exact AS DOUBLE)) / CAST(n_exact AS DOUBLE), 6)
         AS rel_err
FROM exact LEFT JOIN kth USING (event_type)
"""


def markov_backtest(spark: SparkSession, sf: str) -> DataFrame:
    """Train the per-type modal-successor predictor on the first
    TRAIN_DAYS of transitions, score top-1 accuracy on the rest."""
    e = load(spark, sf, "events").select(
        "user_id", "event_id", "event_type",
        F.col("ts").cast("long").alias("sec"))
    lo = e.agg(F.min("sec")).first()[0]
    cut = lo + TRAIN_DAYS * 86400
    w = W.partitionBy("user_id").orderBy("sec", "event_id")
    tr = (e.withColumn("nxt", F.lead("event_type").over(w))
           .withColumn("nxt_sec", F.lead("sec").over(w))
           .filter(F.col("nxt").isNotNull()))
    train = tr.filter(F.col("nxt_sec") < cut)
    test = tr.filter(F.col("nxt_sec") >= cut)
    counts = (train.groupBy("event_type", "nxt")
              .agg(F.count("*").alias("c")))
    pick = W.partitionBy("event_type").orderBy(F.col("c").desc(), "nxt")
    model = (counts.withColumn("rn", F.row_number().over(pick))
             .filter(F.col("rn") == 1)
             .select("event_type", F.col("nxt").alias("pred")))
    return (test.join(F.broadcast(model), "event_type")
            .groupBy("event_type")
            .agg(F.max("pred").alias("predicted_next"),
                 F.count("*").cast("bigint").alias("n_test"),
                 F.sum(F.when(F.col("nxt") == F.col("pred"), 1)
                       .otherwise(0)).cast("bigint").alias("n_hit")))


MARKOV_SQL = f"""
WITH e AS (
  SELECT user_id, event_id, event_type,
         CAST(floor(epoch_us(ts) / 1000000) AS BIGINT) AS sec
  FROM events),
cut AS (SELECT min(sec) + {TRAIN_DAYS} * 86400 AS c FROM e),
tr AS (
  SELECT event_type,
         lead(event_type) OVER (PARTITION BY user_id
                                ORDER BY sec, event_id) AS nxt,
         lead(sec) OVER (PARTITION BY user_id
                         ORDER BY sec, event_id) AS nxt_sec
  FROM e),
counts AS (
  SELECT event_type, nxt, count(*) AS c
  FROM tr CROSS JOIN cut
  WHERE nxt IS NOT NULL AND nxt_sec < c
  GROUP BY 1, 2),
model AS (
  SELECT event_type, nxt AS pred FROM (
    SELECT event_type, nxt,
           row_number() OVER (PARTITION BY event_type
                              ORDER BY c DESC, nxt) AS rn
    FROM counts) WHERE rn = 1)
SELECT event_type, max(pred) AS predicted_next,
       CAST(count(*) AS BIGINT) AS n_test,
       CAST(sum(CASE WHEN nxt = pred THEN 1 ELSE 0 END) AS BIGINT)
         AS n_hit
FROM tr CROSS JOIN cut JOIN model USING (event_type)
WHERE nxt IS NOT NULL AND nxt_sec >= c
GROUP BY event_type
"""


def text_zipf_fit(spark: SparkSession, sf: str) -> DataFrame:
    """OLS slope of ln(freq) ~ ln(rank) over the corpus rank-frequency
    table (a Zipfian corpus sits near −1); one row out.

    The global frequency rank is a distributed_prefix_sum (weight 1
    over (−f, tok)), NOT a whole-table row_number window: vocabulary
    grows ~Heaps-law with the corpus — hundreds of millions of types at
    100 TB — and a bare ORDER BY window would funnel all of them
    through one task (Exchange SinglePartition)."""
    toks = (load(spark, sf, "documents")
            .select(F.explode(F.split(F.trim(F.lower(F.col("text"))),
                                      r"\s+")).alias("tok")))
    freq = (toks.groupBy("tok").agg(F.count("*").alias("f"))
            .withColumn("negf", -F.col("f")))
    ranked_df, _total = distributed_prefix_sum(
        spark, freq, F.lit(1), "negf", "tok", out="r")
    d9 = "decimal(28,9)"
    ranked = (ranked_df
              .select(F.round(F.log(F.col("r").cast("double")), 9)
                      .cast(d9).alias("x"),
                      F.round(F.log(F.col("f").cast("double")), 9)
                      .cast(d9).alias("y")))
    m = ranked.agg(F.count("*").alias("n"),
                   F.sum("x").alias("sx"), F.sum("y").alias("sy"),
                   F.sum(F.col("x") * F.col("x")).alias("sxx"),
                   F.sum(F.col("x") * F.col("y")).alias("sxy"))
    n = F.col("n").cast("double")
    slope = ((n * F.col("sxy").cast("double")
              - F.col("sx").cast("double") * F.col("sy").cast("double"))
             / (n * F.col("sxx").cast("double")
                - F.col("sx").cast("double")
                * F.col("sx").cast("double")))
    return m.select(F.col("n").cast("bigint").alias("n_types"),
                    F.round(slope, 6).alias("zipf_slope"))


ZIPF_SQL = """
WITH toks AS (
  SELECT unnest(regexp_split_to_array(trim(lower(text)), '\\s+')) AS tok
  FROM documents),
freq AS (SELECT tok, count(*) AS f FROM toks GROUP BY 1),
ranked AS (
  SELECT CAST(round(ln(CAST(row_number() OVER (ORDER BY f DESC, tok)
                            AS DOUBLE)), 9) AS DECIMAL(28,9)) AS x,
         CAST(round(ln(CAST(f AS DOUBLE)), 9) AS DECIMAL(28,9)) AS y
  FROM freq),
m AS (
  SELECT count(*) AS n, sum(x) AS sx, sum(y) AS sy,
         sum(x * x) AS sxx, sum(x * y) AS sxy
  FROM ranked)
SELECT CAST(n AS BIGINT) AS n_types,
       round((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
              - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
             / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)), 6)
         AS zipf_slope
FROM m
"""


QUERIES = {
    "kmv_distinct_users": kmv_distinct_users,
    "markov_backtest": markov_backtest,
    "text_zipf_fit": text_zipf_fit,
}

ORACLES = {
    "kmv_distinct_users": KMV_SQL,
    "markov_backtest": MARKOV_SQL,
    "text_zipf_fit": ZIPF_SQL,
}
