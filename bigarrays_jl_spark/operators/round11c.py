"""Round-11 batch 3 (builder extension, SURVEY §2C):

- ``theil_sen_slope`` — Theil–Sen robust trend per event type over the
  daily-revenue series: the MEDIAN of all pairwise slopes
  (rev_j − rev_i)/(day_j − day_i).  The robust-regression complement
  of q77's OLS (one outlier day moves OLS, not the pairwise median).
  The pair space is (days choose 2) per type — the series is the
  (type × day) rollup, thousands of rows at ANY corpus size, so the
  self-join is series², never facts².  Each slope is ONE IEEE division
  of exact integers (deterministic bits), the median is an exact
  row_number pick over (slope, day_i, day_j) — no averaging of the
  two middle elements, the lower median (the den·cum ≥ num·tot
  convention used by every quantile in this repo).
- ``mann_whitney_u`` — Mann–Whitney rank-sum U between returned ('R')
  and accepted ('A') lineitem prices, tie-corrected, in EXACT integer
  arithmetic: ranks come from the value-domain histogram with 2×-scaled
  midranks (2·midrank = 2·cum_before + (w + 1) is always integral), so
  U is exact; the normal-approximation z uses one correctly-rounded
  sqrt.  The nonparametric two-sample class next to Welch's t (q80)
  and KS (ks_two_sample).
- ``events_twap`` — time-weighted average value per event type: each
  observation holds until the next event of that type (step
  interpolation), weight = holding seconds from a lead() window, TWAP
  = Σ value·dur / Σ dur with the 1e-6 fixed-point value canon — exact
  integers until one closing division.  The financial/ops aggregate
  plain AVG gets wrong whenever sampling is irregular.

Scale: theil_sen joins the tiny per-type day series with itself
(broadcast); mann_whitney folds facts to value-domain cells and runs
the rank prefix through ``bucketed_running`` (r13 — no
single-partition window, the former allowlist entry is gone); twap is one
type-keyed lead window + a map-side fold.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from bigarrays_jl_spark.operators.ordering import bucketed_running
from bigarrays_jl_spark.sources.tables import load

VQ = 1_000_000


def theil_sen_slope(spark: SparkSession, sf: str) -> DataFrame:
    """Per event type: Theil–Sen slope of daily value sums (micro-units
    per day), the pair count, and the chosen pair for auditability."""
    e = load(spark, sf, "events").select(
        "event_type",
        (F.floor(F.col("ts").cast("long") / 86400)).cast("bigint")
        .alias("day"),
        F.round(F.col("value").cast("double") * VQ).cast("bigint")
        .alias("vi"))
    daily = (e.groupBy("event_type", "day")
              .agg(F.sum("vi").alias("rev")))
    a = daily.select(F.col("event_type").alias("t"),
                     F.col("day").alias("d1"), F.col("rev").alias("r1"))
    b = daily.select(F.col("event_type").alias("t"),
                     F.col("day").alias("d2"), F.col("rev").alias("r2"))
    pairs = (a.join(b, "t").filter(F.col("d1") < F.col("d2"))
              .select(F.col("t").alias("event_type"), "d1", "d2",
                      ((F.col("r2") - F.col("r1")).cast("double")
                       / (F.col("d2") - F.col("d1")).cast("double"))
                      .alias("slope")))
    w_rank = W.partitionBy("event_type").orderBy("slope", "d1", "d2")
    w_all = W.partitionBy("event_type")
    ranked = (pairs.withColumn("rn", F.row_number().over(w_rank))
                   .withColumn("n", F.count("*").over(w_all)))
    return (ranked.filter(F.col("rn")
                          == ((F.col("n") + 1) / 2).cast("long"))
            .select("event_type",
                    F.col("n").cast("bigint").alias("n_pairs"),
                    "slope", "d1", "d2"))


THEIL_SEN_SQL = f"""
WITH e AS (
  SELECT event_type,
         CAST(floor(epoch_us(ts) / 1000000) AS BIGINT) // 86400 AS day,
         CAST(round(CAST(value AS DOUBLE) * {VQ}) AS BIGINT) AS vi
  FROM events),
daily AS (
  SELECT event_type, day, CAST(sum(vi) AS BIGINT) AS rev
  FROM e GROUP BY 1, 2),
pairs AS (
  SELECT a.event_type, a.day AS d1, b.day AS d2,
         CAST(b.rev - a.rev AS DOUBLE)
           / CAST(b.day - a.day AS DOUBLE) AS slope
  FROM daily a JOIN daily b
    ON a.event_type = b.event_type AND a.day < b.day),
ranked AS (
  SELECT *,
         row_number() OVER (PARTITION BY event_type
                            ORDER BY slope, d1, d2) AS rn,
         count(*) OVER (PARTITION BY event_type) AS n
  FROM pairs)
SELECT event_type, CAST(n AS BIGINT) AS n_pairs, slope, d1, d2
FROM ranked WHERE rn = (n + 1) // 2
"""


def mann_whitney_u(spark: SparkSession, sf: str) -> DataFrame:
    """Tie-corrected Mann–Whitney U between R and A price samples:
    exact integer U (via 2×-scaled midranks) and the z statistic."""
    li = load(spark, sf, "lineitem").filter(
        F.col("l_returnflag").isin("A", "R")).select(
        "l_returnflag",
        F.round(F.col("l_extendedprice") * 100).cast("bigint")
        .alias("cents"))
    hist = (li.groupBy("cents")
            .agg(F.sum(F.when(F.col("l_returnflag") == "R", 1)
                       .otherwise(0)).alias("w1"),
                 F.count("*").alias("w")))
    # 2·midrank of a tied block = 2·(ranks before) + (block size + 1).
    # r13 de-funnel: "ranks before" was a whole-cent-domain ORDER BY
    # window (allowlisted) — now the two-level bucketed running sum;
    # integer sums make the rewrite bit-identical
    h = (bucketed_running(hist, "cents",
                          [("before", "w", "sum", False)])
         .withColumn("mr2", 2 * F.col("before") + F.col("w") + 1))
    agg = h.agg(
        F.sum(F.col("w1") * F.col("mr2")).alias("r2_sum"),   # 2·R₁
        F.sum("w1").alias("n1"),
        F.sum(F.col("w") - F.col("w1")).alias("n2"),
        # tie-correction Σ(t³−t) for the variance
        F.sum(F.col("w") * F.col("w") * F.col("w") - F.col("w"))
        .alias("ties"))
    n1 = F.col("n1").cast("double")
    n2 = F.col("n2").cast("double")
    n = n1 + n2
    # U₁ = R₁ − n₁(n₁+1)/2, exact in the 2× domain then halved
    u2 = (F.col("r2_sum") - F.col("n1") * (F.col("n1") + 1))
    u1 = u2.cast("double") / 2.0
    mean_u = n1 * n2 / 2.0
    var_u = (n1 * n2 / 12.0) * ((n + 1.0)
                                - F.col("ties").cast("double")
                                / (n * (n - 1.0)))
    return agg.select(
        F.col("n1").cast("bigint").alias("n_r"),
        F.col("n2").cast("bigint").alias("n_a"),
        u2.cast("bigint").alias("u1_x2"),
        ((u1 - mean_u) / F.sqrt(var_u)).alias("z"))


MANN_WHITNEY_SQL = """
WITH li AS (
  SELECT l_returnflag,
         CAST(round(l_extendedprice * 100) AS BIGINT) AS cents
  FROM lineitem WHERE l_returnflag IN ('A', 'R')),
hist AS (
  SELECT cents,
         sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS w1,
         count(*) AS w
  FROM li GROUP BY 1),
h AS (
  SELECT w1, w,
         coalesce(sum(w) OVER (ORDER BY cents
                               ROWS BETWEEN UNBOUNDED PRECEDING
                               AND 1 PRECEDING), 0) AS before
  FROM hist),
agg AS (
  SELECT sum(w1 * (2 * before + w + 1)) AS r2_sum,
         sum(w1) AS n1, sum(w - w1) AS n2,
         sum(w * w * w - w) AS ties
  FROM h)
SELECT CAST(n1 AS BIGINT) AS n_r, CAST(n2 AS BIGINT) AS n_a,
       CAST(r2_sum - n1 * (n1 + 1) AS BIGINT) AS u1_x2,
       (CAST(r2_sum - n1 * (n1 + 1) AS DOUBLE) / 2.0
        - CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE) / 2.0)
       / sqrt((CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE) / 12.0)
              * ((CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE) + 1.0)
                 - CAST(ties AS DOUBLE)
                 / ((CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE))
                    * (CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE) - 1.0))))
         AS z
FROM agg
"""


def events_twap(spark: SparkSession, sf: str) -> DataFrame:
    """Per event type: time-weighted average value under step-hold
    interpolation — each value holds until the type's next event; the
    last observation carries no weight (no horizon assumption)."""
    e = load(spark, sf, "events").select(
        "event_type", "event_id",
        F.col("ts").cast("long").alias("sec"),
        F.round(F.col("value").cast("double") * VQ).cast("bigint")
        .alias("vi"))
    w = W.partitionBy("event_type").orderBy("sec", "event_id")
    held = (e.withColumn("nxt", F.lead("sec").over(w))
             .filter(F.col("nxt").isNotNull())
             .select("event_type", "vi",
                     (F.col("nxt") - F.col("sec")).alias("dur")))
    return (held.groupBy("event_type")
            .agg(F.count("*").cast("bigint").alias("n_held"),
                 F.sum("dur").cast("bigint").alias("total_secs"),
                 (F.sum(F.col("vi") * F.col("dur")).cast("double")
                  / (F.sum("dur") * VQ).cast("double")).alias("twap")))


EVENTS_TWAP_SQL = f"""
WITH e AS (
  SELECT event_type, event_id,
         CAST(floor(epoch_us(ts) / 1000000) AS BIGINT) AS sec,
         CAST(round(CAST(value AS DOUBLE) * {VQ}) AS BIGINT) AS vi
  FROM events),
held AS (
  SELECT event_type, vi,
         lead(sec) OVER (PARTITION BY event_type
                         ORDER BY sec, event_id) - sec AS dur
  FROM e)
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n_held,
       CAST(sum(dur) AS BIGINT) AS total_secs,
       CAST(sum(vi * dur) AS DOUBLE)
         / CAST(sum(dur) * {VQ} AS DOUBLE) AS twap
FROM held WHERE dur IS NOT NULL
GROUP BY event_type
"""


QUERIES = {
    "theil_sen_slope": theil_sen_slope,
    "mann_whitney_u": mann_whitney_u,
    "events_twap": events_twap,
}

ORACLES = {
    "theil_sen_slope": THEIL_SEN_SQL,
    "mann_whitney_u": MANN_WHITNEY_SQL,
    "events_twap": EVENTS_TWAP_SQL,
}
