"""Round-10 thirteenth batch: causal stratification, forensic digit
analysis, and seasonal indexing.

- q89_stratified_effect: the stratified treatment-effect table — the
  observational-causal workhorse behind IPW/blocking: users with a
  heavy 'error' exposure (≥ ERR_T error events — every synthetic user
  sees some errors, so presence alone would be degenerate; the
  threshold splits both SFs ≈ 45/55) vs not, within pre-treatment
  strata (user_id % 5 stands in for an acquisition segment), outcome =
  purchase spend.  Per stratum: arm sizes and exact outcome sums,
  mean difference closed in doubles.  Deliberately emitted PER STRATUM
  (the Σ_s weighted collapse is one trivial reduction the reader can
  do — but summing per-stratum doubles cross-engine would need the
  decimal canon for no analytical gain).
- q90_benford: first-digit (Benford) screening of extended prices —
  the fraud/forensics staple.  The digit comes from the integer cents'
  DECIMAL STRING (never log10 — exact for every engine); the nine
  Benford probabilities are embedded as PYTHON-COMPUTED literals so
  both engines parse the identical double, and expected counts /
  ratios are single products per row.
- q91_dow_seasonality: day-of-week revenue indices per event type —
  the seasonal-index read-out (dow mean ÷ overall mean).  Day-of-week
  is epoch-day % 7 (timezone-free, the repo's day canon); both means
  come from the same exact integer fold and the index is one division
  chain per row.

Scale shapes (SCALE.md "Round-10 batch 13"): all three are map-side
integer folds whose outputs are strata (5), digits (9), and
type×dow (35) cells; the only joins broadcast single-row or
per-stratum aggregates back into cell tables.
"""
from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bigarrays_jl_spark.sources.tables import load

VQ = 1_000_000
N_STRATA = 5
ERR_T = 14
BENFORD_P = {d: float(math.log10(1.0 + 1.0 / d)) for d in range(1, 10)}


# --------------------------------------------------------------------------
# q89_stratified_effect
# --------------------------------------------------------------------------


def q89_stratified_effect(spark: SparkSession, sf: str) -> DataFrame:
    e = load(spark, sf, "events")
    u = (e.groupBy("user_id")
         .agg((F.sum((F.col("event_type") == "error").cast("int"))
               >= ERR_T).cast("int").alias("treated"),
              F.sum(F.when(F.col("event_type") == "purchase",
                           F.round(F.col("value").cast("double") * 100)
                            .cast("bigint")).otherwise(0)).alias("y"))
         .withColumn("stratum", F.col("user_id") % N_STRATA))
    s = (u.groupBy("stratum")
         .agg(F.count("*").alias("n"),
              F.sum("treated").alias("n1"),
              F.sum(F.when(F.col("treated") == 1, F.col("y"))
                     .otherwise(0)).alias("sy1"),
              F.sum(F.when(F.col("treated") == 0, F.col("y"))
                     .otherwise(0)).alias("sy0")))
    m1 = F.col("sy1").cast("double") / F.col("n1") / 100.0
    m0 = (F.col("sy0").cast("double")
          / (F.col("n") - F.col("n1")) / 100.0)
    return s.select(F.col("stratum").cast("bigint").alias("stratum"),
                    F.col("n").cast("bigint").alias("n_users"),
                    F.col("n1").cast("bigint").alias("n_treated"),
                    m1.alias("mean_y_treated"),
                    m0.alias("mean_y_control"),
                    (m1 - m0).alias("effect"))


Q89_SQL = f"""
WITH u AS (
  SELECT user_id,
         CASE WHEN sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
                   >= {ERR_T} THEN 1 ELSE 0 END AS treated,
         CAST(sum(CASE WHEN event_type = 'purchase'
                  THEN CAST(round(CAST(value AS DOUBLE) * 100) AS BIGINT)
                  ELSE 0 END) AS BIGINT) AS y
  FROM events GROUP BY user_id),
s AS (
  SELECT user_id % {N_STRATA} AS stratum,
         count(*) AS n,
         CAST(sum(treated) AS BIGINT) AS n1,
         CAST(sum(CASE WHEN treated = 1 THEN y ELSE 0 END) AS BIGINT)
           AS sy1,
         CAST(sum(CASE WHEN treated = 0 THEN y ELSE 0 END) AS BIGINT)
           AS sy0
  FROM u GROUP BY 1)
SELECT CAST(stratum AS BIGINT) AS stratum,
       CAST(n AS BIGINT) AS n_users,
       n1 AS n_treated,
       CAST(sy1 AS DOUBLE) / n1 / 100.0 AS mean_y_treated,
       CAST(sy0 AS DOUBLE) / (n - n1) / 100.0 AS mean_y_control,
       CAST(sy1 AS DOUBLE) / n1 / 100.0
         - CAST(sy0 AS DOUBLE) / (n - n1) / 100.0 AS effect
FROM s
"""


# --------------------------------------------------------------------------
# q90_benford
# --------------------------------------------------------------------------


def q90_benford(spark: SparkSession, sf: str) -> DataFrame:
    li = load(spark, sf, "lineitem").select(
        F.round(F.col("l_extendedprice") * 100).cast("bigint")
         .alias("v")).filter(F.col("v") > 0)
    d = F.substring(F.col("v").cast("string"), 1, 1).cast("int")
    obs = li.groupBy(d.alias("digit")).agg(F.count("*").alias("n_obs"))
    tot = li.agg(F.count("*").cast("double").alias("tot"))
    expr = None
    for dd, pp in BENFORD_P.items():
        expr = (F.when(F.col("digit") == dd, F.lit(pp)) if expr is None
                else expr.when(F.col("digit") == dd, F.lit(pp)))
    return (obs.crossJoin(F.broadcast(tot))
            .withColumn("p", expr)
            .select(F.col("digit").cast("int").alias("digit"),
                    F.col("n_obs").cast("bigint").alias("n_obs"),
                    (F.col("tot") * F.col("p")).alias("expected"),
                    (F.col("n_obs").cast("double")
                     / (F.col("tot") * F.col("p"))).alias("obs_ratio")))


_BENFORD_CASE = " ".join(
    f"WHEN {d} THEN {p!r}" for d, p in BENFORD_P.items())

Q90_SQL = f"""
WITH li AS (
  SELECT CAST(round(l_extendedprice * 100) AS BIGINT) AS v
  FROM lineitem
  WHERE CAST(round(l_extendedprice * 100) AS BIGINT) > 0),
obs AS (
  SELECT CAST(substr(CAST(v AS VARCHAR), 1, 1) AS INT) AS digit,
         count(*) AS n_obs
  FROM li GROUP BY 1),
tot AS (SELECT CAST(count(*) AS DOUBLE) AS tot FROM li)
SELECT CAST(digit AS INT) AS digit, CAST(n_obs AS BIGINT) AS n_obs,
       tot * (CASE digit {_BENFORD_CASE} END) AS expected,
       CAST(n_obs AS DOUBLE)
         / (tot * (CASE digit {_BENFORD_CASE} END)) AS obs_ratio
FROM obs CROSS JOIN tot
"""


# --------------------------------------------------------------------------
# q91_dow_seasonality
# --------------------------------------------------------------------------


def q91_dow_seasonality(spark: SparkSession, sf: str) -> DataFrame:
    e = load(spark, sf, "events").select(
        "event_type",
        (F.floor(F.col("ts").cast("long") / 86400).cast("bigint") % 7)
        .alias("dow"),
        F.round(F.col("value").cast("double") * VQ)
         .cast("bigint").alias("vi"))
    cells = (e.groupBy("event_type", "dow")
             .agg(F.count("*").alias("n"), F.sum("vi").alias("s")))
    tot = (e.groupBy("event_type")
           .agg(F.count("*").alias("tn"), F.sum("vi").alias("ts_")))
    return (cells.join(F.broadcast(tot), "event_type")
            .select("event_type",
                    F.col("dow").cast("int").alias("dow"),
                    F.col("n").cast("bigint").alias("n_events"),
                    ((F.col("s").cast("double") / F.col("n"))
                     / (F.col("ts_").cast("double") / F.col("tn")))
                    .alias("seasonal_index")))


Q91_SQL = f"""
WITH e AS (
  SELECT event_type,
         (CAST(floor(epoch_us(ts) / 1000000) AS BIGINT) // 86400) % 7
           AS dow,
         CAST(round(CAST(value AS DOUBLE) * {VQ}) AS BIGINT) AS vi
  FROM events),
cells AS (
  SELECT event_type, dow, count(*) AS n,
         CAST(sum(vi) AS BIGINT) AS s
  FROM e GROUP BY 1, 2),
tot AS (
  SELECT event_type, count(*) AS tn, CAST(sum(vi) AS BIGINT) AS ts_
  FROM e GROUP BY 1)
SELECT c.event_type, CAST(c.dow AS INT) AS dow,
       CAST(c.n AS BIGINT) AS n_events,
       (CAST(c.s AS DOUBLE) / c.n) / (CAST(t.ts_ AS DOUBLE) / t.tn)
         AS seasonal_index
FROM cells c JOIN tot t ON c.event_type = t.event_type
"""


QUERIES = {
    "q89_stratified_effect": q89_stratified_effect,
    "q90_benford": q90_benford,
    "q91_dow_seasonality": q91_dow_seasonality,
}

ORACLES = {
    "q89_stratified_effect": Q89_SQL,
    "q90_benford": Q90_SQL,
    "q91_dow_seasonality": Q91_SQL,
}
