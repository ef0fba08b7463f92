"""Event-stream operators (batch form) over the events table.

These are the batch twins of the Structured Streaming operators in
``bigarrays_jl_spark.streaming`` — same windowing semantics, expressed on
a static DataFrame so the DuckDB oracle can verify them.  The streaming
module runs the identical logical plans through readStream/writeStream
(tested in tests/test_streaming.py; streaming execution itself is not
SQL-oracle-comparable).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from bigarrays_jl_spark.sources.tables import load

SESSION_GAP_MIN = 30


# --------------------------------------------------------------------------
# tumbling window aggregation (1 hour) — window() aligns to the epoch in
# UTC on both engines
# --------------------------------------------------------------------------

def events_tumbling(spark: SparkSession, sf: str) -> DataFrame:
    e = load(spark, sf, "events")
    return (e.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
             .agg(F.count("*").alias("n_events"),
                  F.round(F.sum(F.col("value").cast("decimal(25,10)"))
                           .cast("double"), 2).alias("total_value"))
             .select(F.col("w.start").alias("window_start"), "event_type",
                     "n_events", "total_value"))


EVENTS_TUMBLING_SQL = """
SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start, event_type,
       count(*) AS n_events,
       round(CAST(sum(CAST(value AS DECIMAL(25,10))) AS DOUBLE), 2)
         AS total_value
FROM events GROUP BY 1, 2
"""


# --------------------------------------------------------------------------
# sliding window (1 hour window, 30 min slide) — each event lands in 2
# windows; the SQL oracle unions the two phase-shifted bucketings
# --------------------------------------------------------------------------

def events_sliding(spark: SparkSession, sf: str) -> DataFrame:
    e = load(spark, sf, "events")
    return (e.groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"))
             .agg(F.count("*").alias("n_events"))
             .select(F.col("w.start").alias("window_start"), "n_events"))


EVENTS_SLIDING_SQL = """
SELECT window_start, count(*) AS n_events FROM (
  SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start FROM events
  UNION ALL
  SELECT time_bucket(INTERVAL '1 hour', ts - INTERVAL '30 minutes')
         + INTERVAL '30 minutes' AS window_start FROM events
) GROUP BY 1
"""


# --------------------------------------------------------------------------
# sessionization: gaps-and-islands with a 30-minute inactivity gap —
# the batch twin of session_window(ts, '30 minutes')
# --------------------------------------------------------------------------

def sessionized(e: DataFrame) -> DataFrame:
    """``e`` (needs user_id, ts, event_id) plus a per-user
    ``session_id`` via the 30-minute gaps-and-islands canon — THE
    sessionization shared by events_sessionize and session_bounce_rate
    (round13b.py); one definition so the operators can't drift."""
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.col("ts").cast("long") - F.lag(F.col("ts").cast("long")).over(w)
    new_session = F.when(gap.isNull() | (gap > SESSION_GAP_MIN * 60), 1).otherwise(0)
    return (e.withColumn("new_s", new_session)
             .withColumn("session_id", F.sum("new_s").over(
                 w.rowsBetween(W.unboundedPreceding, W.currentRow))))


def events_sessionize(spark: SparkSession, sf: str) -> DataFrame:
    sess = sessionized(load(spark, sf, "events"))
    return (sess.groupBy("user_id")
                .agg(F.max("session_id").cast("bigint").alias("n_sessions"),
                     F.count("*").alias("n_events"),
                     F.round(F.count("*") / F.max("session_id"), 4)
                      .alias("events_per_session")))


# floor(epoch_us/1e6) floors each timestamp to whole seconds the same
# way Spark's cast(ts as long) does for ALL timestamps; DuckDB's epoch()
# *rounds* fractional seconds and `//` truncates toward zero (diverges
# pre-1970).  See Q29_SQL in advanced.py for the exactness argument.
EVENTS_SESSIONIZE_SQL = f"""
WITH g AS (
  SELECT user_id, ts, event_id,
         CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   IS NULL
              OR CAST(floor(epoch_us(ts) / 1000000) AS BIGINT)
                 - CAST(floor(epoch_us(lag(ts) OVER (PARTITION BY user_id
                                                     ORDER BY ts, event_id))
                              / 1000000) AS BIGINT)
                 > {SESSION_GAP_MIN * 60}
              THEN 1 ELSE 0 END AS new_s
  FROM events),
s AS (SELECT user_id,
             sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS session_id
      FROM g)
SELECT user_id, CAST(max(session_id) AS BIGINT) AS n_sessions,
       count(*) AS n_events,
       round(CAST(count(*) AS DOUBLE) / max(session_id), 4) AS events_per_session
FROM s GROUP BY user_id
"""


# --------------------------------------------------------------------------
# funnel: users whose first click precedes their first purchase
# --------------------------------------------------------------------------

def events_funnel(spark: SparkSession, sf: str) -> DataFrame:
    e = load(spark, sf, "events")
    firsts = (e.filter(F.col("event_type").isin("click", "purchase"))
               .groupBy("user_id")
               .agg(F.min(F.when(F.col("event_type") == "click", F.col("ts")))
                     .alias("first_click"),
                    F.min(F.when(F.col("event_type") == "purchase", F.col("ts")))
                     .alias("first_purchase")))
    return (firsts.filter(F.col("first_click").isNotNull()
                          & F.col("first_purchase").isNotNull()
                          & (F.col("first_click") < F.col("first_purchase")))
                  .select("user_id", "first_click", "first_purchase"))


EVENTS_FUNNEL_SQL = """
WITH f AS (
  SELECT user_id,
         min(CASE WHEN event_type = 'click' THEN ts END) AS first_click,
         min(CASE WHEN event_type = 'purchase' THEN ts END) AS first_purchase
  FROM events WHERE event_type IN ('click', 'purchase')
  GROUP BY user_id)
SELECT user_id, first_click, first_purchase
FROM f
WHERE first_click IS NOT NULL AND first_purchase IS NOT NULL
  AND first_click < first_purchase
"""



# --------------------------------------------------------------------------
# events_rollup_two_level — the continuous-aggregate / hypertable-rollup
# pattern: raw events pre-aggregate into 1-minute buckets, then the
# HOURLY result is computed FROM THE MINUTE PRE-AGGREGATES (sum of
# sums, count of counts, min of mins, max of maxes) — never rescanning
# raw data.  The oracle aggregates raw events directly at the hour, so
# a hash match proves the reaggregation property holds exactly (decimal
# sums keep the two-level accumulation order-independent).
#
# Scale shape: at 100 TB the minute layer is what you materialize
# incrementally (streaming twin: watermarked tumbling agg); the hourly
# rollup then reads ~1/60th the rows.  Both levels are partial-agg
# shuffles on (bucket, type) — bounded by bucket cardinality, not raw
# volume.
# --------------------------------------------------------------------------

def events_rollup_two_level(spark: SparkSession, sf: str) -> DataFrame:
    e = load(spark, sf, "events")
    minute = (e.groupBy(
        F.expr("(unix_micros(ts) div 1000000) div 60").alias("minute_id"),
        "event_type")
        .agg(F.count("*").alias("n"),
             F.sum(F.col("value").cast("decimal(18,6)")).alias("sv"),
             F.min("value").alias("mn"), F.max("value").alias("mx")))
    return (minute.withColumn("hour_id", F.expr("minute_id div 60"))
            .groupBy("hour_id", "event_type")
            .agg(F.sum("n").alias("n_events"),
                 F.round(F.sum("sv"), 2).cast("double").alias("sum_value"),
                 F.min("mn").alias("min_value"),
                 F.max("mx").alias("max_value")))


EVENTS_ROLLUP_SQL = """
SELECT (epoch_us(ts) // 1000000) // 3600 AS hour_id, event_type,
       count(*) AS n_events,
       CAST(round(sum(CAST(value AS DECIMAL(18,6))), 2) AS DOUBLE)
         AS sum_value,
       min(value) AS min_value, max(value) AS max_value
FROM events GROUP BY 1, 2
"""



# --------------------------------------------------------------------------
# events_winsorize — robust-stats clamp: per event type, clip value to
# its [p05, p95] band and report the winsorized sum + clip counts (the
# standard outlier treatment before training-metric aggregation).
# Boundary determinism: Spark `percentile` and DuckDB `quantile_cont`
# share the linear-interpolation definition and agree bitwise on this
# data (verified at sf0.01/0.1), so the clamp comparisons can't flip.
#
# Scale shape: boundaries are a tiny per-type aggregate broadcast back
# into one corpus scan.  Exact per-group percentile buffers a group's
# values in its reducer, so with a low-cardinality group key the 100 TB
# build swaps percentile → percentile_approx (mergeable map-side
# sketch, same plan otherwise) or the distributed-rank machinery of
# q28; the clamp/aggregate stage is unchanged.
# --------------------------------------------------------------------------

def events_winsorize(spark: SparkSession, sf: str) -> DataFrame:
    e = load(spark, sf, "events")
    b = (e.groupBy("event_type")
          .agg(F.percentile("value", 0.05).alias("lo"),
               F.percentile("value", 0.95).alias("hi")))
    clamped = F.least(F.greatest(F.col("value"), F.col("lo")), F.col("hi"))
    clipped = (F.col("value") < F.col("lo")) | (F.col("value") > F.col("hi"))
    return (e.join(F.broadcast(b), "event_type")
             .groupBy("event_type")
             .agg(F.count("*").alias("n"),
                  F.round(F.sum(clamped.cast("decimal(18,6)")), 2)
                   .cast("double").alias("sum_winsorized"),
                  F.sum(F.when(clipped, 1).otherwise(0)).cast("bigint")
                   .alias("n_clipped")))


EVENTS_WINSORIZE_SQL = """
WITH b AS (
  SELECT event_type,
         quantile_cont(value, 0.05) AS lo, quantile_cont(value, 0.95) AS hi
  FROM events GROUP BY event_type)
SELECT e.event_type, count(*) AS n,
       CAST(round(sum(CAST(least(greatest(value, lo), hi)
                           AS DECIMAL(18,6))), 2) AS DOUBLE)
         AS sum_winsorized,
       CAST(count(*) FILTER (WHERE value < lo OR value > hi) AS BIGINT)
         AS n_clipped
FROM events e JOIN b ON e.event_type = b.event_type
GROUP BY e.event_type
"""


QUERIES = {
    "events_tumbling": events_tumbling,
    "events_sliding": events_sliding,
    "events_sessionize": events_sessionize,
    "events_funnel": events_funnel,
    "events_rollup_two_level": events_rollup_two_level,
    "events_winsorize": events_winsorize,
}

ORACLES = {
    "events_tumbling": EVENTS_TUMBLING_SQL,
    "events_sliding": EVENTS_SLIDING_SQL,
    "events_sessionize": EVENTS_SESSIONIZE_SQL,
    "events_funnel": EVENTS_FUNNEL_SQL,
    "events_rollup_two_level": EVENTS_ROLLUP_SQL,
    "events_winsorize": EVENTS_WINSORIZE_SQL,
}
