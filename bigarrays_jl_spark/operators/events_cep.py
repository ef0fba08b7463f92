"""Complex-event-processing pattern match (builder extension, SURVEY
§2C round 9).

``events_pattern_match`` — the MATCH_RECOGNIZE-style sequential
pattern detector the events family lacked: count, per user, every
occurrence of the CONSECUTIVE event sequence view → view → click with
each step gap ≤ PATTERN_GAP_S seconds (24 h).  Funnels (first-occurrence
ordered path) and transition matrices (adjacent pairs) answer
different questions; this is the "exact sliding subsequence with a
per-step time constraint" shape of Flink CEP / SQL MATCH_RECOGNIZE,
which Spark has no native operator for.

Spark-first formulation: a user-partitioned ordered window with two
``lead``s — every event row sees the two events that follow it for
the same user, so a pattern instance is a simple row predicate.
Per-user windows are the canonical CEP partitioning (state bounded per
key); the total order inside a user is (ts, event_id), the repo's
tiebreak canon for duplicate timestamps.

Cross-engine parity: gaps compare in EPOCH SECONDS via the shared
canon — Spark ``CAST(ts AS LONG)`` == DuckDB
``CAST(floor(epoch_us(ts)/1000000) AS BIGINT)`` — and every output is
an exact integer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from bigarrays_jl_spark.sources.tables import load

PATTERN = ("view", "view", "click")
PATTERN_GAP_S = 86400       # each consecutive step within 24 h (the
                            # testdata's per-user event cadence is
                            # hours; median step gap ~7 h)


def events_pattern_match(spark: SparkSession, sf: str) -> DataFrame:
    e = (load(spark, sf, "events")
         .select("user_id", "event_id", "event_type",
                 F.col("ts").cast("long").alias("sec")))
    w = W.partitionBy("user_id").orderBy("sec", "event_id")
    seq = (e.withColumn("t1", F.lead("event_type", 1).over(w))
            .withColumn("s1", F.lead("sec", 1).over(w))
            .withColumn("t2", F.lead("event_type", 2).over(w))
            .withColumn("s2", F.lead("sec", 2).over(w)))
    hit = ((F.col("event_type") == PATTERN[0])
           & (F.col("t1") == PATTERN[1])
           & (F.col("t2") == PATTERN[2])
           & (F.col("s1") - F.col("sec") <= PATTERN_GAP_S)
           & (F.col("s2") - F.col("s1") <= PATTERN_GAP_S))
    return (seq.filter(hit)
               .groupBy("user_id")
               .agg(F.count("*").alias("n_matches"),
                    F.min("event_id").alias("first_match_event")))


EVENTS_PATTERN_MATCH_SQL = f"""
WITH e AS (
  SELECT user_id, event_id, event_type,
         CAST(floor(epoch_us(ts) / 1000000) AS BIGINT) AS sec
  FROM events),
seq AS (
  SELECT user_id, event_id, event_type, sec,
         lead(event_type, 1) OVER w AS t1,
         lead(sec, 1) OVER w AS s1,
         lead(event_type, 2) OVER w AS t2,
         lead(sec, 2) OVER w AS s2
  FROM e
  WINDOW w AS (PARTITION BY user_id ORDER BY sec, event_id))
SELECT user_id, count(*) AS n_matches,
       min(event_id) AS first_match_event
FROM seq
WHERE event_type = '{PATTERN[0]}' AND t1 = '{PATTERN[1]}'
  AND t2 = '{PATTERN[2]}'
  AND s1 - sec <= {PATTERN_GAP_S} AND s2 - s1 <= {PATTERN_GAP_S}
GROUP BY user_id
"""


# --------------------------------------------------------------------------
# absence / timeout pattern — the OTHER fundamental CEP class
# --------------------------------------------------------------------------

ABSENCE_T_S = 86400          # a view is abandoned if no purchase follows
                             # within 24 h


def events_absence_match(spark: SparkSession, sf: str) -> DataFrame:
    """Per user, the views with NO purchase within ABSENCE_T_S seconds
    — the CEP timeout/negation pattern (cart abandonment).

    Scale shape: a naive formulation is a non-equi ANTI join, which
    Spark can only execute as a nested-loop product.  Instead: bucket
    time by the window length — a purchase in (t, t+T] lives in the
    view's bucket or the next one — explode each view to those two
    (user, bucket) keys, EQUI-join purchases, apply the exact range
    residual, and anti-join the matched view ids back (another equi
    join).  Every join is key-partitioned; nothing is quadratic."""
    e = (load(spark, sf, "events")
         .select("user_id", "event_id", "event_type",
                 F.col("ts").cast("long").alias("sec")))
    v = e.filter(F.col("event_type") == "view") \
         .select("user_id", "event_id", "sec")
    p = e.filter(F.col("event_type") == "purchase") \
         .select(F.col("user_id").alias("p_user"),
                 F.col("sec").alias("p_sec"),
                 F.floor(F.col("sec") / ABSENCE_T_S).alias("p_bucket"))
    vx = v.withColumn(
        "bucket", F.explode(F.array(
            F.floor(F.col("sec") / ABSENCE_T_S),
            F.floor(F.col("sec") / ABSENCE_T_S) + 1)))
    matched = (vx.join(p, (vx.user_id == p.p_user)
                       & (vx.bucket == p.p_bucket))
                 .filter((F.col("p_sec") > F.col("sec"))
                         & (F.col("p_sec") <= F.col("sec") + ABSENCE_T_S))
                 .select("event_id").distinct())
    abandoned = v.join(matched, "event_id", "left_anti")
    return (abandoned.groupBy("user_id")
            .agg(F.count("*").alias("n_abandoned"),
                 F.min("event_id").alias("first_abandoned")))


EVENTS_ABSENCE_MATCH_SQL = f"""
WITH e AS (
  SELECT user_id, event_id, event_type,
         CAST(floor(epoch_us(ts) / 1000000) AS BIGINT) AS sec
  FROM events),
v AS (SELECT user_id, event_id, sec FROM e WHERE event_type = 'view'),
p AS (SELECT user_id, sec FROM e WHERE event_type = 'purchase')
SELECT v.user_id, count(*) AS n_abandoned,
       min(v.event_id) AS first_abandoned
FROM v
WHERE NOT EXISTS (SELECT 1 FROM p
                  WHERE p.user_id = v.user_id
                    AND p.sec > v.sec AND p.sec <= v.sec + {ABSENCE_T_S})
GROUP BY v.user_id
"""


QUERIES = {
    "events_pattern_match": events_pattern_match,
    "events_absence_match": events_absence_match,
}

ORACLES = {
    "events_pattern_match": EVENTS_PATTERN_MATCH_SQL,
    "events_absence_match": EVENTS_ABSENCE_MATCH_SQL,
}
