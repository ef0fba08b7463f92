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


# --------------------------------------------------------------------------
# Kleene-plus pattern (view+ click) — the variable-length CEP class
# --------------------------------------------------------------------------

KLEENE_MIN_VIEWS = 2         # match view{2,} click (a single view already
                             # counts as browsing noise in the testdata)


def events_kleene_match(spark: SparkSession, sf: str) -> DataFrame:
    """MATCH_RECOGNIZE ``PATTERN (V+ C)`` with per-step time bounds:
    per user, every MAXIMAL run of >= KLEENE_MIN_VIEWS consecutive
    views (adjacent gaps <= PATTERN_GAP_S) whose immediately-next event
    is a click within the gap bound.  The fixed-length double-lead
    detector cannot express a variable-length quantifier; funnels
    collapse repeats.  This is the gaps-and-islands formulation — the
    Spark-first shape for Kleene quantifiers:

    one ordered pass marks island starts (type change OR gap overflow),
    a running sum names the island, each row carries its successor via
    lead, and a per-island aggregate (max_by selects the LAST row's
    successor) applies the click predicate.  Two window passes over one
    user-partitioned sort + one |islands|-bounded aggregate — state per
    user bounded, nothing quadratic.

    All-integer outputs via the epoch-seconds canon."""
    e = (load(spark, sf, "events")
         .select("user_id", "event_id", "event_type",
                 F.col("ts").cast("long").alias("sec")))
    w = W.partitionBy("user_id").orderBy("sec", "event_id")
    brk = (F.col("event_type") != F.lag("event_type").over(w)) | \
          (F.col("sec") - F.lag("sec").over(w) > PATTERN_GAP_S)
    t = (e.withColumn("brk", F.coalesce(brk.cast("int"), F.lit(1)))
          .withColumn("next_type", F.lead("event_type").over(w))
          .withColumn("next_sec", F.lead("sec").over(w))
          .withColumn("island",
                      F.sum("brk").over(w.rowsBetween(W.unboundedPreceding,
                                                      W.currentRow))))
    runs = (t.filter(F.col("event_type") == "view")
             .groupBy("user_id", "island")
             .agg(F.count("*").alias("n_views"),
                  F.min("event_id").alias("start_event"),
                  F.max_by(F.struct("next_type", "next_sec"),
                           F.struct("sec", "event_id")).alias("last"),
                  F.max("sec").alias("end_sec")))
    hit = ((F.col("n_views") >= KLEENE_MIN_VIEWS)
           & (F.col("last.next_type") == "click")
           & (F.col("last.next_sec") - F.col("end_sec") <= PATTERN_GAP_S))
    return (runs.filter(hit)
            .groupBy("user_id")
            .agg(F.count("*").alias("n_runs"),
                 F.sum("n_views").alias("views_in_runs"),
                 F.min("start_event").alias("first_run_event")))


EVENTS_KLEENE_MATCH_SQL = f"""
WITH e AS (
  SELECT user_id, event_id, event_type,
         CAST(floor(epoch_us(ts) / 1000000) AS BIGINT) AS sec
  FROM events),
t AS (
  SELECT user_id, event_id, event_type, sec,
         CASE WHEN lag(event_type) OVER w IS NULL
                OR event_type <> lag(event_type) OVER w
                OR sec - lag(sec) OVER w > {{PATTERN_GAP_S}}
              THEN 1 ELSE 0 END AS brk,
         lead(event_type) OVER w AS next_type,
         lead(sec) OVER w AS next_sec
  FROM e
  WINDOW w AS (PARTITION BY user_id ORDER BY sec, event_id)),
i AS (
  SELECT *, sum(brk) OVER (PARTITION BY user_id ORDER BY sec, event_id
                           ROWS UNBOUNDED PRECEDING) AS island
  FROM t),
runs0 AS (
  -- DuckDB 1.0 arg_max has no struct key; the (sec, event_id)-last
  -- row's successor is island-constant after the window, so max() of
  -- the broadcast value is the deterministic equivalent
  SELECT user_id, island, event_id, sec,
         last_value(next_type) OVER wi AS l_type,
         last_value(next_sec) OVER wi AS l_sec
  FROM i WHERE event_type = 'view'
  WINDOW wi AS (PARTITION BY user_id, island ORDER BY sec, event_id
                ROWS BETWEEN UNBOUNDED PRECEDING
                         AND UNBOUNDED FOLLOWING)),
runs AS (
  SELECT user_id, island, count(*) AS n_views,
         min(event_id) AS start_event,
         max(l_type) AS l_type, max(l_sec) AS l_sec,
         max(sec) AS end_sec
  FROM runs0
  GROUP BY user_id, island)
SELECT user_id, count(*) AS n_runs,
       CAST(sum(n_views) AS BIGINT) AS views_in_runs,
       min(start_event) AS first_run_event
FROM runs
WHERE n_views >= {{KLEENE_MIN_VIEWS}} AND l_type = 'click'
  AND l_sec - end_sec <= {{PATTERN_GAP_S}}
GROUP BY user_id
""".format(PATTERN_GAP_S=PATTERN_GAP_S, KLEENE_MIN_VIEWS=KLEENE_MIN_VIEWS)


QUERIES = {
    "events_pattern_match": events_pattern_match,
    "events_absence_match": events_absence_match,
    "events_kleene_match": events_kleene_match,
}

ORACLES = {
    "events_pattern_match": EVENTS_PATTERN_MATCH_SQL,
    "events_absence_match": EVENTS_ABSENCE_MATCH_SQL,
    "events_kleene_match": EVENTS_KLEENE_MATCH_SQL,
}
