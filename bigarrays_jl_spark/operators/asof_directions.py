"""As-of join direction variants (builder extension, SURVEY §2B join
surface, round 9).

``q24_asof_join`` is the BACKWARD as-of (last click at or before each
purchase) — the default direction of pandas ``merge_asof`` and every
ASOF JOIN SQL dialect.  The other two directions complete the family:

- ``q58_asof_forward`` — first click strictly AFTER each purchase
  (the "next event" join: post-purchase behavior attribution);
- ``q59_asof_nearest`` — the temporally closest click on either side,
  ties broken toward the EARLIER click (pandas ``nearest`` breaks
  toward backward; we pin the same convention so the semantics have an
  external referent).

Spark-first shape, identical to q24's: union the two event classes
into ONE user-partitioned ordered stream and resolve every direction
with windowed last/first over tagged timestamps — one shuffle on
user_id, state bounded per key, no self-join, no non-equi join (the
naive per-purchase subquery formulation is a nested loop).  DuckDB
twins mirror the windows verbatim (its native ASOF JOIN is
backward-only, so the window formulation IS the oracle).

Cross-engine parity: epoch-seconds canon everywhere; outputs are
exact integers (ids, second gaps).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from bigarrays_jl_spark.sources.tables import load


def _tagged(spark: SparkSession, sf: str) -> DataFrame:
    e = (load(spark, sf, "events")
         .filter(F.col("event_type").isin("click", "purchase"))
         .select("user_id", "event_id", "event_type",
                 F.col("ts").cast("long").alias("sec")))
    return e


def q58_asof_forward(spark: SparkSession, sf: str) -> DataFrame:
    e = _tagged(spark, sf)
    w = (W.partitionBy("user_id").orderBy("sec", "event_id")
         .rowsBetween(1, W.unboundedFollowing))
    click_sec = F.when(F.col("event_type") == "click", F.col("sec"))
    # first_value ignorenulls over the FOLLOWING frame = next click;
    # the frame starts at 1 so a click at the same (sec, event_id)
    # position never matches itself, and an equal-second later click
    # (ordered after by event_id) DOES — "strictly after" in stream
    # order, the exact mirror of q24's at-or-before
    t = e.withColumn("next_click",
                     F.first(click_sec, ignorenulls=True).over(w))
    return (t.filter(F.col("event_type") == "purchase")
            .select("user_id", "event_id",
                    F.col("sec").alias("purchase_sec"),
                    "next_click",
                    F.when(F.col("next_click").isNotNull(),
                           F.col("next_click") - F.col("sec"))
                     .alias("wait_seconds")))


Q58_SQL = """
WITH e AS (
  SELECT user_id, event_id, event_type,
         CAST(floor(epoch_us(ts) / 1000000) AS BIGINT) AS sec
  FROM events WHERE event_type IN ('click', 'purchase')),
t AS (
  SELECT user_id, event_id, event_type, sec,
         first_value(CASE WHEN event_type = 'click' THEN sec END
                     IGNORE NULLS)
           OVER (PARTITION BY user_id ORDER BY sec, event_id
                 ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING)
           AS next_click
  FROM e)
SELECT user_id, event_id, sec AS purchase_sec, next_click,
       CASE WHEN next_click IS NOT NULL THEN next_click - sec END
         AS wait_seconds
FROM t WHERE event_type = 'purchase'
"""


def q59_asof_nearest(spark: SparkSession, sf: str) -> DataFrame:
    e = _tagged(spark, sf)
    o = W.partitionBy("user_id").orderBy("sec", "event_id")
    click_sec = F.when(F.col("event_type") == "click", F.col("sec"))
    t = (e.withColumn(
            "prev_click",
            F.last(click_sec, ignorenulls=True)
             .over(o.rowsBetween(W.unboundedPreceding, -1)))
          .withColumn(
            "next_click",
            F.first(click_sec, ignorenulls=True)
             .over(o.rowsBetween(1, W.unboundedFollowing))))
    prev_gap = F.col("sec") - F.col("prev_click")
    next_gap = F.col("next_click") - F.col("sec")
    # nearest with ties toward the earlier (backward) click — the
    # pandas merge_asof 'nearest' convention
    pick_prev = (F.col("prev_click").isNotNull()
                 & (F.col("next_click").isNull()
                    | (prev_gap <= next_gap)))
    nearest = F.when(pick_prev, F.col("prev_click")) \
               .otherwise(F.col("next_click"))
    return (t.filter(F.col("event_type") == "purchase")
            .select("user_id", "event_id",
                    F.col("sec").alias("purchase_sec"),
                    nearest.alias("nearest_click"),
                    F.when(nearest.isNotNull(),
                           F.abs(nearest - F.col("sec")))
                     .alias("gap_seconds")))


Q59_SQL = """
WITH e AS (
  SELECT user_id, event_id, event_type,
         CAST(floor(epoch_us(ts) / 1000000) AS BIGINT) AS sec
  FROM events WHERE event_type IN ('click', 'purchase')),
t AS (
  SELECT user_id, event_id, event_type, sec,
         last_value(CASE WHEN event_type = 'click' THEN sec END
                    IGNORE NULLS)
           OVER (PARTITION BY user_id ORDER BY sec, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
           AS prev_click,
         first_value(CASE WHEN event_type = 'click' THEN sec END
                     IGNORE NULLS)
           OVER (PARTITION BY user_id ORDER BY sec, event_id
                 ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING)
           AS next_click
  FROM e),
n AS (
  SELECT user_id, event_id, sec,
         CASE WHEN prev_click IS NOT NULL
                   AND (next_click IS NULL
                        OR sec - prev_click <= next_click - sec)
              THEN prev_click ELSE next_click END AS nearest_click
  FROM t WHERE event_type = 'purchase')
SELECT user_id, event_id, sec AS purchase_sec, nearest_click,
       CASE WHEN nearest_click IS NOT NULL
            THEN abs(nearest_click - sec) END AS gap_seconds
FROM n
"""


QUERIES = {
    "q58_asof_forward": q58_asof_forward,
    "q59_asof_nearest": q59_asof_nearest,
}

ORACLES = {
    "q58_asof_forward": Q58_SQL,
    "q59_asof_nearest": Q59_SQL,
}
