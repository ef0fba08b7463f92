"""Burst suppression / tolerance-window dedup (builder extension,
SURVEY §2C round 8).

``events_debounce`` keeps the FIRST event of every burst: consecutive
events of the same (user_id, event_type) closer than DEBOUNCE_S seconds
collapse to their opening event — the batch analog of the streaming
``dropDuplicatesWithinWatermark`` screen in ``streaming/windows.py``
(CHAIN semantics: each event extends the burst it is within DEBOUNCE_S
of the PREVIOUS event of), via gaps-and-islands:
a lag() gap test marks island openers, and the openers ARE the kept
rows — one window, one filter.

Scale shape: one user+type-partitioned ordered window (bounded
per-user/type cardinality — same partitioning argument as
events_sessionize), no self-join, no collect.  Epoch math uses the
repo's exact-seconds canon (Spark cast-long == DuckDB
floor(epoch_us/1e6), see events.EVENTS_SESSIONIZE_SQL).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from bigarrays_jl_spark.sources.tables import load

DEBOUNCE_S = 300     # 5-minute tolerance window


def debounce(e: DataFrame, tolerance_s: int = DEBOUNCE_S) -> DataFrame:
    """Core gaps-and-islands debounce over any (event_id, user_id,
    event_type, ts) frame — property-tested against a pure-Python
    greedy chain walk in tests/test_property.py."""
    w = W.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    gap = (F.col("ts").cast("long")
           - F.lag(F.col("ts").cast("long")).over(w))
    # the island OPENER is exactly the row whose new-burst flag is 1 —
    # no island numbering / second window needed to pick it
    new_burst = F.when(gap.isNull() | (gap > tolerance_s), 1).otherwise(0)
    return (e.withColumn("nb", new_burst)
             .filter(F.col("nb") == 1)
             .select("event_id", "user_id", "event_type", "ts"))


def events_debounce(spark: SparkSession, sf: str) -> DataFrame:
    return debounce(load(spark, sf, "events"))


EVENTS_DEBOUNCE_SQL = f"""
WITH g AS (
  SELECT event_id, user_id, event_type, ts,
         CASE WHEN lag(ts) OVER w IS NULL
              OR CAST(floor(epoch_us(ts) / 1000000) AS BIGINT)
                 - CAST(floor(epoch_us(lag(ts) OVER w) / 1000000) AS BIGINT)
                 > {DEBOUNCE_S}
              THEN 1 ELSE 0 END AS nb
  FROM events
  WINDOW w AS (PARTITION BY user_id, event_type ORDER BY ts, event_id))
SELECT event_id, user_id, event_type, ts FROM g WHERE nb = 1
"""


QUERIES = {
    "events_debounce": events_debounce,
}

ORACLES = {
    "events_debounce": EVENTS_DEBOUNCE_SQL,
}
