"""Time-series regularization over the events table (builder extension,
SURVEY §2C round 8).

``events_gapfill`` turns the irregular event stream into a dense,
regular hourly series per event_type — the resample-and-fill step every
monitoring / feature-engineering pipeline runs before windowed models:

1. aggregate events to (event_type, hour) buckets,
2. generate the COMPLETE hour grid spanning [min(ts), max(ts)] for
   every event type (sequence + explode — no driver loop),
3. left-join observations onto the grid,
4. zero-fill counts; forward-fill (last-observation-carried-forward)
   the hourly mean value.

Scale posture: the grid size is (span-hours × event-type cardinality) —
bounded by the TIME RANGE, not the event count, so the explode and the
per-type ordered window stay tiny no matter how many raw events the
scan feeds the first aggregation (which is a plain partial-agg
groupBy).  The span/type inputs ride in as broadcast 1-row / tiny
relations; nothing here collects to the driver.

Cross-engine parity: the hourly mean is rounded to 4 decimals BEFORE
the fill on both engines, so the carried value is byte-identical;
DuckDB's ``last_value(x IGNORE NULLS)`` twins Spark's
``F.last(x, ignorenulls=True)`` over the same ROWS frame.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from bigarrays_jl_spark.sources.tables import load


def events_gapfill(spark: SparkSession, sf: str) -> DataFrame:
    e = load(spark, sf, "events")
    hourly = (e.groupBy(F.date_trunc("hour", F.col("ts")).alias("h"),
                        "event_type")
               .agg(F.count("*").alias("n"),
                    F.round(F.avg("value"), 4).alias("avg_v")))
    span = e.agg(F.date_trunc("hour", F.min("ts")).alias("lo"),
                 F.date_trunc("hour", F.max("ts")).alias("hi"))
    types = e.select("event_type").distinct()
    grid = (types.crossJoin(F.broadcast(span))
            .select("event_type",
                    F.explode(F.sequence(
                        F.col("lo"), F.col("hi"),
                        F.expr("interval 1 hour"))).alias("h")))
    filled = grid.join(hourly, ["event_type", "h"], "left")
    w = (W.partitionBy("event_type").orderBy("h")
          .rowsBetween(W.unboundedPreceding, W.currentRow))
    return filled.select(
        "event_type", F.col("h").alias("hour_start"),
        F.coalesce(F.col("n"), F.lit(0)).alias("n_events"),
        F.last("avg_v", ignorenulls=True).over(w).alias("avg_value_ffill"))


EVENTS_GAPFILL_SQL = """
WITH hourly AS (
  SELECT date_trunc('hour', ts) AS h, event_type,
         count(*) AS n, round(CAST(avg(value) AS DOUBLE), 4) AS avg_v
  FROM events GROUP BY 1, 2),
span AS (SELECT date_trunc('hour', min(ts)) AS lo,
                date_trunc('hour', max(ts)) AS hi
         FROM events),
grid AS (
  SELECT t.event_type, unnest(generate_series(s.lo, s.hi,
                                              INTERVAL 1 HOUR)) AS h
  FROM (SELECT DISTINCT event_type FROM events) t CROSS JOIN span s)
SELECT g.event_type, g.h AS hour_start,
       coalesce(o.n, 0) AS n_events,
       last_value(o.avg_v IGNORE NULLS) OVER (
         PARTITION BY g.event_type ORDER BY g.h
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         AS avg_value_ffill
FROM grid g LEFT JOIN hourly o
  ON g.event_type = o.event_type AND g.h = o.h
"""


QUERIES = {
    "events_gapfill": events_gapfill,
}

ORACLES = {
    "events_gapfill": EVENTS_GAPFILL_SQL,
}
