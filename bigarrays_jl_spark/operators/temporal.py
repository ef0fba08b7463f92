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

Cross-engine parity: the hourly mean is an EXACT decimal sum (order-
independent at any partitioning) divided ONCE as a double — and NOT
rounded: the 2-decimal source values make sum/count land on exact
decimal ties (e.g. 1403.37/24 = 58.47375) where Spark's BigDecimal
round and DuckDB's scaled-multiply round disagree, while the unrounded
quotient of identical doubles is bit-identical.  The carried value is
therefore byte-identical;
DuckDB's ``last_value(x IGNORE NULLS)`` twins Spark's
``F.last(x, ignorenulls=True)`` over the same ROWS frame.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from bigarrays_jl_spark.sources.tables import load


def _hourly_grid(spark: SparkSession, sf: str) -> DataFrame:
    """(event_type, h, n, avg_v) over the COMPLETE hourly grid — the
    shared regularization scaffold for both fill strategies.  avg_v is
    deliberately UNROUNDED (see module doc: exact ties) — the decimal
    sum + single division is bit-identical on both engines."""
    e = load(spark, sf, "events")
    # exact-decimal mean canon (cf. relational._davg2): a partitioned
    # double avg differs from DuckDB's sequential one by an ulp and
    # flips the 4th decimal at sf0.1 — decimal sum, ONE double division
    hourly = (e.groupBy(F.date_trunc("hour", F.col("ts")).alias("h"),
                        "event_type")
               .agg(F.count("*").alias("n"),
                    (F.sum(F.col("value").cast("decimal(25,10)"))
                      .cast("double") / F.count("value")).alias("avg_v")))
    span = e.agg(F.date_trunc("hour", F.min("ts")).alias("lo"),
                 F.date_trunc("hour", F.max("ts")).alias("hi"))
    types = e.select("event_type").distinct()
    grid = (types.crossJoin(F.broadcast(span))
            .select("event_type",
                    F.explode(F.sequence(
                        F.col("lo"), F.col("hi"),
                        F.expr("interval 1 hour"))).alias("h")))
    return grid.join(hourly, ["event_type", "h"], "left")


def events_gapfill(spark: SparkSession, sf: str) -> DataFrame:
    filled = _hourly_grid(spark, sf)
    w = (W.partitionBy("event_type").orderBy("h")
          .rowsBetween(W.unboundedPreceding, W.currentRow))
    return filled.select(
        "event_type", F.col("h").alias("hour_start"),
        F.coalesce(F.col("n"), F.lit(0)).alias("n_events"),
        F.last("avg_v", ignorenulls=True).over(w).alias("avg_value_ffill"))


EVENTS_GAPFILL_SQL = """
WITH hourly AS (
  SELECT date_trunc('hour', ts) AS h, event_type,
         count(*) AS n,
         CAST(sum(CAST(value AS DECIMAL(25,10))) AS DOUBLE)
           / count(value) AS avg_v
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


def events_interpolate(spark: SparkSession, sf: str) -> DataFrame:
    """Linear interpolation over the same hourly grid: missing hours get
    the time-weighted blend of the nearest observed value on each side;
    hours before the first / after the last observation stay NULL (no
    extrapolation).

    The interpolation fraction uses epoch SECONDS of whole-hour
    timestamps — exact integers on both engines (Spark cast-to-long ==
    DuckDB floor(epoch_us/1e6), see events.EVENTS_SESSIONIZE_SQL) — so
    the only float work is one blend expression, rounded to 4."""
    filled = _hourly_grid(spark, sf)
    wp = (W.partitionBy("event_type").orderBy("h")
           .rowsBetween(W.unboundedPreceding, W.currentRow))
    wf = (W.partitionBy("event_type").orderBy("h")
           .rowsBetween(W.currentRow, W.unboundedFollowing))
    obs_h = F.when(F.col("avg_v").isNotNull(), F.col("h"))
    pv = F.last("avg_v", ignorenulls=True).over(wp)
    ph = F.last(obs_h, ignorenulls=True).over(wp)
    nv = F.first("avg_v", ignorenulls=True).over(wf)
    nh = F.first(obs_h, ignorenulls=True).over(wf)
    he = F.col("h").cast("long").cast("double")
    pe = ph.cast("long").cast("double")
    ne = nh.cast("long").cast("double")
    # NO round on the blend: rounding a double that can land arbitrarily
    # close to a .00005 tie diverges between engines (each computes the
    # tie test through different scaled intermediates), while the raw
    # blend is one identical IEEE expression tree on exact-integer epoch
    # inputs and 4-decimal endpoints — bit-identical unrounded.
    interp = (F.when(F.col("avg_v").isNotNull(), F.col("avg_v"))
               .when(pv.isNotNull() & nv.isNotNull(),
                     pv + (nv - pv) * ((he - pe) / (ne - pe))))
    return filled.select(
        "event_type", F.col("h").alias("hour_start"),
        F.coalesce(F.col("n"), F.lit(0)).alias("n_events"),
        interp.alias("avg_value_interp"))


EVENTS_INTERPOLATE_SQL = """
WITH hourly AS (
  SELECT date_trunc('hour', ts) AS h, event_type,
         count(*) AS n,
         CAST(sum(CAST(value AS DECIMAL(25,10))) AS DOUBLE)
           / count(value) AS avg_v
  FROM events GROUP BY 1, 2),
span AS (SELECT date_trunc('hour', min(ts)) AS lo,
                date_trunc('hour', max(ts)) AS hi
         FROM events),
grid AS (
  SELECT t.event_type, unnest(generate_series(s.lo, s.hi,
                                              INTERVAL 1 HOUR)) AS h
  FROM (SELECT DISTINCT event_type FROM events) t CROSS JOIN span s),
filled AS (
  SELECT g.event_type, g.h, o.n, o.avg_v
  FROM grid g LEFT JOIN hourly o
    ON g.event_type = o.event_type AND g.h = o.h),
neighbored AS (
  SELECT event_type, h, n, avg_v,
         last_value(avg_v IGNORE NULLS) OVER wp AS pv,
         last_value(CASE WHEN avg_v IS NOT NULL THEN h END IGNORE NULLS)
           OVER wp AS ph,
         first_value(avg_v IGNORE NULLS) OVER wf AS nv,
         first_value(CASE WHEN avg_v IS NOT NULL THEN h END IGNORE NULLS)
           OVER wf AS nh
  FROM filled
  WINDOW
    wp AS (PARTITION BY event_type ORDER BY h
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
    wf AS (PARTITION BY event_type ORDER BY h
           ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
SELECT event_type, h AS hour_start, coalesce(n, 0) AS n_events,
       CASE WHEN avg_v IS NOT NULL THEN avg_v
            WHEN pv IS NOT NULL AND nv IS NOT NULL THEN
              pv + (nv - pv)
                   * ((CAST(floor(epoch_us(h) / 1000000) AS DOUBLE)
                       - CAST(floor(epoch_us(ph) / 1000000) AS DOUBLE))
                      / (CAST(floor(epoch_us(nh) / 1000000) AS DOUBLE)
                         - CAST(floor(epoch_us(ph) / 1000000) AS DOUBLE)))
       END AS avg_value_interp
FROM neighbored
"""


QUERIES = {
    "events_gapfill": events_gapfill,
    "events_interpolate": events_interpolate,
}

ORACLES = {
    "events_gapfill": EVENTS_GAPFILL_SQL,
    "events_interpolate": EVENTS_INTERPOLATE_SQL,
}
