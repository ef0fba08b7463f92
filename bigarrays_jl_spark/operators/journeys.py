"""User-journey sequence mining over the events table (builder
extension, SURVEY §2C round 8).

``events_journeys`` — the frequency table of each user's opening
event-type sequence (first JOURNEY_LEN events in time order): the
sequence-mining view behind funnel design, onboarding analysis and
bot-pattern detection.  ``events_transitions`` sees only adjacent
pairs; this sees the ordered prefix as one path string.

Scale shape: a user-partitioned row_number window TRIMS each user to
JOURNEY_LEN rows BEFORE any aggregation (the per-user state is ≤
JOURNEY_LEN structs — bounded even for a bot with millions of events;
aggregating collect_list over raw events would not be), then one
groupBy(user) to assemble paths and one groupBy(journey) to count —
journey cardinality, not user count, bounds the final shuffle.

Determinism: order is (ts, event_id) everywhere — the repo's event
tie-break canon; the path assembles from an array_sort on the rank
carried into the struct, so partition order can never leak into the
string.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from bigarrays_jl_spark.sources.tables import load

JOURNEY_LEN = 5
SEP = ">"


def events_journeys(spark: SparkSession, sf: str) -> DataFrame:
    e = load(spark, sf, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    prefix = (e.withColumn("rn", F.row_number().over(w))
               .filter(F.col("rn") <= JOURNEY_LEN))
    per_user = (prefix.groupBy("user_id")
                .agg(F.concat_ws(SEP, F.transform(
                    F.array_sort(F.collect_list(
                        F.struct("rn", "event_type"))),
                    lambda s: s.event_type)).alias("journey"),
                     F.count("*").alias("journey_len")))
    n_users = per_user.agg(F.count("*").cast("double").alias("nu"))
    return (per_user.groupBy("journey", "journey_len")
            .agg(F.count("*").alias("n_users"))
            .crossJoin(F.broadcast(n_users))
            .select("journey", F.col("journey_len").cast("int").alias("journey_len"),
                    "n_users",
                    # UNROUNDED: count/total can land on exact decimal
                    # ties (e.g. odd n / 128 users) where the engines'
                    # round() disagree; the raw IEEE quotient of
                    # identical operands is bit-identical
                    (F.col("n_users") / F.col("nu")).alias("share")))


EVENTS_JOURNEYS_SQL = f"""
WITH r AS (
  SELECT user_id, event_type,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY ts, event_id) AS rn
  FROM events),
j AS (
  SELECT user_id,
         string_agg(event_type, '{SEP}' ORDER BY rn) AS journey,
         count(*) AS journey_len
  FROM r WHERE rn <= {JOURNEY_LEN} GROUP BY user_id),
nu AS (SELECT CAST(count(*) AS DOUBLE) AS nu FROM j)
SELECT journey, CAST(journey_len AS INT) AS journey_len,
       count(*) AS n_users,
       count(*) / nu.nu AS share
FROM j CROSS JOIN nu
GROUP BY journey, journey_len, nu.nu
"""


QUERIES = {
    "events_journeys": events_journeys,
}

ORACLES = {
    "events_journeys": EVENTS_JOURNEYS_SQL,
}
