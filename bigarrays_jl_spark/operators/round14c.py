"""Round-14 batch 3 (builder extension, SURVEY §2C):

``events_hdr_quantiles`` — P50/P90/P99/P999 of the event value per type
from a BOUNDED, EXACTLY-MERGEABLE decimal-HDR histogram: each value's
cents map to the bucket (digit count of cents, first two significant
digits), giving ≤ ~900 possible buckets per key at ANY data size with
≤ ~5 % relative value error — the HdrHistogram idea in decimal, made
cross-engine exact (bucket id and lower bound are pure integer/string
ops, no log()).  This is the bounded-state complement to the exact
value-domain quantiles (leadtime_quantiles, q70): those carry the full
distinct-value domain (fine in batch, unbounded in a stream); the HDR
buckets are what a production latency pipeline actually keeps, and
``streaming/hdr.py`` runs the SAME histogram as per-batch mergeable
partials with a snapshot == batch pin.

The quantile pick itself runs through ``ordering.bucketed_quantile_pick``
(the repo's one quantile canon — no single-partition window), and the
reported estimate is the bucket LOWER BOUND in cents (a deterministic
integer), so the whole result rides the exact value-hash oracle
instead of a tolerance band.

Scale shape: one map-side fold to ≤ (types × 900) bucket rows, three
two-level picks over that bounded table, broadcast totals.  At 100 TB
the histogram is still ≤ 900 rows per key.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from bigarrays_jl_spark.checkpointing import materialize
from bigarrays_jl_spark.operators.ordering import bucketed_quantile_picks
from bigarrays_jl_spark.sources.tables import load


def hdr_bucket_cents(cents: Column) -> Column:
    """Cents → decimal-HDR bucket LOWER BOUND (also the bucket id): the
    first two significant decimal digits, zero-padded to the original
    magnitude.  45 678 → 45 000; 94 → 94; 7 → 7; 0 → 0.  Negative
    cents (refunds, deltas — possible on arbitrary streaming feeds)
    bucket by magnitude with the bound on the LOW side: −45 678 →
    −46 000, so lb(c) ≤ c holds over the whole integer line and lb is
    monotone (r14 review: counting the '-' as a digit silently returned
    an UPPER bound for negatives).  A negative cents value EXACTLY on
    its magnitude's bucket edge is its own lower bound — lb(−100) =
    −100, not −110 (r14 advice: mapping edge values one bucket lower
    made negative buckets (lb, lb+w] with ~10 % relative error at the
    edges; with the edge case both signs are [lb, lb+w) and the ≤ ~5 %
    bound holds everywhere).  Pure string/integer ops — identical in
    Spark and DuckDB by construction."""
    m = F.abs(cents)
    s = m.cast("string")
    d = F.length(s)
    head = F.substring(s, 1, 2).cast("bigint")
    # 10^(d-2) as an exact BIGINT: repeat('0', d-2) appended to '1'
    pow10 = F.concat(F.lit("1"), F.repeat(F.lit("0"), d - 2)).cast("bigint")
    mag_lo = head * pow10                       # lower edge of |c|'s bucket
    mag_hi = (head + 1) * pow10                 # upper edge (exclusive)
    return (F.when(d <= 2, cents)               # |c| ≤ 99: exact bucket
             .when(cents >= 0, mag_lo)
             .when(m == mag_lo, -mag_lo)        # exact negative edge
             .otherwise(-mag_hi))


def events_hdr_quantiles(spark: SparkSession, sf: str) -> DataFrame:
    e = load(spark, sf, "events").select(
        "event_type",
        F.round(F.col("value") * 100).cast("bigint").alias("c"))
    # the histogram feeds FOUR picks + the totals row; without the
    # checkpoint each consumer re-runs the corpus scan + bucket fold
    # (5 full event scans for one bounded ≤900-rows-per-key table —
    # guide §2.4's "remove shuffles outright" on the repeated-subplan
    # axis; ReuseExchange can't match across separate pick subtrees)
    hist = materialize(
        e.select("event_type", hdr_bucket_cents(F.col("c")).alias("lb"))
         .groupBy("event_type", "lb").agg(F.count("*").alias("n")),
        eager=False)
    # all four fractions ride ONE shared pick chain (r18: per-pick
    # chains re-ran the bucket fold + checkpoint per fraction)
    picks = bucketed_quantile_picks(
        hist, "event_type", "lb", "n",
        [(1, 2, "p50_cents"), (9, 10, "p90_cents"),
         (99, 100, "p99_cents"), (999, 1000, "p999_cents")])
    tot = (hist.groupBy("event_type")
           .agg(F.sum("n").cast("bigint").alias("n_events"),
                F.count("*").cast("bigint").alias("n_buckets")))
    return (tot.join(picks, "event_type")
            .select("event_type", "n_events", "n_buckets",
                    F.col("p50_cents").cast("bigint").alias("p50_cents"),
                    F.col("p90_cents").cast("bigint").alias("p90_cents"),
                    F.col("p99_cents").cast("bigint").alias("p99_cents"),
                    F.col("p999_cents").cast("bigint")
                     .alias("p999_cents")))


# the bucket map and the den·cum >= num·tot pick, in plain SQL over the
# same integer domain
_HDR_BUCKET_SQL = """
  CASE WHEN length(CAST(abs(c) AS VARCHAR)) <= 2 THEN c
       WHEN c >= 0 THEN
         CAST(substr(CAST(abs(c) AS VARCHAR), 1, 2) AS BIGINT)
         * CAST('1' || repeat('0', length(CAST(abs(c) AS VARCHAR)) - 2)
                AS BIGINT)
       WHEN abs(c) =
         CAST(substr(CAST(abs(c) AS VARCHAR), 1, 2) AS BIGINT)
         * CAST('1' || repeat('0', length(CAST(abs(c) AS VARCHAR)) - 2)
                AS BIGINT)
       THEN c
       ELSE
         -(CAST(substr(CAST(abs(c) AS VARCHAR), 1, 2) AS BIGINT) + 1)
         * CAST('1' || repeat('0', length(CAST(abs(c) AS VARCHAR)) - 2)
                AS BIGINT) END
"""

EVENTS_HDR_QUANTILES_SQL = f"""
WITH e AS (
  SELECT event_type,
         CAST(round(value * 100) AS BIGINT) AS c
  FROM events),
h AS (
  SELECT event_type, {_HDR_BUCKET_SQL} AS lb, count(*) AS n
  FROM e GROUP BY 1, 2),
cum AS (
  SELECT event_type, lb, n,
         sum(n) OVER (PARTITION BY event_type ORDER BY lb
                      ROWS UNBOUNDED PRECEDING) AS cum,
         sum(n) OVER (PARTITION BY event_type) AS tot
  FROM h)
SELECT event_type,
       CAST(max(tot) AS BIGINT) AS n_events,
       CAST(count(*) AS BIGINT) AS n_buckets,
       CAST(min(CASE WHEN 2 * cum >= tot THEN lb END) AS BIGINT)
         AS p50_cents,
       CAST(min(CASE WHEN 10 * cum >= 9 * tot THEN lb END) AS BIGINT)
         AS p90_cents,
       CAST(min(CASE WHEN 100 * cum >= 99 * tot THEN lb END) AS BIGINT)
         AS p99_cents,
       CAST(min(CASE WHEN 1000 * cum >= 999 * tot THEN lb END) AS BIGINT)
         AS p999_cents
FROM cum GROUP BY event_type
"""


def events_hdr_merge(spark: SparkSession, sf: str) -> DataFrame:
    """Two-sketch HDR merge (r14 verdict task 6): build INDEPENDENT
    decimal-HDR sketches over two disjoint shards of the event stream
    (user_id parity — both shards carry every event_type, so merging
    genuinely ADDS bucket counts instead of concatenating disjoint
    keys), merge them by bucket-count addition, and quote production
    percentiles (P50/P99/P999) off the merged sketch.

    The oracle recomputes the SAME quantiles over the unsharded stream
    in one pass — the value-hash equality IS the mergeability proof:
    merge-of-sketches == sketch-of-union, exactly, because integer
    bucket counts under addition are an exact commutative monoid.
    This is how a 1000-executor fleet (or N datacenters) runs it: one
    tiny sketch per shard, a ≤ 900-rows-per-key merge, no raw-value
    shuffle."""
    # exhaustive shard split: Spark's % keeps the dividend's sign
    # (-3 % 2 == -1) and NULL % 2 is NULL, so a plain ==0/==1 parity
    # pair would silently drop negative/NULL user_ids from BOTH shards
    # and break merge == recompute (r15 review); pmod + coalesce sends
    # every row to exactly one shard
    shard = F.coalesce(F.pmod(F.col("user_id"), F.lit(2)), F.lit(0))
    e = load(spark, sf, "events").select(
        "event_type", shard.alias("shard"),
        F.round(F.col("value") * 100).cast("bigint").alias("c"))

    def sketch(part: DataFrame) -> DataFrame:
        return (part.select("event_type",
                            hdr_bucket_cents(F.col("c")).alias("lb"))
                .groupBy("event_type", "lb").agg(F.count("*").alias("n")))

    s_even = sketch(e.filter(F.col("shard") == 0))
    s_odd = sketch(e.filter(F.col("shard") == 1))
    # merged sketch feeds THREE picks + totals — materialize once so
    # the two shard scans of events run once, not 4× (same repeated-
    # subplan fix as events_hdr_quantiles above)
    merged = materialize(
        s_even.unionByName(s_odd)
              .groupBy("event_type", "lb")
              .agg(F.sum("n").alias("n")),
        eager=False)
    # all three fractions ride ONE shared pick chain (r18)
    picks = bucketed_quantile_picks(
        merged, "event_type", "lb", "n",
        [(1, 2, "p50_cents"), (99, 100, "p99_cents"),
         (999, 1000, "p999_cents")])
    tot = (merged.groupBy("event_type")
           .agg(F.sum("n").cast("bigint").alias("n_events")))
    return (tot.join(picks, "event_type")
            .select("event_type", "n_events",
                    F.col("p50_cents").cast("bigint").alias("p50_cents"),
                    F.col("p99_cents").cast("bigint").alias("p99_cents"),
                    F.col("p999_cents").cast("bigint")
                     .alias("p999_cents")))


# the oracle deliberately does NOT mirror the two-shard construction:
# it quantiles the unsharded stream directly, so equality proves
# merge-of-sketches == sketch-of-union (exact mergeability), not just
# that both engines ran the same arithmetic
EVENTS_HDR_MERGE_SQL = f"""
WITH e AS (
  SELECT event_type,
         CAST(round(value * 100) AS BIGINT) AS c
  FROM events),
h AS (
  SELECT event_type, {_HDR_BUCKET_SQL} AS lb, count(*) AS n
  FROM e GROUP BY 1, 2),
cum AS (
  SELECT event_type, lb, n,
         sum(n) OVER (PARTITION BY event_type ORDER BY lb
                      ROWS UNBOUNDED PRECEDING) AS cum,
         sum(n) OVER (PARTITION BY event_type) AS tot
  FROM h)
SELECT event_type,
       CAST(max(tot) AS BIGINT) AS n_events,
       CAST(min(CASE WHEN 2 * cum >= tot THEN lb END) AS BIGINT)
         AS p50_cents,
       CAST(min(CASE WHEN 100 * cum >= 99 * tot THEN lb END) AS BIGINT)
         AS p99_cents,
       CAST(min(CASE WHEN 1000 * cum >= 999 * tot THEN lb END) AS BIGINT)
         AS p999_cents
FROM cum GROUP BY event_type
"""


QUERIES = {
    "events_hdr_quantiles": events_hdr_quantiles,
    "events_hdr_merge": events_hdr_merge,
}

ORACLES = {
    "events_hdr_quantiles": EVENTS_HDR_QUANTILES_SQL,
    "events_hdr_merge": EVENTS_HDR_MERGE_SQL,
}
