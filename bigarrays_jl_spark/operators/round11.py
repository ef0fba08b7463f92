"""Round-11 computation classes (builder extension, SURVEY §2C):

- ``chi2_type_dow`` — chi-square test of independence between event
  type and day-of-week: the categorical-association screen that
  complements the mutual-information and t-test classes.  The fact
  table folds map-side to 35 (type × dow) cells; marginals are two
  tiny aggregates broadcast back; every cell statistic is computed in
  EXACT integer/decimal arithmetic — (o·N − rt·ct)² / (N·rt·ct) with
  one IEEE division per cell, round-9, decimal-summed per type (the
  float-parity canon from text_bigram_logprob).
- ``sample_weighted_exact`` — weighted sampling WITHOUT replacement
  (Efraimidis–Spirakis A-RES) made cross-engine deterministic: the
  uniform is a multiplicative-hash uniformizer U ∈ [0, 2²⁴) of doc_id,
  and the A-RES priority u^(1/w) is compared via EXACT INTEGER keys —
  for w ∈ {1,2,4}, u^(1/w) order-embeds as U^(4/w)·2^(96−24·(4/w))
  (common denominator 2⁹⁶), so there is no transcendental and no IEEE
  anywhere; ties are impossible modulo hash collisions, which the
  doc_id tie-break settles identically on both engines.  This is the
  streaming-reservoir-compatible sampler a curation pipeline uses for
  weighted corpus subsetting.
- ``interval_overlap_join`` — interval × interval overlap join:
  per-user activity sessions (30-min-gap sessionization) against
  global error-burst windows (error events padded ±0/＋300 s and
  merged).  Distinct from q22 (point-in-range) and q63 (self
  concurrency): two independently-derived interval SETS joined on
  s₁ < e₂ ∧ s₂ < e₁.

Scale posture: chi2 is a 35-cell fold; the sampler is one scan + a
TakeOrdered(50) heap (the A-RES property: a weighted sample needs only
the top-k priorities, never a sort); the overlap join broadcasts the
burst table (the alert-scale side — ~2 % of events, merged smaller)
into the session stream as a broadcast range join, and the burst merge
windows over the error SUBSET (at 100 TB that side shards by coarse
time bins first — SCALE.md).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from bigarrays_jl_spark.operators.ordering import distributed_prefix_sum
from bigarrays_jl_spark.sources.tables import load

SESSION_GAP_S = 1800
BURST_PAD_S = 300
SAMPLE_K = 50
# multiplicative-hash uniformizer (Knuth 2654435761) over 24 bits so
# U^4 < 2^96 fits decimal(38,0) exactly on both engines
U_MULT = 2654435761
U_BITS = 24
U_MOD = 1 << U_BITS


def chi2_type_dow(spark: SparkSession, sf: str) -> DataFrame:
    """χ² independence screen: is event type associated with
    day-of-week?  Emits one row per type with its χ² contribution
    (sum over the 7 dow cells), observed count, and cell count."""
    e = load(spark, sf, "events").select(
        "event_type",
        (F.floor(F.col("ts").cast("long") / 86400).cast("bigint") % 7)
        .alias("dow"))
    cells = e.groupBy("event_type", "dow").agg(F.count("*").alias("o"))
    rt = e.groupBy("event_type").agg(F.count("*").alias("rt"))
    ct = e.groupBy("dow").agg(F.count("*").alias("ct"))
    n = e.agg(F.count("*").alias("nn"))
    d = F.col("o").cast("decimal(20,0)") * F.col("nn").cast("decimal(20,0)") \
        - F.col("rt").cast("decimal(20,0)") * F.col("ct").cast("decimal(20,0)")
    num = (d * d)                                        # exact, < 2^96
    den = (F.col("nn").cast("decimal(20,0)")
           * F.col("rt").cast("decimal(20,0)")
           * F.col("ct").cast("decimal(20,0)"))
    cell = F.round(num.cast("double") / den.cast("double"), 9) \
            .cast("decimal(28,9)")
    return (cells
            .join(F.broadcast(rt), "event_type")
            .join(F.broadcast(ct), "dow")
            .crossJoin(F.broadcast(n))
            .groupBy("event_type")
            .agg(F.sum(cell).cast("double").alias("chi2_part"),
                 F.sum("o").cast("bigint").alias("n_events"),
                 F.count("*").cast("bigint").alias("n_cells")))


CHI2_SQL = """
WITH e AS (
  SELECT event_type,
         (CAST(floor(epoch_us(ts) / 1000000) AS BIGINT) // 86400) % 7 AS dow
  FROM events),
cells AS (SELECT event_type, dow, count(*) AS o FROM e GROUP BY 1, 2),
rt AS (SELECT event_type, count(*) AS rt FROM e GROUP BY 1),
ct AS (SELECT dow, count(*) AS ct FROM e GROUP BY 1),
n AS (SELECT count(*) AS nn FROM e)
SELECT event_type,
       CAST(sum(CAST(round(
         CAST((CAST(o AS HUGEINT) * nn - CAST(rt AS HUGEINT) * ct)
              * (CAST(o AS HUGEINT) * nn - CAST(rt AS HUGEINT) * ct)
              AS DOUBLE)
         / CAST(CAST(nn AS HUGEINT) * rt * ct AS DOUBLE), 9)
         AS DECIMAL(28,9))) AS DOUBLE) AS chi2_part,
       CAST(sum(o) AS BIGINT) AS n_events,
       CAST(count(*) AS BIGINT) AS n_cells
FROM cells JOIN rt USING (event_type) JOIN ct USING (dow) CROSS JOIN n
GROUP BY event_type
"""


def sample_weighted_exact(spark: SparkSession, sf: str) -> DataFrame:
    """Top-50 A-RES weighted sample of documents (w: src0→4,
    src1-3→2, else 1) with exact integer priorities.

    u^(1/w) for u = U/2²⁴, w ∈ {1,2,4} order-embeds as the integer
    U^(4/w) · 2^(96−24·(4/w)); TakeOrdered keeps the global sort off
    the plan.  rank is the output key (pure integers end to end)."""
    u = (F.col("doc_id") * F.lit(U_MULT)) % F.lit(U_MOD)
    d = load(spark, sf, "documents").select(
        "doc_id", "source",
        F.when(F.col("source") == "src0", 4)
         .when(F.col("source").isin("src1", "src2", "src3"), 2)
         .otherwise(1).alias("wt"),
        u.cast("decimal(38,0)").alias("u"))
    key = (F.when(F.col("wt") == 4,
                  F.col("u") * F.lit(str(2 ** 72)).cast("decimal(38,0)"))
            .when(F.col("wt") == 2,
                  F.col("u") * F.col("u")
                  * F.lit(str(2 ** 48)).cast("decimal(38,0)"))
            .otherwise((F.col("u") * F.col("u"))
                       * (F.col("u") * F.col("u"))))
    ranked = (d.select("doc_id", "source",
                       F.col("wt").cast("int").alias("wt"),
                       key.alias("k"))
               .orderBy(F.col("k").desc(), F.col("doc_id"))
               .limit(SAMPLE_K))
    # This unpartitioned window DOES emit Spark's SinglePartition WARN,
    # and that is fine BY CONSTRUCTION: its input is the TakeOrdered
    # top-SAMPLE_K rows above (a 50-row bounded set, never the corpus),
    # which is exactly why the repo-wide no-funnel gate recognizes the
    # post-limit() pattern as bounded and does not flag it (r16 verdict
    # task 6 — don't re-investigate the warning).
    win = W.orderBy(F.col("k").desc(), F.col("doc_id"))
    return ranked.select(
        F.row_number().over(win).cast("int").alias("rank"),
        "doc_id", "source", "wt")


SAMPLE_WEIGHTED_SQL = f"""
WITH d AS (
  SELECT doc_id, source,
         CASE WHEN source = 'src0' THEN 4
              WHEN source IN ('src1', 'src2', 'src3') THEN 2
              ELSE 1 END AS wt,
         CAST((doc_id * {U_MULT}) % {U_MOD} AS HUGEINT) AS u
  FROM documents),
k AS (
  SELECT doc_id, source, wt,
         CASE WHEN wt = 4 THEN u * CAST({2 ** 72} AS HUGEINT)
              WHEN wt = 2 THEN u * u * CAST({2 ** 48} AS HUGEINT)
              ELSE u * u * u * u END AS k
  FROM d)
SELECT CAST(row_number() OVER (ORDER BY k DESC, doc_id) AS INT) AS rank,
       doc_id, source, CAST(wt AS INT) AS wt
FROM k
ORDER BY k DESC, doc_id
LIMIT {SAMPLE_K}
"""


def interval_overlap_join(spark: SparkSession, sf: str) -> DataFrame:
    """Per user: how many merged error-burst windows overlapped the
    user's activity sessions, and for how many total seconds.

    Sessions: per-user 30-min-gap sessionization (user-keyed window —
    co-partitioned, never global).  Bursts: error events padded to
    [sec, sec+PAD] and merged into islands WITHOUT the classic global
    cummax window (the error subset of a 100 TB events table is still
    corpus-proportional).  Because every padded interval has the SAME
    length, the running max of interval ends degenerates to "previous
    distinct error second + PAD", so an island START is exactly a
    distinct error second with no other error second in [s−PAD, s) —
    detectable with a bucketed self-anti-join (bucket width PAD, the
    q29 two-bucket cover; linear, never a window).  Island ids are a
    distributed_prefix_sum of the start flags (ordering.py, no
    SinglePartition), and the session×burst overlap join is grid-
    bucketed (both interval sets explode onto a coarse day grid and
    join on bucket equality + the exact residual s₁<e₂ ∧ s₂<e₁,
    deduped per pair) instead of broadcasting an unboundedly growing
    burst table.  Overlap seconds are pure integer arithmetic."""
    ev = load(spark, sf, "events").select(
        "user_id", "event_id",
        F.col("ts").cast("long").alias("sec"),
        "event_type")

    uw = W.partitionBy("user_id").orderBy("sec", "event_id")
    gap = (F.col("sec") - F.lag("sec").over(uw) > SESSION_GAP_S)
    sess = (ev
            .withColumn("new_s", F.when(gap, 1).otherwise(0))
            .withColumn("sid", F.sum("new_s").over(
                uw.rowsBetween(W.unboundedPreceding, 0)))
            .groupBy("user_id", "sid")
            .agg(F.min("sec").alias("s_start"),
                 F.max("sec").alias("s_end")))

    # islands over DISTINCT error seconds: duplicates at one second
    # never start a new island and never move min/max, so the merge is
    # invariant to collapsing them first (one shuffle, much smaller).
    errs = (ev.filter(F.col("event_type") == "error")
              .select("sec").distinct())
    tgt = errs.withColumn("bk", F.floor(F.col("sec") / BURST_PAD_S)
                          .cast("bigint"))
    # any predecessor s2 ∈ [s−PAD, s) lives in bucket floor(s/PAD) or
    # floor(s/PAD)−1, so exploding s2 to {its bucket, its bucket + 1}
    # and joining on the target's bucket covers all candidates
    pred = (errs.select(F.col("sec").alias("s2"))
            .withColumn("bk", F.explode(F.array(
                F.floor(F.col("s2") / BURST_PAD_S).cast("bigint"),
                F.floor(F.col("s2") / BURST_PAD_S).cast("bigint") + 1))))
    starts = (tgt.join(pred,
                       (tgt["bk"] == pred["bk"])
                       & (F.col("s2") >= F.col("sec") - BURST_PAD_S)
                       & (F.col("s2") < F.col("sec")),
                       "left_anti")
              .select("sec", F.lit(1).alias("st")))
    flagged = (errs.join(starts, "sec", "left")
               .select("sec", F.coalesce("st", F.lit(0)).alias("st")))
    ranked, _n_islands = distributed_prefix_sum(
        spark, flagged, F.col("st"), "sec", "sec", out="bid")
    bursts = (ranked.groupBy("bid")
              .agg(F.min("sec").alias("b_start"),
                   (F.max("sec") + BURST_PAD_S).alias("b_end")))

    return overlap_aggregate(sess.select("user_id", "s_start", "s_end"),
                             bursts.select("b_start", "b_end"))


def overlap_aggregate(sess: DataFrame, bursts: DataFrame) -> DataFrame:
    """Grid-bucketed session×burst overlap join + per-user rollup —
    shared by the batch operator above and its streaming twin
    (streaming/intervals.py), so both compute the identical final
    stage over (user_id, s_start, s_end) sessions and (b_start, b_end)
    bursts.  Bursts are disjoint islands, so b_start identifies a
    burst; sessions are disjoint per user, so (user_id, s_start)
    identifies a session — the grid-replica dedupe and the distinct
    burst count need no surrogate ids."""
    grid = 86400  # coarse overlap grid: ≤ interval_days + 1 replicas
    sg = sess.withColumn("gb", F.explode(F.sequence(
        F.floor(F.col("s_start") / grid).cast("bigint"),
        F.floor(F.col("s_end") / grid).cast("bigint"))))
    bg = bursts.withColumn("gb", F.explode(F.sequence(
        F.floor(F.col("b_start") / grid).cast("bigint"),
        F.floor(F.col("b_end") / grid).cast("bigint"))))
    pairs = (sg.join(bg, "gb")
             .filter((F.col("s_start") < F.col("b_end"))
                     & (F.col("b_start") < F.col("s_end")))
             .select("user_id", "s_start", "s_end", "b_start", "b_end")
             .distinct())
    overlap = (F.least("s_end", "b_end")
               - F.greatest("s_start", "b_start"))
    return (pairs.groupBy("user_id")
            .agg(F.countDistinct("b_start").cast("bigint")
                 .alias("n_bursts_hit"),
                 F.sum(overlap).cast("bigint").alias("overlap_secs")))


INTERVAL_OVERLAP_SQL = f"""
WITH ev AS (
  SELECT user_id, event_id,
         CAST(floor(epoch_us(ts) / 1000000) AS BIGINT) AS sec,
         event_type
  FROM events),
s0 AS (
  SELECT user_id, sec, event_id,
         CASE WHEN sec - lag(sec) OVER (PARTITION BY user_id
                                        ORDER BY sec, event_id)
                   > {SESSION_GAP_S} THEN 1 ELSE 0 END AS new_s
  FROM ev),
s1 AS (
  SELECT user_id,
         sum(new_s) OVER (PARTITION BY user_id ORDER BY sec, event_id
                          ROWS UNBOUNDED PRECEDING) AS sid,
         sec
  FROM s0),
sess AS (
  SELECT user_id, sid, min(sec) AS s_start, max(sec) AS s_end
  FROM s1 GROUP BY 1, 2),
err AS (
  SELECT sec, event_id, sec + {BURST_PAD_S} AS e_end
  FROM ev WHERE event_type = 'error'),
b0 AS (
  SELECT sec, e_end,
         CASE WHEN max(e_end) OVER (ORDER BY sec, event_id
                                    ROWS BETWEEN UNBOUNDED PRECEDING
                                    AND 1 PRECEDING) IS NULL
                   OR sec > max(e_end) OVER (ORDER BY sec, event_id
                                             ROWS BETWEEN UNBOUNDED
                                             PRECEDING AND 1 PRECEDING)
              THEN 1 ELSE 0 END AS new_b,
         event_id
  FROM err),
b1 AS (
  SELECT sec, e_end,
         sum(new_b) OVER (ORDER BY sec, event_id
                          ROWS UNBOUNDED PRECEDING) AS bid
  FROM b0),
bursts AS (
  SELECT bid, min(sec) AS b_start, max(e_end) AS b_end
  FROM b1 GROUP BY 1)
SELECT user_id,
       CAST(count(DISTINCT bid) AS BIGINT) AS n_bursts_hit,
       CAST(sum(least(s_end, b_end) - greatest(s_start, b_start))
            AS BIGINT) AS overlap_secs
FROM sess JOIN bursts
  ON s_start < b_end AND b_start < s_end
GROUP BY user_id
"""


QUERIES = {
    "chi2_type_dow": chi2_type_dow,
    "sample_weighted_exact": sample_weighted_exact,
    "interval_overlap_join": interval_overlap_join,
}

ORACLES = {
    "chi2_type_dow": CHI2_SQL,
    "sample_weighted_exact": SAMPLE_WEIGHTED_SQL,
    "interval_overlap_join": INTERVAL_OVERLAP_SQL,
}
