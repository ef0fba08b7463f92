"""Round-13 batch 2 (builder extension, SURVEY §2C):

- ``session_bounce_rate`` — per session-ENTRY event type: session
  count, single-event ("bounce") count, and bounce rate.  Composes
  the events_sessionize 30-minute-gap canon (operators/events.py) and
  adds the entry-attribution step every web-analytics stack reports;
  the entry event is the session's (ts, event_id)-min row.
- ``customer_reorder_gaps`` — P50/P90 days between a customer's
  consecutive orders, per market segment, through
  ``ordering.bucketed_quantile_pick`` (the repo's one quantile
  implementation).  The repurchase-latency readout behind inventory
  and CRM planning; gaps come from one customer-keyed lag window.
- ``boilerplate_prefixes`` — the C4-style boilerplate detector: the
  top-20 repeated document PREFIXES (first ``BOILER_K`` words, hashed)
  with how many docs and distinct sources carry each.  A real crawl
  dedups headers/footers by exactly this grouping; ``BOILER_K`` is 8
  — the production scale, same as cross_source_leakage's 8-grams.
  (r13 shipped with a demo-collision K=2; the r14 fixture plants
  shared 8-word header templates in the sf1 corpus, and the driver's
  own documents tables collide naturally at 8 — 23 groups at sf0.01,
  233 at sf0.1 — so the production K is provable at every SF.)

Scale: bounce sessions use only per-user windows then cell-keyed
folds; reorder gaps fold to a (segment, gap-days) histogram before the
two-level pick; prefix grouping is one map-side-combined groupBy on a
16-byte hash + a TakeOrdered(20) heap — no global sort, no window over
corpus-growing input.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from bigarrays_jl_spark.operators.events import (SESSION_GAP_MIN,
                                                 sessionized)
from bigarrays_jl_spark.checkpointing import materialize
from bigarrays_jl_spark.operators.ordering import bucketed_quantile_picks
from bigarrays_jl_spark.sources.tables import load

BOILER_K = 8        # prefix words — production scale (r13 verdict task 2)
BOILER_TOPK = 20


def session_bounce_rate(spark: SparkSession, sf: str) -> DataFrame:
    e = load(spark, sf, "events").select("user_id", "ts", "event_id",
                                         "event_type")
    sess = sessionized(e)          # the events.py 30-min canon, shared
    per = (sess.groupBy("user_id", "session_id")
           .agg(F.count("*").alias("n_ev"),
                F.min_by("event_type", F.struct("ts", "event_id"))
                 .alias("entry")))
    return (per.groupBy(F.col("entry").alias("entry_type"))
            .agg(F.count("*").cast("bigint").alias("n_sessions"),
                 F.sum((F.col("n_ev") == 1).cast("int")).cast("bigint")
                  .alias("n_bounces"))
            .select("entry_type", "n_sessions", "n_bounces",
                    F.round(F.col("n_bounces").cast("double")
                            / F.col("n_sessions").cast("double"), 6)
                    .alias("bounce_rate")))


SESSION_BOUNCE_SQL = f"""
WITH g AS (
  SELECT user_id, ts, event_id, event_type,
         CASE WHEN lag(ts) OVER w IS NULL
              OR CAST(floor(epoch_us(ts) / 1000000) AS BIGINT)
                 - CAST(floor(epoch_us(lag(ts) OVER w) / 1000000)
                        AS BIGINT) > {SESSION_GAP_MIN * 60}
              THEN 1 ELSE 0 END AS new_s
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
s AS (
  SELECT user_id, event_type, ts, event_id,
         sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                          ROWS UNBOUNDED PRECEDING) AS session_id
  FROM g),
per AS (
  SELECT user_id, session_id, count(*) AS n_ev FROM s GROUP BY 1, 2),
ent AS (
  SELECT user_id, session_id, event_type AS entry
  FROM (SELECT user_id, session_id, event_type,
               row_number() OVER (PARTITION BY user_id, session_id
                                  ORDER BY ts, event_id) AS rn
        FROM s)
  WHERE rn = 1),
pe AS (SELECT * FROM per JOIN ent USING (user_id, session_id))
SELECT entry AS entry_type,
       CAST(count(*) AS BIGINT) AS n_sessions,
       CAST(sum(CASE WHEN n_ev = 1 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_bounces,
       round(CAST(sum(CASE WHEN n_ev = 1 THEN 1 ELSE 0 END) AS DOUBLE)
             / CAST(count(*) AS DOUBLE), 6) AS bounce_rate
FROM pe GROUP BY entry
"""


def customer_reorder_gaps(spark: SparkSession, sf: str) -> DataFrame:
    o = load(spark, sf, "orders").select(
        "o_custkey",
        F.datediff(F.col("o_orderdate").cast("date"),
                   F.lit("1970-01-01").cast("date"))
         .cast("bigint").alias("day"))
    w = W.partitionBy("o_custkey").orderBy("day")
    gaps = (o.withColumn("prev", F.lag("day").over(w))
            .filter(F.col("prev").isNotNull())
            .select("o_custkey", (F.col("day") - F.col("prev"))
                    .alias("gap_days")))
    seg = load(spark, sf, "customer").select(
        F.col("c_custkey").alias("o_custkey"), "c_mktsegment")
    # hist feeds two picks + totals — materialize once or the lag
    # window + segment join re-run 3× (the quantile-caller checkpoint
    # idiom; the (segment, gap) domain is tiny)
    hist = materialize(
        gaps.join(seg, "o_custkey")
            .groupBy("c_mktsegment", "gap_days")
            .agg(F.count("*").alias("n")),
        eager=False)
    # both fractions ride ONE shared pick chain (r18: per-pick chains
    # re-ran the bucket fold + checkpoint per fraction)
    picks = bucketed_quantile_picks(
        hist, "c_mktsegment", "gap_days", "n",
        [(1, 2, "p50_gap_days"), (9, 10, "p90_gap_days")])
    tot = (hist.groupBy("c_mktsegment")
           .agg(F.sum("n").cast("bigint").alias("n_gaps")))
    return (tot.join(picks, "c_mktsegment")
            .select("c_mktsegment", "n_gaps",
                    F.col("p50_gap_days").cast("bigint")
                    .alias("p50_gap_days"),
                    F.col("p90_gap_days").cast("bigint")
                    .alias("p90_gap_days")))


REORDER_GAPS_SQL = """
WITH o AS (
  SELECT o_custkey,
         CAST(date_diff('day', DATE '1970-01-01',
                        CAST(o_orderdate AS DATE)) AS BIGINT) AS day
  FROM orders),
gaps AS (
  SELECT o_custkey,
         day - lag(day) OVER (PARTITION BY o_custkey ORDER BY day)
           AS gap_days
  FROM o),
h AS (
  SELECT c_mktsegment, gap_days, count(*) AS n
  FROM gaps JOIN customer ON o_custkey = c_custkey
  WHERE gap_days IS NOT NULL
  GROUP BY 1, 2),
c AS (
  SELECT c_mktsegment, gap_days, n,
         sum(n) OVER (PARTITION BY c_mktsegment ORDER BY gap_days
                      ROWS UNBOUNDED PRECEDING) AS cum,
         sum(n) OVER (PARTITION BY c_mktsegment) AS tot
  FROM h)
SELECT c_mktsegment,
       CAST(max(tot) AS BIGINT) AS n_gaps,
       CAST(min(CASE WHEN 2 * cum >= tot THEN gap_days END) AS BIGINT)
         AS p50_gap_days,
       CAST(min(CASE WHEN 10 * cum >= 9 * tot THEN gap_days END)
            AS BIGINT) AS p90_gap_days
FROM c GROUP BY c_mktsegment
"""


def boilerplate_prefixes(spark: SparkSession, sf: str) -> DataFrame:
    d = (load(spark, sf, "documents")
         .select("doc_id", "source",
                 F.split(F.col("text"), " ").alias("ws")))
    prefix = F.md5(F.concat_ws(
        " ", *[F.element_at("ws", i + 1) for i in range(BOILER_K)]))
    groups = (d.filter(F.size("ws") >= BOILER_K)
              .select(prefix.alias("ph"), "source")
              .groupBy("ph")
              .agg(F.count("*").alias("n_docs"),
                   F.countDistinct("source").alias("n_sources"))
              .filter(F.col("n_docs") > 1))
    return (groups
            .orderBy(F.col("n_docs").desc(), F.col("ph"))
            .limit(BOILER_TOPK)
            .select("ph", F.col("n_docs").cast("bigint").alias("n_docs"),
                    F.col("n_sources").cast("bigint").alias("n_sources")))


# prefix expression derives from BOILER_K exactly like the Spark side,
# so changing the constant can never desynchronize operator and oracle
_PREFIX_SQL = " || ' ' || ".join(f"ws[{i + 1}]" for i in range(BOILER_K))

BOILERPLATE_SQL = f"""
WITH w AS (
  SELECT source, string_split(text, ' ') AS ws FROM documents),
g AS (
  SELECT md5({_PREFIX_SQL}) AS ph,
         count(*) AS n_docs, count(DISTINCT source) AS n_sources
  FROM w WHERE len(ws) >= {BOILER_K}
  GROUP BY 1 HAVING count(*) > 1)
SELECT ph, CAST(n_docs AS BIGINT) AS n_docs,
       CAST(n_sources AS BIGINT) AS n_sources
FROM g ORDER BY n_docs DESC, ph LIMIT {BOILER_TOPK}
"""


QUERIES = {
    "session_bounce_rate": session_bounce_rate,
    "customer_reorder_gaps": customer_reorder_gaps,
    "boilerplate_prefixes": boilerplate_prefixes,
}

ORACLES = {
    "session_bounce_rate": SESSION_BOUNCE_SQL,
    "customer_reorder_gaps": REORDER_GAPS_SQL,
    "boilerplate_prefixes": BOILERPLATE_SQL,
}
