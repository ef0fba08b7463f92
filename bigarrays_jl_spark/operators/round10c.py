"""Round-10 third batch: SCD2 history build, positional-index phrase
search, and embedding covariance (distributed Gram matrix).

- scd2_history: the slowly-changing-dimension type-2 build — collapse
  a change stream into validity intervals [valid_from, valid_to) per
  key via gaps-and-islands (consecutive-duplicate suppression) + lead.
  Per-key windows only; state bounded by a key's change count.
- phrase_search: a positional inverted index (doc_id, pos, token) and
  a phrase query over it — the top corpus bigram is matched by
  position-adjacency join, the relational form of "phrase query
  against an inverted index".  The index is the exploded token
  stream; adjacency is an equi-join on (doc_id, pos+1).
- emb_covariance: the distributed linear-algebra class — the dim×dim
  covariance matrix from map-side outer-product partials: each vector
  emits its dim² products via a nested array transform (NO self-join,
  no shuffle of vectors), partial-aggregated by cell.  Shuffle is
  ∝ dim², independent of the corpus size — the shape PCA/whitening
  needs at 100 TB.
"""
from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window
from pyspark.sql import functions as F

from bigarrays_jl_spark.functions import tokens as _tokens
from bigarrays_jl_spark.sources.tables import load

# --------------------------------------------------------------------------
# scd2_history — SCD type-2 from the events change stream: each user's
# event_type over time is the tracked attribute; consecutive repeats
# collapse (gaps-and-islands via lag), each island becomes a validity
# interval [valid_from, valid_to) closed by the next island's start
# (lead), the last interval per user open (is_current).  Output is the
# compact per-type interval census: interval count, total closed
# duration (exact integer seconds), open-interval count.
#
# Scale shape: two per-user windows (lag to detect change, lead to
# close intervals) — per-key state ∝ that key's changes; the final
# census shuffle is attribute-cardinality-bounded.  Epoch-seconds
# canon for the duration arithmetic.
# --------------------------------------------------------------------------


def scd2_intervals(ev: DataFrame) -> DataFrame:
    """Island → interval canon: input ``(user_id, t, event_id,
    event_type)``, output SCD2 rows ``(user_id, event_type,
    valid_from, from_eid, valid_to)`` (``valid_to`` NULL = open).
    ``event_id`` tiebreak makes the ordering total (duplicate ts
    exist).  Shared verbatim by ``streaming.scd2`` so batch and
    streaming can never disagree on interval semantics."""
    w = Window.partitionBy("user_id").orderBy("t", "event_id")
    ch = (ev.withColumn("prev", F.lag("event_type").over(w))
          .filter(F.col("prev").isNull()
                  | (F.col("prev") != F.col("event_type"))))
    w2 = Window.partitionBy("user_id").orderBy("t", "event_id")
    return (ch.withColumn("valid_to", F.lead("t").over(w2))
            .select("user_id", "event_type",
                    F.col("t").alias("valid_from"),
                    F.col("event_id").alias("from_eid"), "valid_to"))


def scd2_history(spark: SparkSession, sf: str) -> DataFrame:
    ev = load(spark, sf, "events").select(
        "user_id", F.col("ts").cast("long").alias("t"), "event_type",
        "event_id")
    iv = scd2_intervals(ev)
    return (iv.groupBy("event_type")
            .agg(F.count("*").alias("n_intervals"),
                 F.sum(F.when(F.col("valid_to").isNotNull(),
                              F.col("valid_to") - F.col("valid_from"))
                       .otherwise(0)).cast("bigint")
                  .alias("closed_duration_s"),
                 F.sum(F.when(F.col("valid_to").isNull(), 1).otherwise(0))
                  .cast("bigint").alias("n_current")))


SCD2_HISTORY_SQL = """
WITH ev AS (
  SELECT user_id,
         CAST(floor(epoch_us(ts)/1000000) AS BIGINT) AS t,
         event_type, event_id
  FROM events),
ch AS (
  SELECT * FROM (
    SELECT user_id, t, event_type, event_id,
           lag(event_type) OVER (PARTITION BY user_id
                                 ORDER BY t, event_id) AS prev
    FROM ev)
  WHERE prev IS NULL OR prev <> event_type),
iv AS (
  SELECT user_id, event_type, t AS valid_from,
         lead(t) OVER (PARTITION BY user_id
                       ORDER BY t, event_id) AS valid_to
  FROM ch)
SELECT event_type, count(*) AS n_intervals,
       CAST(sum(CASE WHEN valid_to IS NOT NULL
                     THEN valid_to - valid_from ELSE 0 END) AS BIGINT)
         AS closed_duration_s,
       CAST(sum(CASE WHEN valid_to IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_current
FROM iv GROUP BY event_type
"""


# --------------------------------------------------------------------------
# phrase_search — positional inverted index + phrase query.  The index
# is the posexplode'd token stream (doc_id, pos, token); the query
# phrase is the corpus's top bigram (max count, then lexicographic —
# fully deterministic), matched by the adjacency equi-join
# index(w1)@pos ⋈ index(w2)@pos+1.  Output: per-doc match counts for
# the top ten docs (count desc, doc_id asc).
#
# Scale shape: the bigram stats and the match join are both keyed by
# token — the phrase's words prune the index scan to two posting
# lists (at 100 TB: partition the index BY TOKEN so a phrase query
# reads only its words' partitions — the inverted-index layout);
# candidate adjacency is |posting(w1)| ⋈ |posting(w2)| on
# (doc_id, pos), never the corpus.
# --------------------------------------------------------------------------


def phrase_search(spark: SparkSession, sf: str) -> DataFrame:
    docs = load(spark, sf, "documents")
    idx = (docs.select("doc_id",
                       F.posexplode(_tokens("text"))
                        .alias("pos", "token"))
           .localCheckpoint(eager=False))
    nxt = idx.select("doc_id", (F.col("pos") - 1).alias("pos"),
                     F.col("token").alias("token2"))
    big = (idx.join(nxt, ["doc_id", "pos"])
           .groupBy("token", "token2").agg(F.count("*").alias("cnt")))
    top = (big.orderBy(F.col("cnt").desc(), "token", "token2").limit(1)
           .select(F.col("token").alias("w1"),
                   F.col("token2").alias("w2")))
    a = idx.join(F.broadcast(top), idx.token == F.col("w1")) \
           .select("doc_id", "pos", "w1", "w2")
    b = idx.select("doc_id", (F.col("pos") - 1).alias("pos"),
                   F.col("token").alias("tb"))
    hits = (a.join(b, ["doc_id", "pos"])
            .filter(F.col("tb") == F.col("w2"))
            .groupBy("doc_id", "w1", "w2")
            .agg(F.count("*").alias("n_matches")))
    return (hits.orderBy(F.col("n_matches").desc(), "doc_id").limit(10)
            .select("doc_id", "w1", "w2", "n_matches"))


PHRASE_SEARCH_SQL = r"""
WITH idx AS MATERIALIZED (
  -- parallel unnests zip in DuckDB; generate_subscripts supplies the
  -- 1-based position, shifted to posexplode's 0-based convention
  SELECT doc_id,
         CAST(generate_subscripts(
           regexp_split_to_array(trim(lower(text)), '\s+'), 1) - 1
           AS BIGINT) AS pos,
         unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS token
  FROM documents),
big AS (
  SELECT a.token AS token, b.token AS token2, count(*) AS cnt
  FROM idx a JOIN idx b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
  GROUP BY 1, 2),
top AS (
  SELECT token AS w1, token2 AS w2 FROM big
  ORDER BY cnt DESC, token, token2 LIMIT 1),
hits AS (
  SELECT a.doc_id, t.w1, t.w2, CAST(count(*) AS BIGINT) AS n_matches
  FROM idx a
  JOIN top t ON a.token = t.w1
  JOIN idx b ON b.doc_id = a.doc_id AND b.pos = a.pos + 1
            AND b.token = t.w2
  GROUP BY 1, 2, 3)
SELECT doc_id, w1, w2, n_matches FROM hits
ORDER BY n_matches DESC, doc_id LIMIT 10
"""


# --------------------------------------------------------------------------
# emb_covariance — dim×dim covariance of the embedding corpus by
# map-side outer-product partials: each vector expands to its dim²
# (i, j, x_i·x_j) cells via nested array transforms — pure map work,
# NO join — and the only shuffle is the partial-aggregated (i, j) cell
# grid (dim² rows, corpus-size-independent).  cov(i,j) =
# (Σx_i x_j − Σx_i·Σx_j/n)/n from the raw moments.
#
# Float parity: float32 inputs widen to double exactly; each product
# is one IEEE multiply (bit-identical across engines), rounded to 12
# and accumulated in DECIMAL(28,12) (order-independent); the closing
# moment formula runs once on the exact sums, emitted unrounded.
# Upper triangle only (i <= j) — the matrix is symmetric.
# --------------------------------------------------------------------------


def emb_covariance(spark: SparkSession, sf: str) -> DataFrame:
    e = load(spark, sf, "embeddings")
    cells = e.select(F.explode(F.expr(
        "flatten(transform(embedding, (x, i) ->"
        " transform(embedding, (y, j) ->"
        "  struct(i AS i, j AS j,"
        "         CAST(round(CAST(x AS DOUBLE) * CAST(y AS DOUBLE), 12)"
        "              AS DECIMAL(28,12)) AS p))))")).alias("c")) \
        .select("c.*").filter(F.col("i") <= F.col("j"))
    sums = (e.select(F.posexplode("embedding").alias("i", "x"))
            .groupBy("i")
            .agg(F.sum(F.round(F.col("x").cast("double"), 12)
                        .cast("decimal(28,12)")).alias("sx")))
    n = e.agg(F.count("*").cast("double").alias("n"))
    sxy = cells.groupBy("i", "j").agg(F.sum("p").alias("sxy"))
    si = sums.select(F.col("i"), F.col("sx").alias("sxi"))
    sj = sums.select(F.col("i").alias("j"), F.col("sx").alias("sxj"))
    return (sxy.join(F.broadcast(si), "i").join(F.broadcast(sj), "j")
            .crossJoin(F.broadcast(n))
            .select("i", "j",
                    ((F.col("sxy").cast("double")
                      - F.col("sxi").cast("double")
                        * F.col("sxj").cast("double") / F.col("n"))
                     / F.col("n")).alias("cov")))


EMB_COVARIANCE_SQL = """
WITH dims AS (SELECT CAST(range AS BIGINT) AS i FROM range(0, 64)),
cells AS (
  SELECT d1.i AS i, d2.i AS j,
         CAST(round(CAST(e.embedding[d1.i + 1] AS DOUBLE)
                    * CAST(e.embedding[d2.i + 1] AS DOUBLE), 12)
              AS DECIMAL(28,12)) AS p
  FROM embeddings e, dims d1, dims d2
  WHERE d1.i <= d2.i),
sxy AS (SELECT i, j, sum(p) AS sxy FROM cells GROUP BY 1, 2),
sums AS (
  SELECT d.i,
         sum(CAST(round(CAST(e.embedding[d.i + 1] AS DOUBLE), 12)
                  AS DECIMAL(28,12))) AS sx
  FROM embeddings e, dims d GROUP BY 1),
n AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM embeddings)
SELECT s.i, s.j,
       (CAST(s.sxy AS DOUBLE)
        - CAST(a.sx AS DOUBLE) * CAST(b.sx AS DOUBLE) / n.n) / n.n AS cov
FROM sxy s
JOIN sums a ON s.i = a.i
JOIN sums b ON s.j = b.i
CROSS JOIN n
"""


# --------------------------------------------------------------------------
# scd2_point_in_time — the feature-store / training-data join: each
# purchase event is enriched with the user's state AS OF the purchase
# time (the last non-purchase event type at or before it) — the
# point-in-time-correctness lookup that prevents feature leakage.
#
# Scale shape: NOT a range join against the interval table (per-user
# interval×fact products) — states and facts union into ONE per-user
# event stream and a single window's last_value(IGNORE NULLS) carries
# the state forward: one user-keyed shuffle, state O(1) per row,
# regardless of how many facts or state changes a user has.  Ties at
# equal t resolve by (is-state-first, event_id) on both engines, so a
# same-instant state change is visible to the same-instant purchase.
# Revenue accumulates in DECIMAL(28,12) per the float canon.
# --------------------------------------------------------------------------


def scd2_point_in_time(spark: SparkSession, sf: str) -> DataFrame:
    ev = load(spark, sf, "events").select(
        "user_id", F.col("ts").cast("long").alias("t"), "event_id",
        "event_type", "value")
    states = ev.filter(F.col("event_type") != "purchase").select(
        "user_id", "t", "event_id", F.lit(0).alias("kind"),
        F.col("event_type").alias("state"), F.lit(None).cast("double")
         .alias("value"))
    facts = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "t", "event_id", F.lit(1).alias("kind"),
        F.lit(None).cast("string").alias("state"), "value")
    w = (Window.partitionBy("user_id")
         .orderBy("t", "kind", "event_id")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    tl = (states.unionByName(facts)
          .withColumn("cur", F.last("state", ignorenulls=True).over(w)))
    return (tl.filter(F.col("kind") == 1)
            .groupBy(F.coalesce(F.col("cur"), F.lit("none"))
                      .alias("state_at_purchase"))
            .agg(F.count("*").alias("n_purchases"),
                 F.round(F.sum(F.col("value").cast("decimal(28,12)"))
                          .cast("double"), 2).alias("revenue")))


SCD2_POINT_IN_TIME_SQL = """
WITH ev AS (
  SELECT user_id,
         CAST(floor(epoch_us(ts)/1000000) AS BIGINT) AS t,
         event_id, event_type, value
  FROM events),
tl AS (
  SELECT user_id, t, event_id,
         CASE WHEN event_type <> 'purchase' THEN 0 ELSE 1 END AS kind,
         CASE WHEN event_type <> 'purchase' THEN event_type END AS state,
         CASE WHEN event_type = 'purchase' THEN value END AS value
  FROM ev),
c AS (
  SELECT *, last_value(state IGNORE NULLS) OVER (
              PARTITION BY user_id ORDER BY t, kind, event_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cur
  FROM tl)
SELECT coalesce(cur, 'none') AS state_at_purchase,
       count(*) AS n_purchases,
       CAST(round(CAST(sum(CAST(value AS DECIMAL(28,12))) AS DOUBLE), 2)
            AS DOUBLE) AS revenue
FROM c WHERE kind = 1 GROUP BY 1
"""


QUERIES = {
    "scd2_history": scd2_history,
    "phrase_search": phrase_search,
    "emb_covariance": emb_covariance,
    "scd2_point_in_time": scd2_point_in_time,
}

ORACLES = {
    "scd2_history": SCD2_HISTORY_SQL,
    "phrase_search": PHRASE_SEARCH_SQL,
    "emb_covariance": EMB_COVARIANCE_SQL,
    "scd2_point_in_time": SCD2_POINT_IN_TIME_SQL,
}
