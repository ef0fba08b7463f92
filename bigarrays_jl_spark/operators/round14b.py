"""Round-14 batch 2 (builder extension, SURVEY §2C):

``retrieval_mmr_rerank`` — Maximal Marginal Relevance diversity
re-ranking (Carbonell & Goldstein 1998): from the brute-cosine top-C
candidates for a probe vector, greedily select K results maximizing
``λ·rel(c) − (1−λ)·max_{s∈selected} sim(c, s)`` — the standard
post-retrieval step that stops a near-dup-saturated corpus from
returning K copies of the same document.

Spark-first decomposition: everything UNBOUNDED is JVM-side — the
corpus-wide relevance scan (dot/norm canon, broadcast probe), the
top-C candidate heap (TakeOrdered), and the C×C candidate sim matrix
(broadcast self-join of 50 rows, cosines rounded 6 by the JVM round
canon).  Only the greedy selection itself — an inherently SEQUENTIAL
argmax loop no relational operator expresses — runs in Python, over a
single cogrouped (candidates, sims) group BOUNDED at C rows + C²/2
sims by construction.  At 100 TB the corpus scan is the distributed
part and the re-rank stays O(C²) regardless of corpus size.

Float parity: rel and sims enter the greedy ALREADY rounded (6) by
the JVM; the loop's score arithmetic (0.7·rel − 0.3·maxsim) is the
identical double expression DuckDB's recursive CTE evaluates, ties
break by vec_id on both engines, and the final score rounds once at
the output.  The oracle is a genuine WITH RECURSIVE + LATERAL
argmax-per-step greedy — same selection, same order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bigarrays_jl_spark.checkpointing import materialize
from bigarrays_jl_spark.functions.expressions import dot, norm2
from bigarrays_jl_spark.operators.similarity import _DOT_SQL, _NORM2_SQL
from bigarrays_jl_spark.sources.tables import load

MMR_C = 50           # candidate pool (brute-cosine top-C)
MMR_K = 10           # re-ranked results
MMR_LAMBDA = 0.7     # relevance weight
MMR_MU = 0.3         # diversity weight — an EXPLICIT literal, not 1-λ:
                     # IEEE (1.0-0.7) differs from double(0.3) by 1 ulp,
                     # and both engines must multiply by the same double
MMR_PROBE = 0        # probe = vec_id 0's embedding (excluded from pool)


def _cosine(a, b):
    return F.round(dot(a, b) / (F.sqrt(norm2(a)) * F.sqrt(norm2(b))), 6)


def retrieval_mmr_rerank(spark: SparkSession, sf: str) -> DataFrame:
    e = load(spark, sf, "embeddings").select("vec_id", "embedding")
    q = (e.filter(F.col("vec_id") == MMR_PROBE)
         .select(F.col("embedding").alias("qe")))
    cand = materialize(                       # reused by sims + cogroup
        e.filter(F.col("vec_id") != MMR_PROBE)
        .crossJoin(F.broadcast(q))
        .select("vec_id", "embedding",
                _cosine(F.col("qe"), F.col("embedding")).alias("rel"))
        .orderBy(F.col("rel").desc(), "vec_id").limit(MMR_C),
        eager=False)
    a, b = cand.alias("a"), cand.alias("b")
    sims = (a.join(F.broadcast(b), F.col("a.vec_id") < F.col("b.vec_id"))
            .select(F.col("a.vec_id").alias("ia"),
                    F.col("b.vec_id").alias("ib"),
                    _cosine(F.col("a.embedding"),
                            F.col("b.embedding")).alias("s")))

    lam, mu = MMR_LAMBDA, MMR_MU

    def greedy(cand_pdf, sims_pdf):
        import pandas as pd
        if cand_pdf.empty:
            return pd.DataFrame({"rank": [], "vec_id": [], "mmr_score": []})
        rel = dict(zip(cand_pdf["vec_id"], cand_pdf["rel"]))
        sim: dict = {}
        for ia, ib, s in zip(sims_pdf["ia"], sims_pdf["ib"], sims_pdf["s"]):
            sim[(ia, ib)] = s
            sim[(ib, ia)] = s
        remaining = sorted(rel)               # ascending id = tie order
        selected: list = []
        rows = []
        for step in range(1, MMR_K + 1):
            if not remaining:
                break
            best_id, best_score = None, None
            for c in remaining:               # strict > keeps min-id tie
                ms = max((sim.get((c, p), 0.0) for p in selected),
                         default=0.0)
                score = lam * rel[c] - mu * ms
                if best_score is None or score > best_score:
                    best_id, best_score = c, score
            selected.append(best_id)
            remaining.remove(best_id)
            rows.append((step, best_id, best_score))
        return pd.DataFrame(rows, columns=["rank", "vec_id", "mmr_score"])

    g = F.lit(1).alias("g")
    out = (cand.select(g, "vec_id", "rel").groupBy("g")
           .cogroup(sims.select(g, "ia", "ib", "s").groupBy("g"))
           .applyInPandas(
               greedy, schema="rank long, vec_id long, mmr_score double"))
    # mmr_score stays UNROUNDED (the q50 exact-tie canon): it is
    # 0.7·rel − 0.3·maxsim over already-6-rounded inputs, which lands
    # near .5 ties at the 7th decimal BY CONSTRUCTION — rounding it
    # would compare rounding modes, not values.  The raw double is
    # bit-identical on both engines (same expression, same inputs).
    return out.select("rank", "vec_id", "mmr_score")


_COS_SQL = ("round(" + _DOT_SQL.format(a="{a}", b="{b}") + " / (sqrt("
            + _NORM2_SQL.format(a="{a}") + ") * sqrt("
            + _NORM2_SQL.format(a="{b}") + ")), 6)")

RETRIEVAL_MMR_RERANK_SQL = f"""
WITH RECURSIVE
q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = {MMR_PROBE}),
cand AS (
  SELECT vec_id, embedding,
         {_COS_SQL.format(a='qe', b='embedding')} AS rel
  FROM embeddings, q WHERE vec_id <> {MMR_PROBE}
  ORDER BY rel DESC, vec_id LIMIT {MMR_C}),
sims AS (
  SELECT a.vec_id AS ia, b.vec_id AS ib,
         {_COS_SQL.format(a='a.embedding', b='b.embedding')} AS s
  FROM cand a JOIN cand b ON a.vec_id < b.vec_id),
sel(step, picked, pick_id, pick_score) AS (
  SELECT CAST(1 AS BIGINT), [c.vec_id], c.vec_id,
         {MMR_LAMBDA}e0 * c.rel
  FROM (SELECT vec_id, rel FROM cand
        ORDER BY rel DESC, vec_id LIMIT 1) c
  UNION ALL
  SELECT sel.step + 1, list_append(sel.picked, nxt.vec_id),
         nxt.vec_id, nxt.score
  FROM sel, LATERAL (
    SELECT c.vec_id,
           {MMR_LAMBDA}e0 * c.rel - {MMR_MU}e0
             * coalesce((SELECT max(s.s) FROM sims s
                         WHERE (s.ia = c.vec_id
                                AND list_contains(sel.picked, s.ib))
                            OR (s.ib = c.vec_id
                                AND list_contains(sel.picked, s.ia))),
                        0e0) AS score
    FROM cand c
    WHERE NOT list_contains(sel.picked, c.vec_id)
    ORDER BY score DESC, c.vec_id LIMIT 1) nxt
  WHERE sel.step < {MMR_K})
SELECT step AS rank, pick_id AS vec_id, pick_score AS mmr_score
FROM sel
"""


QUERIES = {
    "retrieval_mmr_rerank": retrieval_mmr_rerank,
}

ORACLES = {
    "retrieval_mmr_rerank": RETRIEVAL_MMR_RERANK_SQL,
}


# --------------------------------------------------------------------------
# ann_recall_audit — recall@k of the IVF index against the brute-force
# ground truth, per nprobe setting.  THE go/no-go metric for shipping
# an ANN index: quantization loses neighbors at cell boundaries, and
# this measures exactly how many, at the demo nlist, for nprobe 1 and 2
# (the standard recall/cost knob).  All recall math is exact-integer:
# per-query hits are counts, mean recall is one division of integer
# sums (never an order-dependent average of doubles), min recall is a
# division of the integer minimum.  Composes the registry's own ANN
# canons — brute, IVF, IVF-nprobe2 — so the audit can never drift from
# the indexes it grades; cost is three broadcast-probed scans plus
# query-count-sized joins.
# --------------------------------------------------------------------------

from bigarrays_jl_spark.operators.similarity import (ANN_COSINE_TOPK_SQL,
                                                     ANN_IVF_NPROBE2_SQL,
                                                     ANN_IVF_TOPK_SQL,
                                                     TOP_K, ann_cosine_topk,
                                                     ann_ivf_nprobe2_topk,
                                                     ann_ivf_topk)


def ann_recall_audit(spark: SparkSession, sf: str) -> DataFrame:
    from pyspark.sql import Window as W
    from bigarrays_jl_spark.operators.similarity import (_cosine,
                                                         _ivf_routed)
    brute = materialize(
        ann_cosine_topk(spark, sf).select("qid", "vec_id"), eager=False)
    qids = brute.select("qid").distinct()
    # ONE routing fit + ONE cell scan at max nprobe, probe rank kept
    # (the round16 ivfpq-audit trick, guide §2.4): a vector lives in
    # exactly one cell and its cosine depends only on (qid, vec_id),
    # so filtering r <= 1 reproduces the nprobe-1 candidate set exactly
    # — the old shape ran the centroid fit, corpus scan, rank window
    # and brute semi-join TWICE.  Filtering preserves the (cosine desc,
    # vec_id) order, so each leg's row_number ≡ the running count of
    # its rows; both counts ride one Window operator, and brute
    # membership is attached once as a 0/1 flag.
    e, routed = _ivf_routed(spark, sf, nprobe=2, keep_rank=True)
    scored = (e.join(F.broadcast(routed), e["label"] == routed["probe"])
               .filter(F.col("vec_id") != F.col("qid"))
               .withColumn("cosine", _cosine(F.col("qe"), F.col("embedding")))
               .select("qid", "vec_id", "r", "cosine"))
    w = (W.partitionBy("qid").orderBy(F.col("cosine").desc(),
                                      F.col("vec_id"))
         .rowsBetween(W.unboundedPreceding, 0))
    scored = (scored
              .withColumn("c1", F.sum(F.when(F.col("r") <= 1, 1)
                                      .otherwise(0)).over(w))
              .withColumn("c2", F.sum(F.lit(1)).over(w)))
    ann = materialize(
        scored.join(brute.withColumn("bhit", F.lit(1)),
                    ["qid", "vec_id"], "left"), eager=False)

    def leg(nprobe: int, variant: str) -> DataFrame:
        cond = ((F.col("r") <= 1) & (F.col("c1") <= TOP_K) if nprobe == 1
                else F.col("c2") <= TOP_K)
        hits = (ann.filter(cond).groupBy("qid")
                .agg(F.sum(F.coalesce("bhit", F.lit(0))).alias("h")))
        per = (qids.join(hits, "qid", "left")
               .select("qid", F.coalesce("h", F.lit(0)).alias("h")))
        return (per.agg(F.count("*").cast("bigint").alias("n_queries"),
                        F.sum("h").cast("bigint").alias("sum_hits"),
                        F.min("h").cast("bigint").alias("min_hits"))
                .select(F.lit(variant).alias("variant"), "n_queries",
                        "sum_hits",
                        (F.col("sum_hits").cast("double")
                         / (F.col("n_queries") * TOP_K)).alias("mean_recall"),
                        (F.col("min_hits").cast("double") / TOP_K)
                        .alias("min_recall")))

    return (leg(1, "ivf_nprobe1").unionByName(leg(2, "ivf_nprobe2")))


def _recall_leg_sql(approx_sql: str, variant: str) -> str:
    return f"""
  SELECT '{variant}' AS variant,
         CAST(count(*) AS BIGINT) AS n_queries,
         CAST(sum(h) AS BIGINT) AS sum_hits,
         CAST(sum(h) AS DOUBLE) / (count(*) * {TOP_K}) AS mean_recall,
         CAST(min(h) AS DOUBLE) / {TOP_K} AS min_recall
  FROM (
    SELECT q.qid,
           coalesce((SELECT count(*) FROM ({approx_sql}) a
                     WHERE a.qid = q.qid
                       AND EXISTS (SELECT 1 FROM brute b
                                   WHERE b.qid = a.qid
                                     AND b.vec_id = a.vec_id)), 0) AS h
    FROM (SELECT DISTINCT qid FROM brute) q)"""


ANN_RECALL_AUDIT_SQL = f"""
WITH brute AS (SELECT qid, vec_id FROM ({ANN_COSINE_TOPK_SQL}) bb)
{_recall_leg_sql(ANN_IVF_TOPK_SQL, 'ivf_nprobe1')}
UNION ALL
{_recall_leg_sql(ANN_IVF_NPROBE2_SQL, 'ivf_nprobe2')}
"""


QUERIES["ann_recall_audit"] = ann_recall_audit
ORACLES["ann_recall_audit"] = ANN_RECALL_AUDIT_SQL
