"""Round-14 builder extensions (SURVEY §2C) — pipeline QA readouts:

- ``quality_filter_funnel`` — staged retention through the Gopher rule
  cascade (word count → mean word length → alphabetic fraction →
  stop-word hits): per stage, how many docs enter, how many survive,
  and the retention fraction.  The go/no-go scorecard every filtering
  pipeline reports before committing a corpus; built on the exact
  ``_gopher_metrics`` canon (operators/extensions.py) so the funnel
  can never disagree with the gate it reports on.
- ``dedup_audit_pr`` — precision/recall of the MinHash est-Jaccard
  screen at the 0.5 threshold against the exact candidate-verified
  n-gram Jaccard (the repo's two dedup canons, dedup.py): one row of
  (n_predicted, n_truth, n_hit, prec, rec).  The screen-quality audit
  that decides whether LSH banding parameters are production-ready;
  recall here is *within the LSH candidate set* — end-to-end banding
  recall vs an all-pairs oracle is graded separately in
  tests/test_pipeline_ops.py.
- ``emb_outlier_zscore`` — embedding hygiene screen: per-dimension
  corpus mean/variance, then each vector's summed squared z-score,
  top-20 most anomalous vectors.  The standard pre-ANN sanity pass
  that catches corrupt/degenerate embeddings before they poison an
  IVF index.  Float parity via the fixed-point canon
  (emb_covariance, round10c.py): values quantize to tie-free int64 at
  1e-6, all sums are exact integers, and the closing mean/var/score
  expressions are the identical double formula on both engines, with
  the per-vector sum an ORDERED index fold (matches DuckDB list_sum).

Scale shape: the funnel is one map-side flag pass folding to a single
counter row (no shuffle wider than the partial agg); the audit joins
two pair tables that are candidate-sized (never corpus²) and folds to
bounded scalar counts; the outlier screen shuffles n×64 quantized
cells onto 64 keys with map-side partials, broadcasts the 64-entry
stats row, and TakeOrdered(20)s the scores — nothing is driver-side
or corpus².
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bigarrays_jl_spark.operators.dedup import (_AUG_SQL, _MINHASH_CTES_SQL,
                                                _NGRAM_VERIFY_CTES_SQL,
                                                _SHINGLE_SQL, N_HASHES,
                                                dedup_minhash_pairs,
                                                dedup_ngram_jaccard)
from bigarrays_jl_spark.operators.extensions import (TEXT_GOPHER_RULES_SQL,
                                                     _gopher_metrics)
from bigarrays_jl_spark.sources.tables import fan_out, load

AUDIT_T = 0.5          # est-Jaccard screen threshold == the truth cut

FUNNEL_STAGES = ("word_count", "mean_word_len", "alpha_frac", "stopwords")


def quality_filter_funnel(spark: SparkSession, sf: str) -> DataFrame:
    d = fan_out(spark, load(spark, sf, "documents"))
    g = _gopher_metrics(F.col("text"))
    # cumulative survival flags, in the cascade's fixed order; when()
    # maps NULL metric flags (empty docs) to 0 on both engines
    c1 = g["ok_words"]
    c2 = c1 & g["ok_word_len"]
    c3 = c2 & g["ok_alpha"]
    c4 = g["gopher_pass"]
    s = d.agg(F.count("*").cast("bigint").alias("n"),
              *[F.sum(F.when(c, 1).otherwise(0)).cast("bigint").alias(k)
                for k, c in (("s1", c1), ("s2", c2), ("s3", c3),
                             ("s4", c4))])
    stages = [
        F.struct(F.lit(i + 1).cast("bigint").alias("stage"),
                 F.lit(FUNNEL_STAGES[i]).alias("rule"),
                 F.col(n_in).alias("n_in"), F.col(n_out).alias("n_out"))
        for i, (n_in, n_out) in enumerate(
            (("n", "s1"), ("s1", "s2"), ("s2", "s3"), ("s3", "s4")))]
    return (s.select(F.explode(F.array(*stages)).alias("r"))
            .select("r.stage", "r.rule", "r.n_in", "r.n_out",
                    F.when(F.col("r.n_in") > 0,
                           F.round(F.col("r.n_out").cast("double")
                                   / F.col("r.n_in"), 6))
                    .alias("retained_frac")))


QUALITY_FILTER_FUNNEL_SQL = f"""
WITH g AS ({TEXT_GOPHER_RULES_SQL}),
s AS (SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CASE WHEN ok_words THEN 1 ELSE 0 END) AS BIGINT)
               AS s1,
             CAST(sum(CASE WHEN ok_words AND ok_word_len
                      THEN 1 ELSE 0 END) AS BIGINT) AS s2,
             CAST(sum(CASE WHEN ok_words AND ok_word_len AND ok_alpha
                      THEN 1 ELSE 0 END) AS BIGINT) AS s3,
             CAST(sum(CASE WHEN gopher_pass THEN 1 ELSE 0 END) AS BIGINT)
               AS s4
      FROM g),
f AS (
  SELECT CAST(1 AS BIGINT) AS stage, 'word_count' AS rule,
         n AS n_in, s1 AS n_out FROM s
  UNION ALL SELECT 2, 'mean_word_len', s1, s2 FROM s
  UNION ALL SELECT 3, 'alpha_frac', s2, s3 FROM s
  UNION ALL SELECT 4, 'stopwords', s3, s4 FROM s)
SELECT stage, rule, n_in, n_out,
       CASE WHEN n_in > 0
            THEN round(CAST(n_out AS DOUBLE) / n_in, 6) END
         AS retained_frac
FROM f
"""


def dedup_audit_pr(spark: SparkSession, sf: str) -> DataFrame:
    from bigarrays_jl_spark.checkpointing import materialize
    from bigarrays_jl_spark.operators.dedup import _bands
    bands = _bands(spark, sf)      # ONE signature table for both legs
    # pred and truth are each consumed twice (their own count + the hit
    # semi-join) — without the checkpoints the band self-join and the
    # exact n-gram verify each run twice end-to-end (the shared bands
    # table only deduped the signature build, not the legs themselves)
    pred = materialize(
        dedup_minhash_pairs(spark, sf, bands=bands)
        .filter(F.col("est_jaccard") >= AUDIT_T)
        .select("doc_a", "doc_b"), eager=False)
    truth = materialize(
        dedup_ngram_jaccard(spark, sf, bands=bands).select("doc_a",
                                                           "doc_b"),
        eager=False)
    hit = pred.join(truth, ["doc_a", "doc_b"], "left_semi")
    np_ = pred.agg(F.count("*").cast("bigint").alias("n_predicted"))
    nt = truth.agg(F.count("*").cast("bigint").alias("n_truth"))
    nh = hit.agg(F.count("*").cast("bigint").alias("n_hit"))
    return (np_.crossJoin(F.broadcast(nt)).crossJoin(F.broadcast(nh))
            .select("n_predicted", "n_truth", "n_hit",
                    F.when(F.col("n_predicted") > 0,
                           F.round(F.col("n_hit").cast("double")
                                   / F.col("n_predicted"), 6))
                    .alias("prec_at_t"),
                    F.when(F.col("n_truth") > 0,
                           F.round(F.col("n_hit").cast("double")
                                   / F.col("n_truth"), 6))
                    .alias("rec_at_t")))


DEDUP_AUDIT_PR_SQL = f"""
WITH aug AS ({_AUG_SQL}),
{_SHINGLE_SQL},
{_MINHASH_CTES_SQL},
{_NGRAM_VERIFY_CTES_SQL},
est AS (
  SELECT doc_a, doc_b,
         round(count(*) / {float(N_HASHES)}, 4) AS est_jaccard
  FROM cand
  JOIN sig sa ON sa.doc_id = doc_a
  JOIN sig sb ON sb.doc_id = doc_b AND sa.k = sb.k AND sa.mh = sb.mh
  GROUP BY doc_a, doc_b),
pred AS (SELECT doc_a, doc_b FROM est WHERE est_jaccard >= {AUDIT_T}),
tr AS (SELECT doc_a, doc_b FROM pairs),
hit AS (SELECT doc_a, doc_b FROM pred INTERSECT SELECT doc_a, doc_b FROM tr)
SELECT CAST((SELECT count(*) FROM pred) AS BIGINT) AS n_predicted,
       CAST((SELECT count(*) FROM tr) AS BIGINT) AS n_truth,
       CAST((SELECT count(*) FROM hit) AS BIGINT) AS n_hit,
       CASE WHEN (SELECT count(*) FROM pred) > 0 THEN
         round(CAST((SELECT count(*) FROM hit) AS DOUBLE)
               / (SELECT count(*) FROM pred), 6) END AS prec_at_t,
       CASE WHEN (SELECT count(*) FROM tr) > 0 THEN
         round(CAST((SELECT count(*) FROM hit) AS DOUBLE)
               / (SELECT count(*) FROM tr), 6) END AS rec_at_t
"""


EMB_DIM = 64
EMB_Q = 1_000_000
OUTLIER_TOPK = 20


def emb_outlier_zscore(spark: SparkSession, sf: str) -> DataFrame:
    e = load(spark, sf, "embeddings").select("vec_id", "embedding")
    q = (e.select("vec_id", F.posexplode("embedding").alias("d", "x"))
         .select("d", F.round(F.col("x").cast("double") * EMB_Q, 0)
                 .cast("bigint").alias("xi")))
    st = q.groupBy("d").agg(F.sum("xi").alias("sx"),
                            F.sum(F.col("xi") * F.col("xi")).alias("sxx"),
                            F.count("*").cast("double").alias("n"))
    stat = st.select(
        "d", (F.col("sx").cast("double") / F.col("n")).alias("mu"),
        ((F.col("sxx").cast("double")
          - F.col("sx").cast("double") * F.col("sx").cast("double")
          / F.col("n")) / F.col("n")).alias("var"))
    # 64-entry stats arrays in dim order, broadcast onto every vector;
    # the per-vector sum is an ORDERED fold over d = 0..63 so the
    # double addition order is pinned (and matches DuckDB's list_sum)
    arrs = (stat.agg(F.array_sort(F.collect_list(
                F.struct("d", "mu", "var"))).alias("s"))
            .select(F.transform("s", lambda r: r["mu"]).alias("mus"),
                    F.transform("s", lambda r: r["var"]).alias("vars")))

    def term(acc, i):
        x = F.element_at(F.col("embedding"), i + 1).cast("double")
        zi = F.round(x * EMB_Q, 0) - F.element_at(F.col("mus"), i + 1)
        v = F.element_at(F.col("vars"), i + 1)
        return acc + F.when(v > 0, zi * zi / v).otherwise(F.lit(0.0))

    score = F.round(F.aggregate(
        F.sequence(F.lit(0), F.lit(EMB_DIM - 1)), F.lit(0.0), term), 4)
    return (e.crossJoin(F.broadcast(arrs))
            .select("vec_id", score.alias("score"))
            .orderBy(F.col("score").desc(), "vec_id")
            .limit(OUTLIER_TOPK))


EMB_OUTLIER_ZSCORE_SQL = f"""
WITH dims AS (SELECT CAST(range AS BIGINT) AS i FROM range(0, {EMB_DIM})),
q AS (
  SELECT e.vec_id, d.i,
         CAST(round(CAST(e.embedding[d.i + 1] AS DOUBLE) * {EMB_Q})
              AS BIGINT) AS xi
  FROM embeddings e, dims d),
st AS (SELECT i, CAST(sum(xi) AS BIGINT) AS sx,
              CAST(sum(xi * xi) AS BIGINT) AS sxx,
              CAST(count(*) AS DOUBLE) AS n
       FROM q GROUP BY i),
stat AS (SELECT i, CAST(sx AS DOUBLE) / n AS mu,
                (CAST(sxx AS DOUBLE)
                 - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) / n) / n AS var
         FROM st),
arrs AS (SELECT list(mu ORDER BY i) AS m, list(var ORDER BY i) AS v
         FROM stat)
SELECT vec_id,
       round(list_sum(list_transform(range(1, {EMB_DIM + 1}), k ->
         CASE WHEN v[k] > 0 THEN
           (round(CAST(embedding[k] AS DOUBLE) * {EMB_Q}) - m[k])
           * (round(CAST(embedding[k] AS DOUBLE) * {EMB_Q}) - m[k]) / v[k]
         ELSE 0.0 END)), 4) AS score
FROM embeddings, arrs
ORDER BY score DESC, vec_id LIMIT {OUTLIER_TOPK}
"""


QUERIES = {
    "quality_filter_funnel": quality_filter_funnel,
    "dedup_audit_pr": dedup_audit_pr,
    "emb_outlier_zscore": emb_outlier_zscore,
}

ORACLES = {
    "quality_filter_funnel": QUALITY_FILTER_FUNNEL_SQL,
    "dedup_audit_pr": DEDUP_AUDIT_PR_SQL,
    "emb_outlier_zscore": EMB_OUTLIER_ZSCORE_SQL,
}
