"""Similarity search over the embeddings table (SURVEY §2B).

Brute-force cosine top-k is the correctness baseline; the LSH-bucketed
variant is the 100 TB scale path (bucket join instead of cross join).
All scoring stays in built-in higher-order functions (`zip_with` +
`aggregate` fold) — JVM-side, no Python in the hot path.  Fold order is
list order on both engines, so doubles match the DuckDB oracle exactly.

Scale notes: the brute-force path broadcasts the (small) query side and
scans the corpus once — O(corpus × queries) with no shuffle; per-query
top-k via window on qid shuffles only (queries × corpus) score rows,
which AQE coalesces.  The LSH path is a multi-band OR-construction with
2**BAND_BITS buckets per band — bucket count is parametric in the corpus
size (grow BAND_BITS with log2 n), so in-bucket pair cost stays
O(occupancy²) per bucket instead of decaying toward O(n²/constant).
"""

from __future__ import annotations

import math
import random

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from bigarrays_jl_spark.functions import cosine as _cosine_fn
from bigarrays_jl_spark.functions import dot as _dot
from bigarrays_jl_spark.functions import norm2 as _norm2
from bigarrays_jl_spark.sources.tables import fan_out, load

N_QUERIES = 10       # vec_id < 10 are the query vectors
TOP_K = 5
COS_THRESHOLD = 0.3  # near-dup cosine threshold (corpus is near-random)

# -- parametric LSH geometry -------------------------------------------------
# Multi-band OR-construction (same shape as dedup_minhash_pairs): a pair
# is a candidate when ANY band's BAND_BITS-bit signature matches.  The
# bucket space is 2**BAND_BITS *per band* — parametric, not a fixed
# 256-bucket ceiling: at corpus size n, set BAND_BITS ≈ log2(n) - log2
# (target bucket occupancy) so the in-bucket pair join stays
# O(n × occupancy × bands), never O(n²/constant).  Recall for genuinely
# near pairs comes from the OR across bands: p_pair = 1-(1-p^BAND_BITS)^
# N_BANDS with p = 1 - θ/π per hyperplane.
N_BANDS = 4
TARGET_BUCKET_OCCUPANCY = 0.5       # expected vectors per band-bucket


def band_bits_for(n_vectors: int,
                  target_occupancy: float = TARGET_BUCKET_OCCUPANCY,
                  min_bits: int = 8, max_bits: int = 40) -> int:
    """Band signature width for a corpus of ``n_vectors``: the smallest
    ``bits`` with expected bucket occupancy ``n / 2**bits`` at or below
    ``target_occupancy`` — i.e. ``ceil(log2(n / occupancy))``, clamped.

    This is the sizing rule the module docstring states ("grow
    BAND_BITS with log2 n") enacted as code: because occupancy stays
    O(1), the in-bucket pair join stays O(n × occupancy × bands) at ANY
    corpus size — never O(n²/constant).  ``max_bits`` bounds the
    signature width (and N_PLANES projection cost) at planet-scale
    corpora; ``min_bits`` keeps tiny corpora from degenerating into a
    handful of mega-buckets.
    """
    if n_vectors <= 0:
        return min_bits
    bits = math.ceil(math.log2(max(n_vectors / target_occupancy, 2.0)))
    return max(min_bits, min(max_bits, bits))


# 12 == band_bits_for(2000), the sf0.1 (largest graded) embedding corpus
# — pinned via the function so the testdata signatures/oracle constants
# don't move while production corpora derive their own width
BAND_BITS = band_bits_for(2000)
assert BAND_BITS == 12, "testdata LSH geometry moved — oracle constants depend on 12"
N_PLANES = N_BANDS * BAND_BITS
# Deterministic signed projections: plane j is the sign of
# dot(embedding, SIGNS[j]) with SIGNS a seeded i.i.d. ±1 matrix — the
# textbook sign-LSH family — embedded as plan-time literals so both
# engines evaluate the exact same planes.  (An earlier popcount-parity
# construction keyed the sign off the 6-bit dimension INDEX, so only 64
# distinct plane functions existed regardless of N_PLANES — a silent cap
# far below the advertised bucket space.)  SIGN_DIM covers the testdata
# dimensionality; longer embeddings project on their first SIGN_DIM
# coordinates, shorter ones use the dims they have — identically on
# both engines, since both forms iterate min(dim, SIGN_DIM) indices.
SIGN_DIM = 64
_rng = random.Random(20260813)
SIGNS = [[1.0 if _rng.random() < 0.5 else -1.0 for _ in range(SIGN_DIM)]
         for _ in range(N_PLANES)]


def _signs_sql(open_b: str, close_b: str, suffix: str = "") -> str:
    row = lambda r: open_b + ", ".join(  # noqa: E731
        f"{v:.1f}{suffix}" for v in r) + close_b
    return open_b + ", ".join(row(r) for r in SIGNS) + close_b


# one nested higher-order expression (not N_PLANES unrolled folds) keeps
# codegen narrow; evaluation stays JVM-side
_BITS_SPARK = f"""
transform(sequence(0, {N_PLANES - 1}), j ->
  CASE WHEN aggregate(
      transform(sequence(1, least(size(embedding), {SIGN_DIM})),
        i -> CAST(element_at(embedding, i) AS DOUBLE)
             * element_at(element_at({_signs_sql("array(", ")", "D")}, j + 1), i)),
      CAST(0 AS DOUBLE), (acc, x) -> acc + x) > 0D
  THEN '1' ELSE '0' END)
"""

# DuckDB side: the sign matrix materializes ONCE as a VALUES CTE (a
# literal list inside a lambda would be re-constructed per element —
# measured at seconds per row), and the bit vector is a string built by
# an ordered string_agg over the per-plane cross join.
_SIGNS_CTE = "signs(j, s) AS (VALUES " + ", ".join(
    f"({j}, [" + ", ".join(f"{v:.1f}" for v in row) + "])"
    for j, row in enumerate(SIGNS)) + ")"

_BITS_CTE = f"""
b AS (
  SELECT vec_id, embedding,
         string_agg(CASE WHEN list_sum(list_transform(
             range(1, least(len(embedding), {SIGN_DIM}) + 1),
             i -> CAST(embedding[i] AS DOUBLE) * s[i])) > 0
           THEN '1' ELSE '0' END, '' ORDER BY j) AS bits
  FROM embeddings, signs
  GROUP BY vec_id, embedding)
"""


def _band_key(b: int):
    """Spark column: band ``b``'s BAND_BITS-bit bucket signature."""
    return F.array_join(F.slice("bits", b * BAND_BITS + 1, BAND_BITS), "")


def _band_key_sql(b: int) -> str:
    return f"substr(bits, {b * BAND_BITS + 1}, {BAND_BITS})"


_DOT_SQL = ("list_sum(list_transform(range(1, len({a}) + 1), "
            "i -> CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE)))")
_NORM2_SQL = "list_sum(list_transform({a}, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))"


# --------------------------------------------------------------------------
# brute-force cosine top-k per query vector
# --------------------------------------------------------------------------

def ann_cosine_topk(spark: SparkSession, sf: str) -> DataFrame:
    e = load(spark, sf, "embeddings")
    q = (e.filter(F.col("vec_id") < N_QUERIES)
          .select(F.col("vec_id").alias("qid"), F.col("embedding").alias("qe")))
    # fan_out: the per-(vector, query) cosine below is CPU-heavy map
    # work (N_QUERIES 64-dim dots per corpus row) and the local source
    # is ONE split — without this the whole brute-force scoring runs
    # single-threaded (§2.5 input skew; same shape as
    # cross_source_leakage's shingling)
    corpus = fan_out(spark, e).select("vec_id", "embedding")
    scored = (corpus.crossJoin(F.broadcast(q))
              .filter(F.col("vec_id") != F.col("qid"))
              .withColumn("cosine", F.round(
                  _dot(F.col("qe"), F.col("embedding"))
                  / (F.sqrt(_norm2(F.col("qe"))) * F.sqrt(_norm2(F.col("embedding")))),
                  6)))
    w = W.partitionBy("qid").orderBy(F.col("cosine").desc(), F.col("vec_id"))
    return (scored.withColumn("rank", F.row_number().over(w))
                  .filter(F.col("rank") <= TOP_K)
                  .select("qid", "vec_id", "cosine", "rank"))


ANN_COSINE_TOPK_SQL = f"""
WITH q AS (SELECT vec_id AS qid, embedding AS qe FROM embeddings
           WHERE vec_id < {N_QUERIES}),
scored AS (
  SELECT qid, vec_id,
         round({_DOT_SQL.format(a='qe', b='embedding')}
               / (sqrt({_NORM2_SQL.format(a='qe')})
                  * sqrt({_NORM2_SQL.format(a='embedding')})), 6) AS cosine
  FROM embeddings, q WHERE vec_id <> qid),
ranked AS (
  SELECT qid, vec_id, cosine,
         row_number() OVER (PARTITION BY qid ORDER BY cosine DESC, vec_id) AS rank
  FROM scored)
SELECT qid, vec_id, cosine, CAST(rank AS INT) AS rank FROM ranked
WHERE rank <= {TOP_K}
"""


# --------------------------------------------------------------------------
# LSH-bucketed near-neighbor pairs: N_PLANES signed-projection bits →
# N_BANDS bucket signatures → band-bucket self-join → in-bucket exact
# cosine — the scale path for pairwise similarity
# --------------------------------------------------------------------------

def sim_lsh_buckets(spark: SparkSession, sf: str) -> DataFrame:
    """Band-0 bucket histogram — the occupancy diagnostic that sizes
    BAND_BITS for a given corpus (target: occupancy stays O(1))."""
    e = (fan_out(spark, load(spark, sf, "embeddings"))
         .withColumn("bits", F.expr(_BITS_SPARK)))
    return (e.select(_band_key(0).alias("bucket"), "vec_id")
             .groupBy("bucket")
             .agg(F.count("*").alias("n_vectors"),
                  F.min("vec_id").alias("min_vec_id")))


SIM_LSH_BUCKETS_SQL = f"""
WITH {_SIGNS_CTE},
{_BITS_CTE}
SELECT {_band_key_sql(0)} AS bucket, count(*) AS n_vectors,
       min(vec_id) AS min_vec_id
FROM b GROUP BY 1
"""


def sim_lsh_pairs(spark: SparkSession, sf: str) -> DataFrame:
    # Each vector explodes to N_BANDS (band, bkey) rows — embeddings ride
    # along (256 B/row, the minhash carry pattern) so the verify step
    # needs no extra join against the corpus.  The join key is
    # (band, bkey): in-bucket cost is O(occupancy²) per bucket with
    # 2**BAND_BITS buckets per band, and groupBy(vec_a, vec_b) collapses
    # pairs that collide in several bands before the exact-cosine verify.
    e = (fan_out(spark, load(spark, sf, "embeddings"))
         .withColumn("bits", F.expr(_BITS_SPARK)))
    keys = (e.select("vec_id", "embedding", F.explode(F.array(*[
                F.struct(F.lit(b).alias("band"), _band_key(b).alias("bkey"))
                for b in range(N_BANDS)])).alias("bk"))
             .select("vec_id", "embedding",
                     F.col("bk.band").alias("band"),
                     F.col("bk.bkey").alias("bkey"))
            # materialize the bucket-key table once (lazy): both self-join
            # sides consume it, and the 48-plane sign projection is the
            # dominant map cost — same signature-table pattern and
            # fault-tolerance caveat as dedup._bands
            .localCheckpoint(eager=False))
    a = keys.select(F.col("vec_id").alias("vec_a"),
                    F.col("embedding").alias("ea"), "band", "bkey")
    b = keys.select(F.col("vec_id").alias("vec_b"),
                    F.col("embedding").alias("eb"), "band", "bkey")
    cand = (a.join(b, ["band", "bkey"])
             .filter(F.col("vec_a") < F.col("vec_b"))
             .groupBy("vec_a", "vec_b")
             .agg(F.first("ea").alias("ea"), F.first("eb").alias("eb")))
    return (cand.withColumn("cosine", F.round(
                _dot(F.col("ea"), F.col("eb"))
                / (F.sqrt(_norm2(F.col("ea"))) * F.sqrt(_norm2(F.col("eb")))), 6))
            .filter(F.col("cosine") >= COS_THRESHOLD)
            .select("vec_a", "vec_b", "cosine"))


_KEYS_UNION_SQL = "\n  UNION ALL\n".join(
    f"  SELECT vec_id, embedding, {b} AS band, {_band_key_sql(b)} AS bkey FROM b"
    for b in range(N_BANDS))

SIM_LSH_PAIRS_SQL = f"""
WITH {_SIGNS_CTE},
{_BITS_CTE},
keys AS (
{_KEYS_UNION_SQL}
),
cand AS (SELECT DISTINCT a.vec_id AS vec_a, b2.vec_id AS vec_b
         FROM keys a JOIN keys b2
           ON a.band = b2.band AND a.bkey = b2.bkey AND a.vec_id < b2.vec_id),
scored AS (
  SELECT vec_a, vec_b,
         round({_DOT_SQL.format(a='ea.embedding', b='eb.embedding')}
               / (sqrt({_NORM2_SQL.format(a='ea.embedding')})
                  * sqrt({_NORM2_SQL.format(a='eb.embedding')})), 6) AS cosine
  FROM cand
  JOIN embeddings ea ON ea.vec_id = vec_a
  JOIN embeddings eb ON eb.vec_id = vec_b)
SELECT vec_a, vec_b, cosine FROM scored WHERE cosine >= {COS_THRESHOLD}
"""


# --------------------------------------------------------------------------
# IVF top-k: the scale path for query-time ANN.  The label column plays
# the coarse quantizer's cell assignment (at 100 TB the cells come from a
# k-means fit, but the search machinery is identical): build per-cell
# centroids, route each query to its nearest centroid (nprobe=1), and
# scan ONLY that cell — a broadcast-pruned join instead of the
# brute-force full-corpus scan in ann_cosine_topk.
#
# RECALL DEPENDS ON THE PARTITION QUALITY, and the testdata's labels are
# semantically arbitrary — measured recall@10 vs the brute-force truth
# at sf0.001 (tests/test_ann_recall.py pins these):
#   ann_ivf_topk (label cells, nprobe=1)   0.14   <- partition is noise
#   ann_ivf_nprobe2_topk                   0.30   <- linear in nprobe
#   ann_ivf_kmeans_topk (fitted cells)     0.76   <- geometry helps
#   ann_sq8_topk (full scan, 8-bit codes)  1.00   <- no routing loss
# The label-cell variants exist to exercise the routed-search machinery
# against an oracle; ann_ivf_kmeans_topk is the production shape.
# --------------------------------------------------------------------------

_cosine = _cosine_fn


def _ivf_routed(spark: SparkSession, sf: str, nprobe: int,
                keep_rank: bool = False):
    """(corpus, routed) where routed holds each query's ``nprobe``
    nearest coarse cells — the shared IVF search front-end.

    ``keep_rank=True`` also returns the probe rank ``r`` (1 = nearest
    cell), letting one max-nprobe scan serve every smaller-nprobe leg of
    a recall sweep: a vector belongs to exactly one cell, so filtering
    the scored candidates on ``r <= nprobe`` reproduces the smaller
    leg's candidate set exactly (round16.ann_ivfpq_recall_audit)."""
    e = load(spark, sf, "embeddings")
    # coarse quantizer: per-label elementwise-mean centroid (two-level
    # reduction — the same plan shape a k-means E-step emits at scale)
    expl = e.select("label", F.posexplode("embedding").alias("pos", "v"))
    dims = (expl.groupBy("label", "pos")
                .agg(F.avg(F.col("v").cast("double")).alias("m")))
    cent = (dims.groupBy("label")
                .agg(F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "m"))),
                    lambda s: s["m"]).alias("centroid")))
    q = (e.filter(F.col("vec_id") < N_QUERIES)
          .select(F.col("vec_id").alias("qid"), F.col("embedding").alias("qe")))
    # route: nearest centroid(s) per query (centroid table is tiny → broadcast)
    routed = (q.crossJoin(F.broadcast(cent))
               .withColumn("score", _cosine(F.col("qe"), F.col("centroid")))
               .withColumn("r", F.row_number().over(
                   W.partitionBy("qid").orderBy(F.col("score").desc(), "label")))
               .filter(F.col("r") <= nprobe)
               .select("qid", "qe", F.col("label").alias("probe"),
                       *(["r"] if keep_rank else [])))
    return e, routed


def ann_ivf_topk(spark: SparkSession, sf: str) -> DataFrame:
    e, routed = _ivf_routed(spark, sf, nprobe=1)
    # search only the probed cell; the probe side is 10 rows → broadcast,
    # so the corpus scan stays shuffle-free and label-pruned
    scored = (e.join(F.broadcast(routed), e["label"] == routed["probe"])
               .filter(F.col("vec_id") != F.col("qid"))
               .withColumn("cosine", _cosine(F.col("qe"), F.col("embedding"))))
    w = W.partitionBy("qid").orderBy(F.col("cosine").desc(), F.col("vec_id"))
    return (scored.withColumn("rank", F.row_number().over(w))
                  .filter(F.col("rank") <= TOP_K)
                  .select("qid", "probe", "vec_id", "cosine", "rank"))


def ann_ivf_nprobe2_topk(spark: SparkSession, sf: str) -> DataFrame:
    """nprobe=2 IVF: scan each query's TWO nearest cells — the standard
    recall/cost knob (recall lost to quantization at cell boundaries is
    recovered linearly in nprobe while the scan stays nprobe/nlist of
    the corpus).  A vector lives in exactly one cell, so it scores at
    most once per query and no dedup step is needed."""
    e, routed = _ivf_routed(spark, sf, nprobe=2)
    scored = (e.join(F.broadcast(routed), e["label"] == routed["probe"])
               .filter(F.col("vec_id") != F.col("qid"))
               .withColumn("cosine", _cosine(F.col("qe"), F.col("embedding"))))
    w = W.partitionBy("qid").orderBy(F.col("cosine").desc(), F.col("vec_id"))
    return (scored.withColumn("rank", F.row_number().over(w))
                  .filter(F.col("rank") <= TOP_K)
                  .select("qid", "vec_id", "cosine", "rank"))


ANN_IVF_TOPK_SQL = f"""
WITH expl AS (
  SELECT label, i - 1 AS pos, CAST(embedding[CAST(i AS INT)] AS DOUBLE) AS v
  FROM embeddings, UNNEST(range(1, len(embedding) + 1)) u(i)),
dims AS (SELECT label, pos, avg(v) AS m FROM expl GROUP BY label, pos),
cent AS (SELECT label, list(m ORDER BY pos) AS centroid FROM dims GROUP BY label),
q AS (SELECT vec_id AS qid, embedding AS qe FROM embeddings
      WHERE vec_id < {N_QUERIES}),
routed AS (
  SELECT qid, qe, probe FROM (
    SELECT qid, qe, label AS probe,
           row_number() OVER (PARTITION BY qid ORDER BY
             round({_DOT_SQL.format(a='qe', b='centroid')}
                   / (sqrt({_NORM2_SQL.format(a='qe')})
                      * sqrt({_NORM2_SQL.format(a='centroid')})), 6) DESC,
             label) AS r
    FROM q, cent) WHERE r = 1),
scored AS (
  SELECT qid, probe, vec_id,
         round({_DOT_SQL.format(a='qe', b='embedding')}
               / (sqrt({_NORM2_SQL.format(a='qe')})
                  * sqrt({_NORM2_SQL.format(a='embedding')})), 6) AS cosine
  FROM embeddings e JOIN routed ON e.label = routed.probe
  WHERE vec_id <> qid)
SELECT qid, probe, vec_id, cosine, CAST(rank AS INT) AS rank FROM (
  SELECT *, row_number() OVER (PARTITION BY qid
            ORDER BY cosine DESC, vec_id) AS rank
  FROM scored)
WHERE rank <= {TOP_K}
"""


ANN_IVF_NPROBE2_SQL = f"""
WITH expl AS (
  SELECT label, i - 1 AS pos, CAST(embedding[CAST(i AS INT)] AS DOUBLE) AS v
  FROM embeddings, UNNEST(range(1, len(embedding) + 1)) u(i)),
dims AS (SELECT label, pos, avg(v) AS m FROM expl GROUP BY label, pos),
cent AS (SELECT label, list(m ORDER BY pos) AS centroid FROM dims GROUP BY label),
q AS (SELECT vec_id AS qid, embedding AS qe FROM embeddings
      WHERE vec_id < {N_QUERIES}),
routed AS (
  SELECT qid, qe, probe FROM (
    SELECT qid, qe, label AS probe,
           row_number() OVER (PARTITION BY qid ORDER BY
             round({_DOT_SQL.format(a='qe', b='centroid')}
                   / (sqrt({_NORM2_SQL.format(a='qe')})
                      * sqrt({_NORM2_SQL.format(a='centroid')})), 6) DESC,
             label) AS r
    FROM q, cent) WHERE r <= 2),
scored AS (
  SELECT qid, vec_id,
         round({_DOT_SQL.format(a='qe', b='embedding')}
               / (sqrt({_NORM2_SQL.format(a='qe')})
                  * sqrt({_NORM2_SQL.format(a='embedding')})), 6) AS cosine
  FROM embeddings e JOIN routed ON e.label = routed.probe
  WHERE vec_id <> qid)
SELECT qid, vec_id, cosine, CAST(rank AS INT) AS rank FROM (
  SELECT *, row_number() OVER (PARTITION BY qid
            ORDER BY cosine DESC, vec_id) AS rank
  FROM scored)
WHERE rank <= {TOP_K}
"""


# --------------------------------------------------------------------------
# ann_kmeans_cells — the actual k-means FIT for the IVF coarse
# quantizer (ann_ivf_topk consumes a cell assignment; this produces
# one).  Deterministic Lloyd's: seeded init (vectors 0..K-1), cosine
# assignment with rounded scores + cell tie-break, centroid update via
# exact DECIMAL(18,9) component sums → one double division — so every
# iteration is bit-reproducible regardless of partitioning, and the
# DuckDB oracle (the same iterations unrolled as CTEs) matches exactly.
# Scale shape per iteration: centroids broadcast (K × dim doubles),
# assignment is one corpus scan, the update is the two-level posexplode
# reduction (shuffle width = K × dim, not vectors).
# --------------------------------------------------------------------------

K_CELLS = 8
KM_ITERS = 3


def _km_assign(e: DataFrame, cent: DataFrame) -> DataFrame:
    return (e.crossJoin(F.broadcast(cent))
            .withColumn("score", _cosine(F.col("embedding"), F.col("centroid")))
            .withColumn("r", F.row_number().over(
                W.partitionBy("vec_id").orderBy(F.col("score").desc(), "cell")))
            .filter(F.col("r") == 1)
            .select("vec_id", "embedding", "cell", "score"))


def _kmeans_fit(spark: SparkSession, sf: str,
                k_cells: int = K_CELLS, iters: int = KM_ITERS):
    """(final assignment, final centroids) after ``iters`` Lloyd's
    rounds — shared by the cell-stats query and the composed IVF
    search.  Defaults are the oracle-paired demo config; tests pass a
    production-shaped ``k_cells`` to grade recall on structured data."""
    # reused every Lloyd's round (and by both callers' final assign) —
    # one materialization, as _pq_fit already does for its subvectors
    # fan_out before the checkpoint: each Lloyd's assign below is a
    # broadcast join + k_cells 64-dim L2 evals per row — CPU-heavy
    # map work that would otherwise run on the source's ONE split for
    # every round (§2.5); the checkpoint pins the fanned layout
    e = (fan_out(spark, load(spark, sf, "embeddings"))
         .select("vec_id", "embedding")
         .localCheckpoint(eager=False))
    cent = (e.filter(F.col("vec_id") < k_cells)
            .select(F.col("vec_id").alias("cell"),
                    F.transform("embedding", lambda x: x.cast("double"))
                     .alias("centroid")))
    for _ in range(iters):
        assigned = _km_assign(e, cent)
        expl = assigned.select("cell", F.posexplode("embedding").alias("pos", "v"))
        dims = (expl.groupBy("cell", "pos")
                .agg((F.sum(F.col("v").cast("double").cast("decimal(18,9)"))
                       .cast("double") / F.count("*")).alias("m")))
        cent = (dims.groupBy("cell")
                .agg(F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "m"))),
                    lambda s: s["m"]).alias("centroid")))
    return _km_assign(e, cent), cent


def ann_kmeans_cells(spark: SparkSession, sf: str) -> DataFrame:
    final, _ = _kmeans_fit(spark, sf)
    return (final.groupBy("cell")
            .agg(F.count("*").alias("n_vectors"),
                 F.round(F.sum(F.col("score").cast("decimal(10,6)"))
                          .cast("double") / F.count("*"), 6)
                  .alias("avg_cosine")))


def ann_ivf_kmeans_topk(spark: SparkSession, sf: str,
                        k_cells: int = K_CELLS,
                        iters: int = KM_ITERS) -> DataFrame:
    """The quantizer fit and the search composed end-to-end: route each
    query to its nearest fitted k-means centroid and scan only that
    cell's members — what ann_ivf_topk does with the ready-made label
    column, now over cells this engine itself fitted."""
    # the fitted assignment feeds both the query side and the cell scan
    final, cent = _kmeans_fit(spark, sf, k_cells, iters)
    final = final.localCheckpoint(eager=False)
    q = (final.filter(F.col("vec_id") < N_QUERIES)
         .select(F.col("vec_id").alias("qid"), F.col("embedding").alias("qe")))
    routed = (q.crossJoin(F.broadcast(cent))
              .withColumn("s", _cosine(F.col("qe"), F.col("centroid")))
              .withColumn("r", F.row_number().over(
                  W.partitionBy("qid").orderBy(F.col("s").desc(), "cell")))
              .filter(F.col("r") == 1)
              .select("qid", "qe", F.col("cell").alias("probe")))
    scored = (final.join(F.broadcast(routed), final["cell"] == routed["probe"])
              .filter(F.col("vec_id") != F.col("qid"))
              .withColumn("cosine", _cosine(F.col("qe"), F.col("embedding"))))
    w = W.partitionBy("qid").orderBy(F.col("cosine").desc(), F.col("vec_id"))
    return (scored.withColumn("rank", F.row_number().over(w))
                  .filter(F.col("rank") <= TOP_K)
                  .select("qid", F.col("probe").alias("cell"),
                          "vec_id", "cosine", "rank"))


def _kmeans_ctes() -> str:
    """CTE chain ``cent0, a1, d1, cent1, …, final`` — the unrolled
    Lloyd's iterations, shared by the cell-stats and composed-IVF
    oracles."""
    score = (f"round({_DOT_SQL.format(a='e.embedding', b='c.centroid')}"
             f" / (sqrt({_NORM2_SQL.format(a='e.embedding')})"
             f" * sqrt({_NORM2_SQL.format(a='c.centroid')})), 6)")

    def assign(name: str, cent: str) -> str:
        return (f"{name} AS (\n"
                f"  SELECT vec_id, embedding, cell, score FROM (\n"
                f"    SELECT e.vec_id, e.embedding, c.cell, {score} AS score,\n"
                f"           row_number() OVER (PARTITION BY e.vec_id\n"
                f"               ORDER BY {score} DESC, c.cell) AS r\n"
                f"    FROM embeddings e, {cent} c) WHERE r = 1)")

    parts = [
        f"cent0 AS (SELECT vec_id AS cell, "
        f"list_transform(embedding, x -> CAST(x AS DOUBLE)) AS centroid "
        f"FROM embeddings WHERE vec_id < {K_CELLS})"]
    for t in range(1, KM_ITERS + 1):
        parts.append(assign(f"a{t}", f"cent{t - 1}"))
        parts.append(
            f"d{t} AS (\n"
            f"  SELECT cell, i - 1 AS pos,\n"
            f"         CAST(sum(CAST(CAST(embedding[i] AS DOUBLE)"
            f" AS DECIMAL(18,9))) AS DOUBLE) / count(*) AS m\n"
            f"  FROM a{t}, UNNEST(range(1, len(embedding) + 1)) u(i)\n"
            f"  GROUP BY cell, pos)")
        parts.append(f"cent{t} AS (SELECT cell, list(m ORDER BY pos)"
                     f" AS centroid FROM d{t} GROUP BY cell)")
    parts.append(assign("final", f"cent{KM_ITERS}"))
    return ",\n".join(parts)


ANN_KMEANS_CELLS_SQL = (
    f"WITH {_kmeans_ctes()}\n"
    f"SELECT cell, count(*) AS n_vectors,\n"
    f"       round(CAST(sum(CAST(score AS DECIMAL(10,6))) AS DOUBLE)"
    f" / count(*), 6) AS avg_cosine\n"
    f"FROM final GROUP BY cell")


ANN_IVF_KMEANS_SQL = f"""
WITH {_kmeans_ctes()},
q AS (SELECT vec_id AS qid, embedding AS qe FROM final
      WHERE vec_id < {N_QUERIES}),
routed AS (
  SELECT qid, qe, probe FROM (
    SELECT qid, qe, c.cell AS probe,
           row_number() OVER (PARTITION BY qid ORDER BY
             round({_DOT_SQL.format(a='qe', b='c.centroid')}
                   / (sqrt({_NORM2_SQL.format(a='qe')})
                      * sqrt({_NORM2_SQL.format(a='c.centroid')})), 6) DESC,
             c.cell) AS r
    FROM q, cent{KM_ITERS} c) WHERE r = 1),
scored AS (
  SELECT qid, probe AS cell, f.vec_id,
         round({_DOT_SQL.format(a='qe', b='f.embedding')}
               / (sqrt({_NORM2_SQL.format(a='qe')})
                  * sqrt({_NORM2_SQL.format(a='f.embedding')})), 6) AS cosine
  FROM final f JOIN routed ON f.cell = routed.probe
  WHERE f.vec_id <> qid)
SELECT qid, cell, vec_id, cosine, CAST(rank AS INT) AS rank FROM (
  SELECT *, row_number() OVER (PARTITION BY qid
            ORDER BY cosine DESC, vec_id) AS rank
  FROM scored)
WHERE rank <= {TOP_K}
"""


# --------------------------------------------------------------------------
# per-label centroid stats: groupBy over array columns with elementwise
# aggregation (the "build the IVF coarse quantizer" step)
# --------------------------------------------------------------------------

def sim_label_centroid_norm(spark: SparkSession, sf: str) -> DataFrame:
    e = load(spark, sf, "embeddings")
    # elementwise mean via posexplode → groupBy (label, pos) → re-agg;
    # at scale this is the standard two-level centroid reduction
    expl = e.select("label", F.posexplode("embedding").alias("pos", "v"))
    dims = (expl.groupBy("label", "pos")
                .agg(F.avg(F.col("v").cast("double")).alias("m")))
    return (dims.groupBy("label")
                .agg(F.round(F.sqrt(F.sum(F.col("m") * F.col("m"))), 6)
                      .alias("centroid_norm"),
                     (F.count("*")).alias("dim")))


SIM_LABEL_CENTROID_SQL = """
WITH expl AS (
  SELECT label, i - 1 AS pos, CAST(embedding[CAST(i AS INT)] AS DOUBLE) AS v
  FROM embeddings, UNNEST(range(1, len(embedding) + 1)) u(i)),
dims AS (SELECT label, pos, avg(v) AS m FROM expl GROUP BY label, pos)
SELECT label, round(sqrt(sum(m * m)), 6) AS centroid_norm,
       count(*) AS dim
FROM dims GROUP BY label
"""


# --------------------------------------------------------------------------
# SQ8 scalar-quantized ANN: compress the corpus to one byte per
# dimension (per-dim global min/max → uniform 256-level grid), then
# search asymmetrically — full-precision queries against dequantized
# codes (the ADC pattern).  At 100 TB this is the memory lever: a
# 64-dim float32 corpus drops 4× to 64 B/vector, so 4× more of the
# corpus fits a scan's working set; recall loss is bounded by half a
# grid cell per dimension.
#
# Scale shape: the stats pass is ONE single-row aggregate (map-side
# partial over every partition → 128 scalars), broadcast back into the
# quantize/scan stage; search is the brute-force plan on the compact
# codes.  Both quantize and dequantize are built-in higher-order
# expressions — JVM-side, bit-identical to the oracle because every
# float step (subtract, divide, ×255, floor; dequant mn+(c+0.5)Δ/256)
# is written in the same IEEE evaluation order on both engines.
# --------------------------------------------------------------------------

SQ_DIM = 64  # testdata embedding dimensionality (embeddings.parquet)

_SQ_CODE_SPARK = f"""
transform(sequence(1, {SQ_DIM}), i ->
  CASE WHEN element_at(mx, i) = element_at(mn, i) THEN 0
       ELSE CAST(least(255.0D, greatest(0.0D,
         floor((CAST(element_at(embedding, i) AS DOUBLE) - element_at(mn, i))
               / (element_at(mx, i) - element_at(mn, i)) * 255))) AS INT)
  END)
"""

_SQ_DEQ_SPARK = f"""
transform(sequence(1, {SQ_DIM}), i ->
  element_at(mn, i) + (CAST(element_at(code, i) AS DOUBLE) + 0.5)
                      * (element_at(mx, i) - element_at(mn, i)) / 256.0D)
"""


def _sq8_dequantized(e: DataFrame) -> DataFrame:
    """(vec_id, label, d): the corpus as dequantized SQ8 codes.  The
    min/max stats are ONE single-row aggregate broadcast back into the
    corpus scan."""
    mns, mxs = [], []
    for i in range(1, SQ_DIM + 1):
        c = F.element_at(F.col("embedding"), i).cast("double")
        mns.append(F.min(c).alias(f"mn{i}"))
        mxs.append(F.max(c).alias(f"mx{i}"))
    stats = (e.agg(*mns, *mxs)
              .select(F.array(*[F.col(f"mn{i}") for i in range(1, SQ_DIM + 1)])
                       .alias("mn"),
                      F.array(*[F.col(f"mx{i}") for i in range(1, SQ_DIM + 1)])
                       .alias("mx")))
    return (e.crossJoin(F.broadcast(stats))
             .withColumn("code", F.expr(_SQ_CODE_SPARK))
             .withColumn("d", F.expr(_SQ_DEQ_SPARK))
             .select("vec_id", "label", "d"))


def ann_sq8_topk(spark: SparkSession, sf: str) -> DataFrame:
    e = load(spark, sf, "embeddings")
    deq = _sq8_dequantized(e).select("vec_id", "d")
    q = (e.filter(F.col("vec_id") < N_QUERIES)
          .select(F.col("vec_id").alias("qid"), F.col("embedding").alias("qe")))
    dot_qd = F.expr(f"""aggregate(transform(sequence(1, {SQ_DIM}),
        i -> CAST(element_at(qe, i) AS DOUBLE) * element_at(d, i)),
        CAST(0 AS DOUBLE), (acc, x) -> acc + x)""")
    norm_d = F.expr("aggregate(transform(d, x -> x * x), "
                    "CAST(0 AS DOUBLE), (acc, x) -> acc + x)")
    scored = (deq.crossJoin(F.broadcast(q))
              .filter(F.col("vec_id") != F.col("qid"))
              .withColumn("cosine", F.round(
                  dot_qd / (F.sqrt(_norm2(F.col("qe"))) * F.sqrt(norm_d)), 6)))
    w = W.partitionBy("qid").orderBy(F.col("cosine").desc(), F.col("vec_id"))
    return (scored.withColumn("rank", F.row_number().over(w))
                  .filter(F.col("rank") <= TOP_K)
                  .select("qid", "vec_id", "cosine", "rank"))


ANN_SQ8_TOPK_SQL = f"""
WITH dims AS (
  SELECT i, min(CAST(embedding[i] AS DOUBLE)) AS mn,
         max(CAST(embedding[i] AS DOUBLE)) AS mx
  FROM embeddings, range(1, {SQ_DIM + 1}) t(i) GROUP BY i),
stats AS (
  SELECT list(mn ORDER BY i) AS mn, list(mx ORDER BY i) AS mx FROM dims),
codes AS (
  SELECT vec_id,
         list_transform(range(1, {SQ_DIM + 1}), i ->
           CASE WHEN mx[i] = mn[i] THEN 0
                ELSE CAST(least(255.0, greatest(0.0,
                  floor((CAST(embedding[i] AS DOUBLE) - mn[i])
                        / (mx[i] - mn[i]) * 255))) AS INT) END) AS code
  FROM embeddings, stats),
deq AS (
  SELECT vec_id,
         list_transform(range(1, {SQ_DIM + 1}), i ->
           mn[i] + (CAST(code[i] AS DOUBLE) + 0.5) * (mx[i] - mn[i]) / 256.0)
           AS d
  FROM codes, stats),
q AS (SELECT vec_id AS qid, embedding AS qe FROM embeddings
      WHERE vec_id < {N_QUERIES}),
scored AS (
  SELECT qid, deq.vec_id,
         round(list_sum(list_transform(range(1, {SQ_DIM + 1}),
                 i -> CAST(qe[i] AS DOUBLE) * d[i]))
               / (sqrt({_NORM2_SQL.format(a='qe')})
                  * sqrt(list_sum(list_transform(d, x -> x * x)))), 6) AS cosine
  FROM deq, q WHERE deq.vec_id <> qid),
ranked AS (
  SELECT qid, vec_id, cosine,
         row_number() OVER (PARTITION BY qid ORDER BY cosine DESC, vec_id)
           AS rank
  FROM scored)
SELECT qid, vec_id, cosine, CAST(rank AS INT) AS rank FROM ranked
WHERE rank <= {TOP_K}
"""


# --------------------------------------------------------------------------
# ann_pq_topk — product quantization, the third classic ANN lever
# beside IVF (cell pruning) and SQ8 (per-dim codes): split each vector
# into PQ_M subvectors, fit an independent PQ_K-centroid codebook per
# subspace (one grouped Lloyd's run — the kmeans chain with a subspace
# key added everywhere), store each vector as PQ_M small codes, and
# search asymmetrically: the exact query builds a per-(subspace, code)
# lookup table of partial dots, and a database vector's score is the
# sum of PQ_M table lookups — no full-precision corpus access at query
# time.  At 100 TB a 64-dim float32 corpus compresses 64x (4 codes/vec)
# and the scan touches codes only.
#
# Determinism discipline: L2 assignment distances round(6) with cell
# tie-break; centroid updates are DECIMAL(18,9) exact means; partial
# dots round(9) accumulate in DECIMAL(28,9) — every stage
# bit-reproducible and mirrored in the oracle's unrolled CTEs.
# --------------------------------------------------------------------------

# MEASURED RECALL (tests/test_ann_recall.py): 0.16 vs brute-force truth
# at sf0.001 with this demo config — 12 bits/vector on near-random
# embeddings, where chance is ~0.01 — rising monotonically with the
# codebook-size lever (PQ_K=32 measured 0.26; production uses PQ_K=256
# 8-bit codes).  Like the label-cell IVF, the demo config exercises the
# full fit/encode/ADC machinery against an exact oracle; recall on
# real (structured) embeddings at production K is far higher.
PQ_M = 4                       # subspaces
PQ_SUBDIM = SQ_DIM // PQ_M     # 16 dims per subspace
PQ_K = 8                       # codes per subspace
PQ_ITERS = 2


def _pq_sub(e: DataFrame, m: int = PQ_M) -> DataFrame:
    """(vec_id, s, sv): each vector L2-NORMALIZED then split into ``m``
    double subvectors — on the unit sphere inner product IS cosine, so
    the ADC scores rank like the brute-force cosine truth (the standard
    PQ-for-cosine preprocessing)."""
    # the norm is hoisted to a named column: Spark does not lift
    # subexpressions out of higher-order-function lambdas, so an inline
    # norm inside the transform would re-run the 64-element fold once
    # per output element
    if SQ_DIM % m != 0:
        raise ValueError(
            f"pq_m={m} must divide the embedding dim {SQ_DIM}; a "
            f"non-divisor would silently drop the last {SQ_DIM % m} "
            "dimensions from every vector")
    normed = e.select("vec_id", "embedding",
                      F.sqrt(_norm2(F.col("embedding"))).alias("nrm"))
    subdim = SQ_DIM // m
    return (normed.select("vec_id", F.explode(F.array(*[
        F.struct(F.lit(s).alias("s"),
                 F.transform(F.slice("embedding", s * subdim + 1, subdim),
                             lambda x: x.cast("double") / F.col("nrm"))
                  .alias("sv"))
        for s in range(m)])).alias("p"))
        .select("vec_id", F.col("p.s").alias("s"), F.col("p.sv").alias("sv")))


def _pq_l2(a, b):
    return F.round(F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0), lambda acc, x: acc + x), 6)


def _pq_assign(sub: DataFrame, cent: DataFrame) -> DataFrame:
    # (an A/B against min_by-over-struct aggregation measured the window
    # FASTER here: the struct buffer carries the 16-dim subvector, which
    # forces ObjectHashAggregate out of whole-stage codegen)
    return (sub.join(F.broadcast(cent), "s")
            .withColumn("d2", _pq_l2(F.col("sv"), F.col("centroid")))
            .withColumn("r", F.row_number().over(
                W.partitionBy("vec_id", "s").orderBy("d2", "cell")))
            .filter(F.col("r") == 1)
            .select("vec_id", "s", "sv", "cell"))


def _pq_fit(spark: SparkSession, sf: str,
            pq_k: int = PQ_K, iters: int = PQ_ITERS, pq_m: int = PQ_M,
            sub: DataFrame | None = None):
    """(sub, codebooks, codes) after ``iters`` grouped Lloyd's rounds —
    all PQ_M subspace codebooks fit in ONE chain (subspace is just
    another grouping key).  Defaults are the oracle-paired demo config;
    tests pass a production-shaped ``pq_k`` (codebook size) to grade
    recall on structured data.

    (A lineage-truncating localCheckpoint on the final ``cent`` was
    A/B-measured slower here — Spark's ReuseExchange already shares the
    Lloyd chain across the codes/LUT branches, so the checkpoint only
    added a persist round trip.)"""
    if sub is None:
        # fan_out before the subvector split + checkpoint: the
        # normalize/slice expansion AND every Lloyd's assign (broadcast
        # join + pq_k L2 evals per subvector row) are CPU-heavy map
        # work on a single-split local source (§2.5); the checkpoint
        # pins the fanned layout for all rounds
        e = (fan_out(spark, load(spark, sf, "embeddings"))
             .select("vec_id", "embedding"))
        # reused every round — and shareable ACROSS fits: the subvector
        # table depends only on pq_m, so a codebook-size sweep
        # (round17.ann_pq_recall_knee) passes one table to every leg
        sub = _pq_sub(e, pq_m).localCheckpoint(eager=False)
    cent = (sub.filter(F.col("vec_id") < pq_k)
            .select("s", F.col("vec_id").alias("cell"),
                    F.col("sv").alias("centroid")))
    for _ in range(iters):
        a = _pq_assign(sub, cent)
        expl = a.select("s", "cell", F.posexplode("sv").alias("pos", "v"))
        dims = (expl.groupBy("s", "cell", "pos")
                .agg((F.sum(F.col("v").cast("decimal(18,9)")).cast("double")
                      / F.count("*")).alias("m")))
        cent = (dims.groupBy("s", "cell")
                .agg(F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "m"))),
                    lambda st: st["m"]).alias("centroid")))
    codes = _pq_assign(sub, cent).select("vec_id", "s", "cell")
    return sub, cent, codes


def ann_pq_topk(spark: SparkSession, sf: str,
                pq_k: int = PQ_K, iters: int = PQ_ITERS,
                pq_m: int = PQ_M, fit=None) -> DataFrame:
    # ``fit`` lets a sweep share tables across legs (the knee shares
    # ONE subvector table; each leg still fits its own codebook)
    sub, cent, codes = fit if fit is not None else _pq_fit(
        spark, sf, pq_k, iters, pq_m)
    q = (sub.filter(F.col("vec_id") < N_QUERIES)
         .select(F.col("vec_id").alias("qid"), "s", F.col("sv").alias("qs")))
    # ADC lookup table: N_QUERIES x PQ_M x PQ_K partial dots (tiny,
    # broadcast); each database vector then costs PQ_M lookups + a sum
    lut = (q.join(F.broadcast(cent), "s")
           .select("qid", "s", "cell",
                   F.round(_dot(F.col("qs"), F.col("centroid")), 9)
                    .cast("decimal(28,9)").alias("pd")))
    scored = (codes.join(F.broadcast(lut), ["s", "cell"])
              .filter(F.col("vec_id") != F.col("qid"))
              .groupBy("qid", "vec_id")
              .agg(F.round(F.sum("pd").cast("double"), 6).alias("approx_dot")))
    w = W.partitionBy("qid").orderBy(F.col("approx_dot").desc(), F.col("vec_id"))
    return (scored.withColumn("rank", F.row_number().over(w))
                  .filter(F.col("rank") <= TOP_K)
                  .select("qid", "vec_id", "approx_dot", "rank"))


def _pq_ctes(pq_k: int = PQ_K, suffix: str = "") -> str:
    """The PQ fit/encode pipeline as DuckDB CTEs — parameterized by
    codebook size (``pq_k``) and a CTE-name ``suffix`` so several
    configs can coexist in ONE oracle query (the round-17 recall-knee
    sweep unions one leg per codebook size)."""
    sub, codes = f"sub{suffix}", f"codes{suffix}"
    l2 = (f"round(list_sum(list_transform(range(1, {PQ_SUBDIM + 1}),"
          f" i -> (sv[i] - centroid[i]) * (sv[i] - centroid[i]))), 6)")

    def assign(name: str, cent: str) -> str:
        return (f"{name} AS (\n"
                f"  SELECT vec_id, s, sv, cell FROM (\n"
                f"    SELECT {sub}.vec_id, {sub}.s, {sub}.sv, c.cell,\n"
                f"           row_number() OVER (PARTITION BY {sub}.vec_id,"
                f" {sub}.s\n"
                f"               ORDER BY {l2} ASC, c.cell) AS r\n"
                f"    FROM {sub} JOIN {cent} c ON c.s = {sub}.s)"
                f" WHERE r = 1)")

    parts = [
        f"normed{suffix} AS (SELECT vec_id, embedding,"
        f" sqrt({_NORM2_SQL.format(a='embedding')}) AS nrm FROM embeddings)",
        f"{sub} AS (SELECT vec_id, s,\n"
        f"  list_transform(list_slice(embedding, s * {PQ_SUBDIM} + 1,"
        f" s * {PQ_SUBDIM} + {PQ_SUBDIM}),"
        f" x -> CAST(x AS DOUBLE) / nrm) AS sv\n"
        f"  FROM normed{suffix}, range(0, {PQ_M}) t(s))",
        f"cent{suffix}0 AS (SELECT s, vec_id AS cell, sv AS centroid"
        f" FROM {sub} WHERE vec_id < {pq_k})"]
    for t in range(1, PQ_ITERS + 1):
        parts.append(assign(f"a{suffix}{t}", f"cent{suffix}{t - 1}"))
        parts.append(
            f"d{suffix}{t} AS (SELECT s, cell, i - 1 AS pos,\n"
            f"  CAST(sum(CAST(sv[i] AS DECIMAL(18,9))) AS DOUBLE) / count(*)"
            f" AS m\n"
            f"  FROM a{suffix}{t}, UNNEST(range(1, {PQ_SUBDIM + 1})) u(i)\n"
            f"  GROUP BY s, cell, pos)")
        parts.append(f"cent{suffix}{t} AS (SELECT s, cell,"
                     f" list(m ORDER BY pos)"
                     f" AS centroid FROM d{suffix}{t} GROUP BY s, cell)")
    parts.append(assign(f"codesfull{suffix}", f"cent{suffix}{PQ_ITERS}"))
    parts.append(f"{codes} AS (SELECT vec_id, s, cell"
                 f" FROM codesfull{suffix})")
    return ",\n".join(parts)


ANN_PQ_TOPK_SQL = f"""
WITH {_pq_ctes()},
q AS (SELECT vec_id AS qid, s, sv AS qs FROM sub WHERE vec_id < {N_QUERIES}),
lut AS (
  SELECT qid, c.s, c.cell,
         CAST(round(list_sum(list_transform(range(1, {PQ_SUBDIM + 1}),
                i -> qs[i] * centroid[i])), 9) AS DECIMAL(28,9)) AS pd
  FROM q JOIN cent{PQ_ITERS} c ON c.s = q.s),
scored AS (
  SELECT qid, codes.vec_id,
         round(CAST(sum(pd) AS DOUBLE), 6) AS approx_dot
  FROM codes JOIN lut ON lut.s = codes.s AND lut.cell = codes.cell
  WHERE codes.vec_id <> qid GROUP BY 1, 2),
ranked AS (
  SELECT qid, vec_id, approx_dot,
         row_number() OVER (PARTITION BY qid
             ORDER BY approx_dot DESC, vec_id) AS rank
  FROM scored)
SELECT qid, vec_id, approx_dot, CAST(rank AS INT) AS rank FROM ranked
WHERE rank <= {TOP_K}
"""


# --------------------------------------------------------------------------
# ann_ivf_sq8_topk — IVF cell pruning × SQ8 codes: the production
# composition (what an IVF-SQ index does).  Routing picks each query's
# nearest coarse cell from full-precision centroids; the cell scan then
# reads only DEQUANTIZED SQ8 codes.  At 100 TB the scan cost is
# (1/nlist of the corpus) × (1/4 the bytes) per query — the two levers
# multiply.  Same plan shape as ann_ivf_topk (broadcast-routed,
# label-pruned) with the quantized corpus substituted.
# --------------------------------------------------------------------------

def ann_ivf_sq8_topk(spark: SparkSession, sf: str) -> DataFrame:
    e, routed = _ivf_routed(spark, sf, nprobe=1)
    deq = _sq8_dequantized(e)
    dot_qd = F.expr(f"""aggregate(transform(sequence(1, {SQ_DIM}),
        i -> CAST(element_at(qe, i) AS DOUBLE) * element_at(d, i)),
        CAST(0 AS DOUBLE), (acc, x) -> acc + x)""")
    norm_d = F.expr("aggregate(transform(d, x -> x * x), "
                    "CAST(0 AS DOUBLE), (acc, x) -> acc + x)")
    scored = (deq.join(F.broadcast(routed), deq["label"] == routed["probe"])
                 .filter(F.col("vec_id") != F.col("qid"))
                 .withColumn("cosine", F.round(
                     dot_qd / (F.sqrt(_norm2(F.col("qe"))) * F.sqrt(norm_d)),
                     6)))
    w = W.partitionBy("qid").orderBy(F.col("cosine").desc(), F.col("vec_id"))
    return (scored.withColumn("rank", F.row_number().over(w))
                  .filter(F.col("rank") <= TOP_K)
                  .select("qid", "probe", "vec_id", "cosine", "rank"))


ANN_IVF_SQ8_SQL = f"""
WITH qdims AS (
  SELECT i, min(CAST(embedding[i] AS DOUBLE)) AS mn,
         max(CAST(embedding[i] AS DOUBLE)) AS mx
  FROM embeddings, range(1, {SQ_DIM + 1}) t(i) GROUP BY i),
qstats AS (
  SELECT list(mn ORDER BY i) AS mn, list(mx ORDER BY i) AS mx FROM qdims),
codes AS (
  SELECT vec_id, label,
         list_transform(range(1, {SQ_DIM + 1}), i ->
           CASE WHEN mx[i] = mn[i] THEN 0
                ELSE CAST(least(255.0, greatest(0.0,
                  floor((CAST(embedding[i] AS DOUBLE) - mn[i])
                        / (mx[i] - mn[i]) * 255))) AS INT) END) AS code
  FROM embeddings, qstats),
deq AS (
  SELECT vec_id, label,
         list_transform(range(1, {SQ_DIM + 1}), i ->
           mn[i] + (CAST(code[i] AS DOUBLE) + 0.5) * (mx[i] - mn[i]) / 256.0)
           AS d
  FROM codes, qstats),
expl AS (
  SELECT label, i - 1 AS pos, CAST(embedding[CAST(i AS INT)] AS DOUBLE) AS v
  FROM embeddings, UNNEST(range(1, len(embedding) + 1)) u(i)),
cdims AS (SELECT label, pos, avg(v) AS m FROM expl GROUP BY label, pos),
cent AS (SELECT label, list(m ORDER BY pos) AS centroid
         FROM cdims GROUP BY label),
q AS (SELECT vec_id AS qid, embedding AS qe FROM embeddings
      WHERE vec_id < {N_QUERIES}),
routed AS (
  SELECT qid, qe, probe FROM (
    SELECT qid, qe, label AS probe,
           row_number() OVER (PARTITION BY qid ORDER BY
             round({_DOT_SQL.format(a='qe', b='centroid')}
                   / (sqrt({_NORM2_SQL.format(a='qe')})
                      * sqrt({_NORM2_SQL.format(a='centroid')})), 6) DESC,
             label) AS r
    FROM q, cent) WHERE r = 1),
scored AS (
  SELECT qid, probe, deq.vec_id,
         round(list_sum(list_transform(range(1, {SQ_DIM + 1}),
                 i -> CAST(qe[i] AS DOUBLE) * d[i]))
               / (sqrt({_NORM2_SQL.format(a='qe')})
                  * sqrt(list_sum(list_transform(d, x -> x * x)))), 6)
           AS cosine
  FROM deq JOIN routed ON deq.label = routed.probe
  WHERE deq.vec_id <> qid)
SELECT qid, probe, vec_id, cosine, CAST(rank AS INT) AS rank FROM (
  SELECT *, row_number() OVER (PARTITION BY qid
            ORDER BY cosine DESC, vec_id) AS rank
  FROM scored)
WHERE rank <= {TOP_K}
"""


# --------------------------------------------------------------------------
# ann_ivf_pq_topk — IVF cell pruning × PQ ADC codes: the full IVF-PQ
# index (FAISS's IVFPQ), composing the two independent levers already
# built: routing reads full-precision coarse centroids to pick each
# query's cell; the cell scan then touches ONLY the PQ codes, scored by
# ADC lookup-table sums.  At 100 TB the per-query cost is
# (1/nlist of the corpus) × (PQ_M lookups per vector) — cell pruning
# multiplies with 64× code compression, and the full-precision corpus
# is never read at query time.
# Plan shape: routed pairs broadcast → label-pruned code scan →
# broadcast LUT join → (qid, vec_id) partial-dot agg.  No exchange
# touches more than the probed cells' code rows.
# --------------------------------------------------------------------------

def _ivf_pq_scored(spark: SparkSession, sf: str,
                   pq_k: int = PQ_K, iters: int = PQ_ITERS,
                   pq_m: int = PQ_M, nprobe: int = 1,
                   fit=None, keep_rank: bool = False) -> DataFrame:
    """ADC-scored IVF-PQ candidates (qid, probe, vec_id, approx_dot
    [, r]) BEFORE top-k ranking — shared by ann_ivf_pq_topk and the
    recall audit's single max-nprobe scan (approx_dot depends only on
    (qid, vec_id), never on which probe routed the cell)."""
    sub, cent, codes = fit if fit is not None else _pq_fit(
        spark, sf, pq_k, iters, pq_m)
    e, routed = _ivf_routed(spark, sf, nprobe=nprobe, keep_rank=keep_rank)
    codesl = codes.join(e.select("vec_id", "label"), "vec_id")
    q = (sub.filter(F.col("vec_id") < N_QUERIES)
         .select(F.col("vec_id").alias("qid"), "s", F.col("sv").alias("qs")))
    lut = (q.join(F.broadcast(cent), "s")
           .select("qid", "s", "cell",
                   F.round(_dot(F.col("qs"), F.col("centroid")), 9)
                    .cast("decimal(28,9)").alias("pd")))
    # prune FIRST (cell membership), pay the LUT lookup only on
    # surviving code rows
    keys = ["qid", "probe"] + (["r"] if keep_rank else [])
    pruned = (codesl.join(F.broadcast(routed.select(*keys)),
                          codesl["label"] == F.col("probe"))
              .filter(F.col("vec_id") != F.col("qid")))
    return (pruned.join(F.broadcast(lut), ["qid", "s", "cell"])
            .groupBy(*keys, "vec_id")
            .agg(F.round(F.sum("pd").cast("double"), 6).alias("approx_dot")))


def ann_ivf_pq_topk(spark: SparkSession, sf: str,
                    pq_k: int = PQ_K, iters: int = PQ_ITERS,
                    pq_m: int = PQ_M, nprobe: int = 1,
                    fit=None) -> DataFrame:
    # ``nprobe`` is the standard recall/cost knob (cells scanned per
    # query); ``fit`` lets an audit share ONE (sub, cent, codes) PQ fit
    # across several nprobe legs (round16.ann_ivfpq_recall_audit —
    # the dedup_audit_pr shared-table idiom)
    scored = _ivf_pq_scored(spark, sf, pq_k, iters, pq_m, nprobe, fit)
    w = W.partitionBy("qid").orderBy(F.col("approx_dot").desc(),
                                     F.col("vec_id"))
    return (scored.withColumn("rank", F.row_number().over(w))
                  .filter(F.col("rank") <= TOP_K)
                  .select("qid", "probe", "vec_id", "approx_dot", "rank"))


ANN_IVF_PQ_SQL = f"""
WITH {_pq_ctes()},
q AS (SELECT vec_id AS qid, s, sv AS qs FROM sub WHERE vec_id < {N_QUERIES}),
lut AS (
  SELECT qid, c.s, c.cell,
         CAST(round(list_sum(list_transform(range(1, {PQ_SUBDIM + 1}),
                i -> qs[i] * centroid[i])), 9) AS DECIMAL(28,9)) AS pd
  FROM q JOIN cent{PQ_ITERS} c ON c.s = q.s),
iexpl AS (
  SELECT label, i - 1 AS pos, CAST(embedding[CAST(i AS INT)] AS DOUBLE) AS v
  FROM embeddings, UNNEST(range(1, len(embedding) + 1)) u(i)),
idims AS (SELECT label, pos, avg(v) AS m FROM iexpl GROUP BY label, pos),
icent AS (SELECT label, list(m ORDER BY pos) AS centroid
          FROM idims GROUP BY label),
iq AS (SELECT vec_id AS qid, embedding AS qe FROM embeddings
       WHERE vec_id < {N_QUERIES}),
routed AS (
  SELECT qid, probe FROM (
    SELECT qid, label AS probe,
           row_number() OVER (PARTITION BY qid ORDER BY
             round({_DOT_SQL.format(a='qe', b='centroid')}
                   / (sqrt({_NORM2_SQL.format(a='qe')})
                      * sqrt({_NORM2_SQL.format(a='centroid')})), 6) DESC,
             label) AS r
    FROM iq, icent) WHERE r = 1),
scored AS (
  SELECT routed.qid, routed.probe, codes.vec_id,
         round(CAST(sum(pd) AS DOUBLE), 6) AS approx_dot
  FROM codes
  JOIN embeddings lbl ON lbl.vec_id = codes.vec_id
  JOIN routed ON lbl.label = routed.probe
  JOIN lut ON lut.qid = routed.qid AND lut.s = codes.s
          AND lut.cell = codes.cell
  WHERE codes.vec_id <> routed.qid
  GROUP BY 1, 2, 3),
ranked AS (
  SELECT qid, probe, vec_id, approx_dot,
         row_number() OVER (PARTITION BY qid
             ORDER BY approx_dot DESC, vec_id) AS rank
  FROM scored)
SELECT qid, probe, vec_id, approx_dot, CAST(rank AS INT) AS rank FROM ranked
WHERE rank <= {TOP_K}
"""


QUERIES = {
    "ann_cosine_topk": ann_cosine_topk,
    "ann_ivf_topk": ann_ivf_topk,
    "ann_ivf_nprobe2_topk": ann_ivf_nprobe2_topk,
    "ann_kmeans_cells": ann_kmeans_cells,
    "ann_ivf_kmeans_topk": ann_ivf_kmeans_topk,
    "ann_sq8_topk": ann_sq8_topk,
    "ann_ivf_sq8_topk": ann_ivf_sq8_topk,
    "sim_lsh_buckets": sim_lsh_buckets,
    "sim_lsh_pairs": sim_lsh_pairs,
    "sim_label_centroid_norm": sim_label_centroid_norm,
    "ann_pq_topk": ann_pq_topk,
    "ann_ivf_pq_topk": ann_ivf_pq_topk,
}

ORACLES = {
    "ann_cosine_topk": ANN_COSINE_TOPK_SQL,
    "ann_ivf_topk": ANN_IVF_TOPK_SQL,
    "ann_ivf_nprobe2_topk": ANN_IVF_NPROBE2_SQL,
    "ann_kmeans_cells": ANN_KMEANS_CELLS_SQL,
    "ann_ivf_kmeans_topk": ANN_IVF_KMEANS_SQL,
    "ann_sq8_topk": ANN_SQ8_TOPK_SQL,
    "ann_ivf_sq8_topk": ANN_IVF_SQ8_SQL,
    "sim_lsh_buckets": SIM_LSH_BUCKETS_SQL,
    "sim_lsh_pairs": SIM_LSH_PAIRS_SQL,
    "sim_label_centroid_norm": SIM_LABEL_CENTROID_SQL,
    "ann_pq_topk": ANN_PQ_TOPK_SQL,
    "ann_ivf_pq_topk": ANN_IVF_PQ_SQL,
}
