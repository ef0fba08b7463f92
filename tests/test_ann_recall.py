"""ANN recall graded against the brute-force truth — the IVF/SQ8
variants' oracles verify engine parity on the *routed* semantics, so
this suite supplies the independent check the oracle can't: how much of
the true top-k each approximate variant actually returns.

Floors are measured values at sf0.001 minus a safety margin, pinned so
a regression in routing (or a silent quantizer change) fails loudly
rather than hiding behind a still-green parity oracle."""

import pytest

from bigarrays_jl_spark.operators.similarity import (
    ann_cosine_topk, ann_ivf_kmeans_topk, ann_ivf_nprobe2_topk,
    ann_ivf_topk, ann_sq8_topk)


@pytest.fixture(scope="module")
def truth(spark, sf_dir):
    return {(r.qid, r.vec_id) for r in ann_cosine_topk(spark, sf_dir).collect()}


def _recall(df, truth):
    got = {(r.qid, r.vec_id) for r in df.collect()}
    return len(got & truth) / len(truth)


def test_sq8_full_scan_loses_nothing_at_this_scale(spark, sf_dir, truth):
    # 8-bit quantization perturbs scores but (measured) not the top-10
    # membership on this corpus — the no-routing-loss reference point
    assert _recall(ann_sq8_topk(spark, sf_dir), truth) == 1.0


def test_kmeans_cells_beat_label_cells(spark, sf_dir, truth):
    # the fitted quantizer must recover most of the recall the arbitrary
    # label partition throws away (measured 0.76 vs 0.14 at sf0.001)
    r_label = _recall(ann_ivf_topk(spark, sf_dir), truth)
    r_kmeans = _recall(ann_ivf_kmeans_topk(spark, sf_dir), truth)
    assert r_kmeans >= 0.6
    assert r_kmeans > r_label


def test_nprobe_is_a_recall_knob(spark, sf_dir, truth):
    # probing a second cell must not lose recall (measured 0.14 -> 0.30)
    r1 = _recall(ann_ivf_topk(spark, sf_dir), truth)
    r2 = _recall(ann_ivf_nprobe2_topk(spark, sf_dir), truth)
    assert r2 >= r1


def test_pq_preserves_structure_above_chance(spark, sf_dir, truth):
    # 12-bit PQ codes on near-random embeddings can't reconstruct exact
    # ranks (measured 0.16), but must beat chance (~0.01 for top-5 of
    # ~550) by an order of magnitude — the ADC machinery preserves real
    # signal, and the codebook-size lever (PQ_K) is the accuracy knob
    from bigarrays_jl_spark.operators.similarity import ann_pq_topk
    assert _recall(ann_pq_topk(spark, sf_dir), truth) >= 0.1


# -- production-shaped config on structured (clustered) embeddings ----------
#
# The sf-testdata embeddings are near-random, so the demo configs above
# honestly report low absolute recall — they grade the *machinery*.  This
# fixture grades the *levers*: a seeded mixture of Gaussians (8 unit-norm
# cluster means, sigma=0.05) with 5 planted near-neighbors per query
# (sigma=0.005 — the standard ANN-benchmark ground-truth shape, and the
# near-dup-retrieval geometry the pipeline actually hunts at 100 TB).
# Where geometry exists, the fitted IVF and a production-sized PQ codebook
# (PQ_K=64 vs the demo's 8) must recover >=0.9 of the brute-force top-k.

@pytest.fixture(scope="module")
def clustered_dir(tmp_path_factory):
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    rng = np.random.default_rng(20260814)
    n, dim, n_clusters, n_q, k = 512, 64, 8, 10, 5
    means = rng.normal(size=(n_clusters, dim))
    means /= np.linalg.norm(means, axis=1, keepdims=True)
    cluster = np.arange(n) % n_clusters
    emb = means[cluster] + 0.05 * rng.normal(size=(n, dim))
    tail = n - n_q * k
    for q in range(n_q):          # plant k true near-neighbors per query
        for j in range(k):
            t = tail + q * k + j
            emb[t] = emb[q] + 0.005 * rng.normal(size=dim)
            cluster[t] = cluster[q]
    d = tmp_path_factory.mktemp("clustered")
    tbl = pa.table({
        "vec_id": pa.array(np.arange(n), pa.int64()),
        "embedding": pa.array([list(map(float, v)) for v in
                               emb.astype(np.float32)], pa.list_(pa.float32())),
        "label": pa.array(cluster.astype(np.int32), pa.int32()),
    })
    pq.write_table(tbl, str(d / "embeddings.parquet"))
    return str(d)


def test_ivf_kmeans_recall_on_clustered_embeddings(spark, clustered_dir):
    truth = {(r.qid, r.vec_id)
             for r in ann_cosine_topk(spark, clustered_dir).collect()}
    got = ann_ivf_kmeans_topk(spark, clustered_dir, k_cells=8, iters=3)
    assert _recall(got, truth) >= 0.9     # measured 1.0


def test_pq_production_codebook_recall_on_clustered_embeddings(spark, clustered_dir):
    from bigarrays_jl_spark.operators.similarity import ann_pq_topk
    truth = {(r.qid, r.vec_id)
             for r in ann_cosine_topk(spark, clustered_dir).collect()}
    got = ann_pq_topk(spark, clustered_dir, pq_k=64, iters=2)
    assert _recall(got, truth) >= 0.9     # measured 1.0


def test_pq_rejects_non_divisor_subspace_count(spark, sf_dir):
    import pytest as _pytest

    from bigarrays_jl_spark.operators.similarity import ann_pq_topk

    with _pytest.raises(ValueError, match="must divide"):
        ann_pq_topk(spark, sf_dir, pq_m=3)


def test_ivf_pq_production_recall_on_clustered_embeddings(spark, clustered_dir):
    # the composed IVF-PQ index at a production codebook (pq_k=64 vs the
    # demo's 8) must keep the full brute-force top-k where geometry
    # exists: routing lands the true cluster and the ADC codes separate
    # the planted near-neighbors (measured 1.0; the demo codebook
    # measures 0.0 HERE because 8 codes cannot separate neighbors
    # inside one routed cell — codebook size is the lever, as with PQ)
    from bigarrays_jl_spark.operators.similarity import ann_ivf_pq_topk
    truth = {(r.qid, r.vec_id)
             for r in ann_cosine_topk(spark, clustered_dir).collect()}
    got = ann_ivf_pq_topk(spark, clustered_dir, pq_k=64, iters=2)
    assert _recall(got, truth) >= 0.9     # measured 1.0


def test_pq_recall_knee_endpoints_rise(spark, sf_dir):
    # the committed codebook-size sweep (round17.ann_pq_recall_knee):
    # recall must RISE from the smallest codebook to the largest —
    # endpoints only (per-step monotonicity is not a theorem for
    # codebook size the way it is for nprobe)
    from bigarrays_jl_spark.operators.round17 import ann_pq_recall_knee
    rows = {r.pq_k: r.mean_recall
            for r in ann_pq_recall_knee(spark, sf_dir).collect()}
    ks = sorted(rows)
    assert rows[ks[-1]] > rows[ks[0]], rows
