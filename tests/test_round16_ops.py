"""Round-16 tests: the composed curation pipeline and the IVF-PQ
recall sweep (r15 verdict tasks 4 and 5)."""
import math

from pyspark.sql import functions as F

from bigarrays_jl_spark.operators.pipeline import DECON_NGRAM, PACK_BUDGET
from bigarrays_jl_spark.operators.round16 import (IVFPQ_NPROBES,
                                                  ann_ivfpq_recall_audit,
                                                  pipeline_e2e_curate)
from bigarrays_jl_spark.sources.tables import load


def _python_curate(docs):
    """The four stage canons composed in plain Python: Gopher gate ->
    exact dedup -> 8-gram decontamination vs the eval split -> pack."""
    import hashlib

    def gopher_pass(text):
        ts = [w for w in text.split(" ") if w != ""]
        n = len(ts)
        if n == 0:
            return False
        mean_len = round(sum(len(w) for w in ts) / n, 4)
        alpha = round(sum(1 for w in ts
                          if any(c.isascii() and c.isalpha() for c in w))
                      / n, 4)
        nstop = sum(1 for w in ts
                    if w in ("the", "a", "and", "of", "to", "in"))
        return (20 <= n <= 1000 and 3 <= mean_len <= 10
                and alpha >= 0.8 and nstop >= 2)

    def shingles(text):
        t = text.strip().lower().split()
        return {" ".join(t[i:i + DECON_NGRAM])
                for i in range(len(t) - DECON_NGRAM + 1)}

    ev = set()
    for doc_id, text in docs:
        if doc_id % 10 == 0:
            ev |= shingles(text)
    q = [(i, t) for i, t in docs if i % 10 != 0 and gopher_pass(t)]
    fams = {}
    for i, t in sorted(q):
        fams.setdefault(hashlib.md5(t.encode()).hexdigest(), i)
    keep = set(fams.values())
    surv = [(i, t) for i, t in q
            if i in keep and not (shingles(t) & ev)]
    cum, bins = 0, {}
    for i, t in sorted(surv):
        n_tok = len(t.strip().split())
        b = (cum) // PACK_BUDGET
        cum += n_tok
        r = bins.setdefault(b, [0, 0, i, i])
        r[0] += 1
        r[1] += n_tok
        r[3] = i
    return {b: tuple(v) for b, v in bins.items()}


def test_pipeline_e2e_curate_matches_python_composition(spark, sf_dir):
    docs = [(r["doc_id"], r["text"])
            for r in load(spark, sf_dir, "documents")
            .select("doc_id", "text").collect()]
    want = _python_curate(docs)
    got = {r["bin_id"]: (r["n_docs"], r["bin_tokens"],
                         r["first_doc"], r["last_doc"])
           for r in pipeline_e2e_curate(spark, sf_dir).collect()}
    assert got == want
    # the pipeline must actually curate: fewer docs than the corpus
    assert sum(v[0] for v in got.values()) < len(docs)


def test_pipeline_e2e_curate_plan_shape(spark, sf_dir):
    from bigarrays_jl_spark.operators.round16 import _curated_survivors
    # stages 1-3 (the packer's eager prefix-sum checkpoint hides
    # upstream plans, so pin them on the survivor stage): the eval
    # bitset screen must broadcast and nothing may cartesian
    surv_plan = (_curated_survivors(spark, sf_dir)
                 ._jdf.queryExecution().executedPlan().toString())
    assert "BroadcastHashJoin" in surv_plan
    assert "CartesianProduct" not in surv_plan
    assert "Exchange SinglePartition" not in surv_plan
    # the packed output itself must not funnel either (prefix-sum, not
    # a whole-table window)
    plan = (pipeline_e2e_curate(spark, sf_dir)
            ._jdf.queryExecution().executedPlan().toString())
    assert "CartesianProduct" not in plan
    assert "Exchange SinglePartition" not in plan


def test_ann_ivfpq_recall_audit_shape_and_monotonicity(spark, sf_dir):
    from bigarrays_jl_spark.operators.similarity import TOP_K
    rows = {r["variant"]: r for r in
            ann_ivfpq_recall_audit(spark, sf_dir).collect()}
    assert set(rows) == {f"ivfpq_nprobe{n}" for n in IVFPQ_NPROBES}
    prev = -1.0
    for n in IVFPQ_NPROBES:
        r = rows[f"ivfpq_nprobe{n}"]
        assert r["n_queries"] == 10
        assert 0 <= r["sum_hits"] <= r["n_queries"] * TOP_K
        assert math.isclose(r["mean_recall"],
                            r["sum_hits"] / (r["n_queries"] * TOP_K))
        # widening the probe set can only add candidates, and ADC
        # scores don't depend on the probe set -> recall is monotone
        # non-decreasing in nprobe
        assert r["mean_recall"] >= prev
        prev = r["mean_recall"]
