"""Round-13 batch-1 tests beyond the registry oracle: python
brute-force twins for each operator plus the plan-shape pins (the
repo-wide no-funnel gate already walks these plans; here we pin the
broadcast/partial-agg shapes specific to each)."""

from collections import Counter, defaultdict

from pyspark.sql import functions as F

from bigarrays_jl_spark.operators.round13 import (LEAK_N,
                                                  cross_source_leakage,
                                                  dedup_cluster_hist,
                                                  lorenz_curve,
                                                  ngram_novelty)
from bigarrays_jl_spark.sources.tables import load


def test_lorenz_matches_python_bruteforce(spark, sf_dir):
    rows = (load(spark, sf_dir, "orders")
            .groupBy("o_custkey")
            .agg(F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint"))
                 .alias("rev")).collect())
    revs = sorted(r.rev for r in rows)
    n, t = len(revs), sum(revs)
    got = {r.decile: (r.n_customers, r.lorenz_cents, r.lorenz_share)
           for r in lorenz_curve(spark, sf_dir).collect()}
    assert set(got) == set(range(1, 11))
    for k in range(1, 11):
        m = k * n // 10
        num = sum(revs[:m])
        assert got[k] == (m, num, num / t)
    # monotone non-decreasing, ends at exactly 1
    shares = [got[k][2] for k in range(1, 11)]
    assert shares == sorted(shares) and shares[-1] == 1.0
    # bottom decile holds less than a tenth of revenue (skew exists)
    assert shares[0] < 0.1


def test_ngram_novelty_matches_python(spark, sf_dir):
    docs = load(spark, sf_dir, "documents").select(
        "doc_id", "source", "text").collect()
    first: dict[str, int] = {}
    for r in sorted(docs, key=lambda r: r.doc_id):
        ws = r.text.split(" ")
        for g in {" ".join(ws[i:i + 3]) for i in range(len(ws) - 2)}:
            first.setdefault(g, r.doc_id)
    per = defaultdict(lambda: [0, 0])
    for r in docs:
        ws = r.text.split(" ")
        for g in {" ".join(ws[i:i + 3]) for i in range(len(ws) - 2)}:
            per[r.source][0] += 1
            per[r.source][1] += first[g] == r.doc_id
    got = {r.source: (r.n_grams, r.n_novel, r.novelty)
           for r in ngram_novelty(spark, sf_dir).collect()}
    assert set(got) == set(per)
    for s, (ng, nn) in per.items():
        assert got[s] == (ng, nn, nn / ng)


def test_cross_source_leakage_matches_python(spark, sf_dir):
    docs = load(spark, sf_dir, "documents").select(
        "source", "text").collect()
    per: dict[str, set] = defaultdict(set)
    for r in docs:
        ws = r.text.split(" ")
        for i in range(len(ws) - (LEAK_N - 1)):
            per[r.source].add(" ".join(ws[i:i + LEAK_N]))
    want = {}
    srcs = sorted(per)
    for i, a in enumerate(srcs):
        for b in srcs[i + 1:]:
            inter = len(per[a] & per[b])
            if inter:
                want[(a, b)] = (inter,
                                inter / len(per[a] | per[b]))
    got = {(r.source_a, r.source_b): (r.n_shared, r.jaccard)
           for r in cross_source_leakage(spark, sf_dir).collect()}
    assert got == want and len(want) > 0


def test_cluster_hist_mass_and_conservation(spark, sf_dir):
    n_docs = load(spark, sf_dir, "documents").count()
    rows = dedup_cluster_hist(spark, sf_dir).collect()
    hist = {r.cluster_size: (r.n_clusters, r.n_removable) for r in rows}
    # the every-7th exact-copy augmentation guarantees mass above 1
    assert any(sz > 1 for sz in hist)
    # conservation: sum(sz * n_clusters) == docs + copies
    n_copies = sum(1 for _ in range(0, n_docs, 7))  # doc_id 0,7,14,...
    total = sum(sz * nc for sz, (nc, _) in hist.items())
    assert total == n_docs + n_copies
    # removable = total - clusters
    assert sum(nr for _, nr in hist.values()) == total - sum(
        nc for nc, _ in hist.values())


def test_round13_plan_shapes(spark, sf_dir):
    from bigarrays_jl_spark.plans.explain import (
        has_partial_aggregation, simple_plan, single_partition_windows)
    lz = lorenz_curve(spark, sf_dir)
    # the decile pick broadcasts 10 rows + 1 totals row — never a sort
    assert not single_partition_windows(lz)
    p = simple_plan(lz)
    assert "CartesianProduct" not in p
    nv = ngram_novelty(spark, sf_dir)
    assert has_partial_aggregation(nv)
    assert not single_partition_windows(nv)
    ch = dedup_cluster_hist(spark, sf_dir)
    assert has_partial_aggregation(ch)
    # two map-side-combined groupBys and nothing else: no funnel stage
    assert "Exchange SinglePartition" not in simple_plan(ch)
