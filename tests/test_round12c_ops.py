"""Round-12 batch-3 tests beyond the registry oracle."""

from collections import Counter, defaultdict

from pyspark.sql import functions as F

from bigarrays_jl_spark.operators.round12c import (TRI_TOPK,
                                                   basket_triples,
                                                   leadtime_quantiles)
from bigarrays_jl_spark.sources.tables import load


def test_leadtime_matches_python_percentiles(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    o = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority")
    rows = (li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
            .select("o_orderpriority",
                    F.datediff(F.col("l_shipdate").cast("date"),
                               F.col("o_orderdate").cast("date"))
                    .alias("d")).collect())
    per = defaultdict(list)
    for r in rows:
        per[r.o_orderpriority].append(r.d)
    got = {r.o_orderpriority: (r.n_lineitems, r.p50_days, r.p90_days)
           for r in leadtime_quantiles(spark, sf_dir).collect()}
    assert set(got) == set(per)
    for p, ds in per.items():
        ds.sort()
        n = len(ds)
        # repo quantile rule: smallest d with den*cum >= num*tot
        p50 = next(d for i, d in enumerate(ds) if 2 * (i + 1) >= n)
        p90 = next(d for i, d in enumerate(ds) if 10 * (i + 1) >= 9 * n)
        assert got[p] == (n, p50, p90)


def test_triples_match_python_bruteforce(spark, sf_dir):
    li = (load(spark, sf_dir, "lineitem")
          .join(load(spark, sf_dir, "part")
                .select("p_partkey", "p_brand"),
                F.col("l_partkey") == F.col("p_partkey"))
          .select("l_orderkey", "p_brand").distinct().collect())
    baskets = defaultdict(set)
    for r in li:
        baskets[r.l_orderkey].add(r.p_brand)
    sup = Counter()
    from itertools import combinations
    for items in baskets.values():
        for tri in combinations(sorted(items), 3):
            sup[tri] += 1
    want = sorted(((s, *t) for t, s in sup.items()),
                  key=lambda r: (-r[0], r[1], r[2], r[3]))[:TRI_TOPK]
    got = [(r.triple_sup, r.brand_a, r.brand_b, r.brand_c)
           for r in basket_triples(spark, sf_dir).collect()]
    got.sort(key=lambda r: (-r[0], r[1], r[2], r[3]))
    assert got == want and len(got) == TRI_TOPK


def test_t_closeness_matches_python(spark, sf_dir):
    from bigarrays_jl_spark.operators.round12d import (T_BINS,
                                                       q99_t_closeness)
    rows = (load(spark, sf_dir, "customer")
            .select("c_mktsegment", "c_nationkey",
                    F.round(F.col("c_acctbal") * 100).cast("bigint")
                    .alias("cents")).collect())
    lo = min(r.cents for r in rows)
    hi = max(r.cents for r in rows)
    ng = len(rows)
    width = (hi - lo) / T_BINS + 1
    gdist = Counter()
    cdist = defaultdict(Counter)
    for r in rows:
        b = int((r.cents - lo) // width)
        gdist[b] += 1
        cdist[(r.c_mktsegment, r.c_nationkey)][b] += 1
    per_seg = defaultdict(list)
    for (seg, nat), cnt in cdist.items():
        nc = sum(cnt.values())
        s = cum_c = cum_g = 0
        for b in range(T_BINS - 1):
            cum_c += cnt.get(b, 0)
            cum_g += gdist.get(b, 0)
            s += abs(cum_c * ng - cum_g * nc)
        per_seg[seg].append(s / (nc * ng * (T_BINS - 1)))
    got = {r.c_mktsegment: (r.n_classes, r.max_t, r.n_violating)
           for r in q99_t_closeness(spark, sf_dir).collect()}
    assert set(got) == set(per_seg)
    for seg, ts in per_seg.items():
        import pytest as _pt
        assert got[seg][0] == len(ts)
        assert got[seg][1] == _pt.approx(round(max(ts), 6), abs=1e-6)
        assert got[seg][2] == sum(1 for t in ts if t > 0.2)


def test_sketch_jaccard_estimates_within_kmv_band(spark, sf_dir):
    from bigarrays_jl_spark.operators.round12d import sketch_jaccard
    rows = sketch_jaccard(spark, sf_dir).collect()
    assert rows
    for r in rows:
        # k=64 coincidence estimator: ±3σ ≈ ±3·sqrt(J(1−J)/k) plus
        # small-sample slack — catches a wrong estimator, not noise
        import math
        sigma = math.sqrt(max(r.jaccard_exact * (1 - r.jaccard_exact),
                              0.01) / 64)
        assert abs(r.jaccard_est - r.jaccard_exact) <= 3.5 * sigma + 0.02, r
