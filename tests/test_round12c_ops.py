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
