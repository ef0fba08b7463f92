"""Focused pins for round-17 optimization rewrites: each changed
operator internal is checked against the definition it replaced
(value-identical by construction — these tests fail loudly if a later
edit breaks the equivalence argument)."""

import pytest
from pyspark.sql import functions as F

from bigarrays_jl_spark.sources.tables import load


def test_bloom_survivor_chain_matches_k_hit_rule(spark):
    """The chained-semi-probe screen == the explode+count k_hit == K
    rule, including a gram that hits only SOME of its K probes (a
    partial hit must NOT survive)."""
    from bigarrays_jl_spark.operators.round15 import (BLOOM_K,
                                                      _bloom_survivors,
                                                      bloom_bit_col,
                                                      bloom_bit_lit,
                                                      bloom_screen_counts)
    grams = spark.createDataFrame(
        [(1, "aaa x"), (1, "bbb y"), (2, "ccc z"), (3, "aaa x")],
        "doc_id long, s string")
    # bitset = full K bits of 'aaa x' plus ONLY the j=0 bit of
    # 'bbb y' (a deliberate partial hit) — nothing for 'ccc z'
    jarr = F.array(*[F.lit(j) for j in range(BLOOM_K)])
    full = (grams.filter(F.col("s") == "aaa x")
            .select(F.explode(jarr).alias("j"), "s")
            .select("j", bloom_bit_col().alias("bit")))
    partial = (grams.filter(F.col("s") == "bbb y")
               .select(F.lit(0).alias("j"), "s")
               .select("j", bloom_bit_col().alias("bit")))
    bits = full.unionByName(partial).distinct()

    surv = {(r.doc_id, r.s)
            for r in _bloom_survivors(grams, bits).collect()}
    assert surv == {(1, "aaa x"), (3, "aaa x")}

    # the replaced definition, verbatim: explode K ways, count hits
    probe = (grams.select("doc_id", "s", F.explode(jarr).alias("j"))
             .select("doc_id", "s", "j", bloom_bit_col().alias("bit")))
    old = {(r.doc_id, r.s) for r in
           (probe.join(bits, ["j", "bit"])
            .groupBy("doc_id", "s").agg(F.count("*").alias("k"))
            .filter(F.col("k") == BLOOM_K)).collect()}
    assert surv == old

    counts = {r.doc_id: r.n_bloom_pos
              for r in bloom_screen_counts(grams, bits).collect()}
    assert counts == {1: 1, 3: 1}


def test_bloom_bit_lit_equals_bloom_bit_col(spark):
    """The literal-j probe hash must stay byte-identical to the
    exploded-j build hash for every j — the screen's correctness rests
    on both sides hashing the same string."""
    from bigarrays_jl_spark.operators.round15 import (BLOOM_K,
                                                      bloom_bit_col,
                                                      bloom_bit_lit)
    s = spark.createDataFrame([("some gram",), ("another 8 gram here",)],
                              "s string")
    rows = s.select(
        "s",
        *[bloom_bit_lit(j).alias(f"lit{j}") for j in range(BLOOM_K)],
    ).collect()
    built = (s.select(F.explode(F.array(
        *[F.lit(j) for j in range(BLOOM_K)])).alias("j"), "s")
        .select("s", "j", bloom_bit_col().alias("bit")).collect())
    want = {(r.s, r.j): r.bit for r in built}
    for r in rows:
        for j in range(BLOOM_K):
            assert getattr(r, f"lit{j}") == want[(r.s, j)]


def test_ann_recall_audit_matches_naive_legs(spark, sf_dir):
    """The single-scan audit == per-leg rank-and-join recomputation
    from the registry's own ANN canons."""
    from bigarrays_jl_spark.operators.round14b import ann_recall_audit
    from bigarrays_jl_spark.operators.similarity import (
        TOP_K, ann_cosine_topk, ann_ivf_nprobe2_topk, ann_ivf_topk)
    brute = {(r.qid, r.vec_id)
             for r in ann_cosine_topk(spark, sf_dir).collect()}
    qids = {q for q, _ in brute}

    def naive(approx_rows):
        hits = {}
        for r in approx_rows:
            if (r.qid, r.vec_id) in brute:
                hits[r.qid] = hits.get(r.qid, 0) + 1
        per = [hits.get(q, 0) for q in qids]
        return (len(per), sum(per),
                round(sum(per) / (len(per) * TOP_K), 12),
                min(per) / TOP_K)

    want = {
        "ivf_nprobe1": naive(ann_ivf_topk(spark, sf_dir).collect()),
        "ivf_nprobe2": naive(ann_ivf_nprobe2_topk(spark, sf_dir).collect()),
    }
    got = {r.variant: (r.n_queries, r.sum_hits,
                       round(r.mean_recall, 12), r.min_recall)
           for r in ann_recall_audit(spark, sf_dir).collect()}
    assert got == want


def test_q70_q72_histogram_fold_matches_row_fold(spark, sf_dir):
    """The weighted histogram census == the per-row census it
    replaced (count/outlier/winsorized sums fold identically)."""
    from bigarrays_jl_spark.operators.round10e import q70_mad_outliers
    from bigarrays_jl_spark.operators.round10f import q72_winsorized_mean
    li = [(r.l_returnflag, int(round(r.l_extendedprice * 100)))
          for r in load(spark, sf_dir, "lineitem")
          .select("l_returnflag", "l_extendedprice").collect()]

    q70 = {r.l_returnflag: r for r in q70_mad_outliers(spark, sf_dir).collect()}
    q72 = {r.l_returnflag: r for r in q72_winsorized_mean(spark, sf_dir).collect()}
    flags = {f for f, _ in li}
    assert set(q70) == flags and set(q72) == flags
    for f in flags:
        cents = [c for ff, c in li if ff == f]
        r70, r72 = q70[f], q72[f]
        assert r70.n == len(cents) == r72.n
        med = int(round(r70.median_price * 100))
        mad = int(round(r70.mad_price * 100))
        assert r70.n_outliers == sum(
            1 for c in cents if 2 * abs(c - med) > 3 * mad)
        lo = int(round(r72.fence_lo * 100))
        hi = int(round(r72.fence_hi * 100))
        assert r72.n_clamped == sum(1 for c in cents if c < lo or c > hi)
        wm = sum(max(min(c, hi), lo) for c in cents) / len(cents) / 100.0
        assert r72.winsorized_mean == pytest.approx(wm, rel=1e-12)


def test_span_excise_single_pass_census(spark, sf_dir):
    """The one-pass census fold (countDistinct(pos) + countDistinct(p)
    over the exploded coverage) == the two-branch form it replaced
    (ndup groupBy + cov explode/distinct/groupBy + two join-backs) —
    and the executed plan carries exactly ONE left-outer join-back,
    proving the branches actually collapsed."""
    from pyspark.sql import Window as W
    from bigarrays_jl_spark.functions.expressions import (shingle_array,
                                                          tokens)
    from bigarrays_jl_spark.operators.dedup import RUN_LEN
    from bigarrays_jl_spark.operators.round17 import dedup_span_excise

    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    toks = docs.select("doc_id", tokens().alias("t"))
    wins = (toks.filter(F.size("t") >= RUN_LEN)
            .select("doc_id",
                    F.posexplode(shingle_array("t", RUN_LEN))
                     .alias("pos0", "w"))
            .select("doc_id", (F.col("pos0") + 1).alias("pos"),
                    F.md5("w").alias("h")))
    rn = F.row_number().over(W.partitionBy("h").orderBy("doc_id", "pos"))
    nc = (wins.withColumn("rn", rn).filter(F.col("rn") > 1)
          .select("doc_id", "pos"))
    # the replaced two-branch definition
    ndup = nc.groupBy("doc_id").agg(F.count("*").alias("n_dup_win"))
    cov = (nc.select("doc_id",
                     F.explode(F.sequence(
                         F.col("pos"),
                         F.col("pos") + F.lit(RUN_LEN - 1))).alias("p"))
           .distinct()
           .groupBy("doc_id").agg(F.count("*").alias("n_excised")))
    old = {(r["doc_id"]): (r["n_dup_win"], r["n_excised"])
           for r in ndup.join(cov, "doc_id", "outer").fillna(0).collect()}
    got = {r["doc_id"]: (r["n_dup_win"], r["n_excised"])
           for r in dedup_span_excise(spark, sf_dir)
           .filter(F.col("n_dup_win") > 0).collect()}
    assert got == {d: v for d, v in old.items() if v[0] > 0}

    plan = (dedup_span_excise(spark, sf_dir)
            ._jdf.queryExecution().executedPlan().toString())
    assert plan.count("LeftOuter") == 1, plan
