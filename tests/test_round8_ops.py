"""Round-8 operator semantics: k-NN-graph analytics (PageRank),
time-series gap-fill, BM25 retrieval, blocked fuzzy string join."""

from pyspark.sql import functions as F

from bigarrays_jl_spark.functions.expressions import tokens
from bigarrays_jl_spark.operators.graph import (
    DAMPING, K_NN, RANK_DIGITS, graph_degree_stats, graph_knn_edges,
    graph_pagerank)
from bigarrays_jl_spark.operators.retrieval import (
    BM25_QUERY, FUZZY_MAX_DIST, fuzzy_name_pairs, text_bm25)
from bigarrays_jl_spark.operators.temporal import events_gapfill
from bigarrays_jl_spark.plans.explain import (formatted_plan,
                                              has_broadcast_join)


def test_knn_edges_regular_graph(spark, sf_dir):
    rows = graph_knn_edges(spark, sf_dir).collect()
    by_src = {}
    for r in rows:
        assert r["src"] != r["dst"], "self-loop"
        by_src.setdefault(r["src"], []).append(r)
    for src, es in by_src.items():
        assert sorted(e["rank"] for e in es) == list(range(1, K_NN + 1))
        # rank order follows cosine desc (ties broken by dst asc)
        es = sorted(es, key=lambda e: e["rank"])
        for a, b in zip(es, es[1:]):
            assert (a["cosine"], -a["dst"]) >= (b["cosine"], -b["dst"])


def test_degree_histogram_accounts_every_node(spark, sf_dir):
    hist = graph_degree_stats(spark, sf_dir).collect()
    n_nodes = graph_knn_edges(spark, sf_dir).select("src").distinct().count()
    assert sum(r["n_nodes"] for r in hist) == n_nodes
    # total in-degree mass equals total edges (= nodes * K_NN)
    assert sum(r["in_deg"] * r["n_nodes"] for r in hist) == n_nodes * K_NN


def test_pagerank_is_a_probability_vector(spark, sf_dir):
    rows = graph_pagerank(spark, sf_dir).collect()
    n = len(rows)
    total = sum(r["pagerank"] for r in rows)
    # out-degree is exactly K_NN for every node (no dangling mass), so
    # rank mass is conserved up to the per-iteration RANK_DIGITS rounding
    assert abs(total - 1.0) < n * 10 ** -(RANK_DIGITS - 2)
    assert all(r["pagerank"] > 0 for r in rows)
    # a node nobody links to holds exactly the teleport floor (1-d)/N
    hist = {r["in_deg"]: r["n_nodes"]
            for r in graph_degree_stats(spark, sf_dir).collect()}
    if hist.get(0):
        floor = round((1.0 - DAMPING) / n, RANK_DIGITS)
        assert min(r["pagerank"] for r in rows) == floor


def test_gapfill_grid_is_dense_and_conserves_counts(spark, sf_dir):
    from bigarrays_jl_spark.sources.tables import load
    rows = events_gapfill(spark, sf_dir).collect()
    e = load(spark, sf_dir, "events")   # ts normalization canon
    span = e.agg(
        F.date_trunc("hour", F.min("ts")).alias("lo"),
        F.date_trunc("hour", F.max("ts")).alias("hi")).first()
    n_hours = int((span["hi"] - span["lo"]).total_seconds() // 3600) + 1
    by_type = {}
    for r in rows:
        by_type.setdefault(r["event_type"], []).append(r)
    per_type_counts = {r["event_type"]: r["n"] for r in
                       e.groupBy("event_type").agg(F.count("*").alias("n"))
                        .collect()}
    for t, trs in by_type.items():
        assert len(trs) == n_hours, (t, len(trs), n_hours)
        assert sum(r["n_events"] for r in trs) == per_type_counts[t]
        # forward fill: once a value is observed, it never goes NULL again
        seen = False
        for r in sorted(trs, key=lambda r: r["hour_start"]):
            if r["avg_value_ffill"] is not None:
                seen = True
            assert not (seen and r["avg_value_ffill"] is None)
            # zero-filled hours exist only as gap rows
            if r["n_events"] == 0 and not seen:
                assert r["avg_value_ffill"] is None


def test_bm25_matches_exactly_the_matching_docs(spark, sf_dir):
    out = text_bm25(spark, sf_dir).collect()
    from bigarrays_jl_spark.sources.tables import load
    d = load(spark, sf_dir, "documents")
    expected = (d.select("doc_id", F.explode(tokens()).alias("t"))
                 .filter(F.col("t").isin(*BM25_QUERY))
                 .select("doc_id").distinct().count())
    assert len(out) == expected
    for r in out:
        assert 1 <= r["n_terms_matched"] <= len(BM25_QUERY)
        assert r["bm25"] > 0


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1,
                           prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def test_fuzzy_pairs_exact_vs_bruteforce(spark, sf_dir):
    """PassJoin candidates + verify must equal the brute-force
    all-pairs Levenshtein join on the distinct names — EXACTLY."""
    from bigarrays_jl_spark.sources.tables import load
    got = {(r["name_a"], r["name_b"]): r["dist"]
           for r in fuzzy_name_pairs(spark, sf_dir).collect()}
    names = sorted(r["p_name"] for r in
                   load(spark, sf_dir, "part").select("p_name")
                   .distinct().collect())
    want = {}
    for i, a in enumerate(names):
        for b in names[i + 1:]:
            d = _lev(a, b)
            if d <= FUZZY_MAX_DIST:
                want[(a, b)] = d
    assert got == want
    assert want, "calibrated part-name vocab must yield near-matches"


def test_fuzzy_candidates_scale_linearly(spark, sf_dir):
    """The round-8 weak spot: a fixed-vocabulary block key made
    candidate pairs grow quadratically with the corpus.  PassJoin keys
    derive from the names themselves, so on a diverse corpus with
    near-pairs planted proportionally, doubling the names must roughly
    double (never square) the candidate count."""
    import random

    from bigarrays_jl_spark.operators.retrieval import passjoin_candidates
    rng = random.Random(20260814)
    alpha = "abcdefghijklmnopqrstuvwxyz"

    def corpus(n):
        base = ["".join(rng.choice(alpha) for _ in range(20))
                for _ in range(n)]
        near = [s[:7] + rng.choice(alpha) + s[8:] for s in base[: n // 10]]
        return list(dict.fromkeys(base + near))

    counts = {}
    for n in (300, 600):
        names = spark.createDataFrame([(s,) for s in corpus(n)], ["name"])
        counts[n] = passjoin_candidates(names).count()
    assert counts[600] > 0
    # linear ⇒ ratio ≈ 2 (+ noise); quadratic blocking would give ≈ 4
    assert counts[600] / max(counts[300], 1) < 3.0, counts


def test_round8_plan_shapes(spark, sf_dir):
    # k-NN construction broadcasts the (capped) query side — the demo
    # stand-in for the LSH/IVF discovery path — and PageRank's
    # iteration joins must never degenerate to a cartesian
    for op in (graph_knn_edges, graph_pagerank, text_bm25):
        plan = formatted_plan(op(spark, sf_dir))
        assert "CartesianProduct" not in plan, (op.__name__, plan)
    assert has_broadcast_join(text_bm25(spark, sf_dir))
    # fuzzy join is an equi-join on the block key, not all-pairs
    plan = formatted_plan(fuzzy_name_pairs(spark, sf_dir))
    assert "CartesianProduct" not in plan, plan


def test_triangle_stats_match_bruteforce(spark, sf_dir):
    from bigarrays_jl_spark.operators.graph import graph_triangle_stats
    edges = graph_knn_edges(spark, sf_dir).collect()
    adj = {}
    und = set()
    for r in edges:
        a, b = sorted((r["src"], r["dst"]))
        und.add((a, b))
    for a, b in und:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    tri = sum(1 for a, b in und for c in (adj[a] & adj[b]) if c > b)
    wedges = sum(len(v) * (len(v) - 1) // 2 for v in adj.values())
    row = graph_triangle_stats(spark, sf_dir).first()
    assert row["n_triangles"] == tri
    assert row["n_wedges"] == wedges
    if wedges:
        assert abs(row["global_clustering"] - 3 * tri / wedges) < 1e-6


def test_interpolate_between_observations(spark, sf_dir):
    from bigarrays_jl_spark.operators.temporal import events_interpolate
    rows = events_interpolate(spark, sf_dir).collect()
    by_type = {}
    for r in rows:
        by_type.setdefault(r["event_type"], []).append(r)
    for trs in by_type.values():
        trs.sort(key=lambda r: r["hour_start"])
        obs = [i for i, r in enumerate(trs) if r["n_events"] > 0]
        first, last = obs[0], obs[-1]
        for i, r in enumerate(trs):
            v = r["avg_value_interp"]
            if i < first or i > last:
                assert v is None            # no extrapolation
            else:
                assert v is not None
                if r["n_events"] == 0:      # strictly inside a gap:
                    # bounded by the neighboring observations
                    lo = max(j for j in obs if j < i)
                    hi = min(j for j in obs if j > i)
                    a = trs[lo]["avg_value_interp"]
                    b = trs[hi]["avg_value_interp"]
                    assert min(a, b) - 1e-9 <= v <= max(a, b) + 1e-9


def test_multijoin_plans_broadcast_dims(spark, sf_dir):
    from bigarrays_jl_spark.operators.multijoin import (
        q47_region_supplier_volume, q48_nation_trade_flows,
        q49_market_share)
    for op in (q47_region_supplier_volume, q48_nation_trade_flows,
               q49_market_share):
        df = op(spark, sf_dir)
        plan = formatted_plan(df)
        assert "CartesianProduct" not in plan, (op.__name__, plan)
        assert has_broadcast_join(df), op.__name__
        assert df.count() > 0, op.__name__


def test_volume_analytics_match_closed_form(spark, sf_dir):
    import numpy as np
    from bigarrays_jl_spark.operators.volume_analytics import (
        HIST_BUCKET, volume_histogram, volume_mip_projection)
    x, y, z = np.meshgrid(np.arange(64), np.arange(64), np.arange(64),
                          indexing="ij")
    arr = (x * 31 + y * 7 + z) % 256
    hist = {r["bucket"]: r for r in volume_histogram(spark, sf_dir).collect()}
    assert sum(r["n_voxels"] for r in hist.values()) == 64 ** 3
    counts = np.bincount((arr // HIST_BUCKET).ravel())
    for b, r in hist.items():
        assert r["n_voxels"] == counts[b]
        assert b * HIST_BUCKET <= r["min_v"] <= r["max_v"] < (b + 1) * HIST_BUCKET
    proj = volume_mip_projection(spark, sf_dir).collect()
    assert len(proj) == 64 * 64
    sl = arr[:, :, 16:48]
    for r in proj[:50]:
        col = sl[r["x"], r["y"]]
        assert r["max_v"] == col.max()
        assert abs(r["mean_v"] - col.mean()) < 1e-9


def test_apply_changes_merge_semantics(spark, sf_dir):
    from bigarrays_jl_spark.operators.mutation import (
        INSERT_OFFSET, pipeline_apply_changes)
    from bigarrays_jl_spark.sources.tables import load
    base = {r["doc_id"]: r for r in
            load(spark, sf_dir, "documents").collect()}
    merged = {r["doc_id"]: r for r in
              pipeline_apply_changes(spark, sf_dir).collect()}
    for did, b in base.items():
        if did % 17 == 0:
            assert did not in merged                     # deleted
        elif did % 10 == 0:
            m = merged[did]                              # updated
            assert m["last_op"] == "update"
            assert m["source"] == "curated"
            assert m["n_chars"] == b["n_chars"] + 1
        else:
            m = merged[did]                              # untouched
            assert m["last_op"] == "keep"
            assert m["source"] == b["source"]
        if did % 25 == 0:                                # inserted twin
            m = merged[did + INSERT_OFFSET]
            assert m["last_op"] == "insert"
            assert m["source"] == "synthetic"
            assert m["n_chars"] == b["n_chars"]
    n_del = sum(1 for d in base if d % 17 == 0)
    n_ins = sum(1 for d in base if d % 25 == 0)
    assert len(merged) == len(base) - n_del + n_ins


def test_debounce_matches_greedy_chain_walk(spark, sf_dir):
    from bigarrays_jl_spark.operators.debounce import (DEBOUNCE_S,
                                                       events_debounce)
    from bigarrays_jl_spark.sources.tables import load
    events = load(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", "ts").collect()
    streams = {}
    for r in events:
        streams.setdefault((r["user_id"], r["event_type"]), []).append(r)
    import datetime as dt

    def epoch(ts):
        # whole-second floor — the engines' gap canon (Spark cast-long /
        # DuckDB floor(epoch_us/1e6)) truncates BEFORE differencing, so
        # the walk must too: an exact gap of 300.05 s can be a truncated
        # gap of exactly 300 (same burst), and comparing fractional
        # seconds here would diverge from the operator under test
        return int(ts.replace(tzinfo=dt.timezone.utc).timestamp())

    expected = set()
    for rs in streams.values():
        rs.sort(key=lambda r: (r["ts"], r["event_id"]))
        prev = None
        for r in rs:
            # chain semantics: the burst extends while each event is
            # within DEBOUNCE_S of the PREVIOUS event (kept or not)
            if prev is None or epoch(r["ts"]) - prev > DEBOUNCE_S:
                expected.add(r["event_id"])
            prev = epoch(r["ts"])
    kept = {r["event_id"] for r in events_debounce(spark, sf_dir).collect()}
    assert kept == expected


def test_journeys_prefix_semantics(spark, sf_dir):
    from bigarrays_jl_spark.operators.journeys import (JOURNEY_LEN, SEP,
                                                       events_journeys)
    from bigarrays_jl_spark.sources.tables import load
    rows = events_journeys(spark, sf_dir).collect()
    events = load(spark, sf_dir, "events").select(
        "user_id", "event_type", "ts", "event_id").collect()
    streams = {}
    for r in events:
        streams.setdefault(r["user_id"], []).append(r)
    expected = {}
    for rs in streams.values():
        rs.sort(key=lambda r: (r["ts"], r["event_id"]))
        j = SEP.join(r["event_type"] for r in rs[:JOURNEY_LEN])
        expected[j] = expected.get(j, 0) + 1
    got = {r["journey"]: r["n_users"] for r in rows}
    assert got == expected
    n_users = sum(expected.values())
    for r in rows:
        assert r["journey_len"] == min(JOURNEY_LEN,
                                       r["journey"].count(SEP) + 1)
        assert abs(r["share"] - r["n_users"] / n_users) < 1e-12


def test_mutation_debounce_journeys_plan_shapes(spark, sf_dir):
    # merge = key-partitioned full-outer (no broadcast assumption, no
    # cartesian); debounce windows partition by (user, type) — neither
    # may funnel data through a SinglePartition exchange
    from bigarrays_jl_spark.operators.debounce import events_debounce
    from bigarrays_jl_spark.operators.journeys import events_journeys
    from bigarrays_jl_spark.operators.mutation import pipeline_apply_changes
    from bigarrays_jl_spark.plans.explain import simple_plan
    for op in (pipeline_apply_changes, events_debounce):
        plan = simple_plan(op(spark, sf_dir))
        assert "SinglePartition" not in plan, (op.__name__, plan)
        assert "CartesianProduct" not in plan, (op.__name__, plan)
    # journeys legitimately carries ONE SinglePartition exchange: the
    # global n_users scalar, fed by partial_count so only
    # one-row-per-task crosses it (the broadcast-stats pattern
    # text_doc_freq uses); everything row-scale stays hash-partitioned
    plan = simple_plan(events_journeys(spark, sf_dir))
    assert "CartesianProduct" not in plan, plan
    assert plan.count("SinglePartition") == 1, plan
    assert "partial_count" in plan, plan


def test_heavy_hitters_estimation_quality(spark, sf_dir):
    from bigarrays_jl_spark.operators.estimation import (HH_MIN_FRAC,
                                                         text_heavy_hitters)
    from bigarrays_jl_spark.sources.tables import load
    rows = text_heavy_hitters(spark, sf_dir).collect()
    assert rows, "the synthetic vocab must produce heavy hitters"
    n_docs = load(spark, sf_dir, "documents").count()
    for r in rows:
        assert r["doc_freq"] >= HH_MIN_FRAC * n_docs
        assert r["est_doc_freq"] % 4 == 0          # 25% sample scale-up
    # the point of the operator: the estimate is good for heavy hitters
    # (dense terms sample well) — every row's tolerance boolean holds
    assert all(r["within_tol"] for r in rows)


def test_fuzzy_passjoin_exact_on_adversarial_corpus(spark):
    """PassJoin must stay an exact superset on the nasty cases the part
    corpus never exercises: the empty string, sub-segment-length (< D+1)
    names routed through the short block, cross-length pairs at exactly
    the threshold, and dist-4 pairs that must NOT appear."""
    import random

    from pyspark.sql import functions as F
    from bigarrays_jl_spark.operators.retrieval import (FUZZY_MAX_DIST,
                                                        passjoin_candidates)
    rng = random.Random(99)
    corpus = ["", "a", "ab", "abc", "abcd", "abcde", "abcdefg",
              "xbcdefg", "abzzefg", "abcdzzz",          # dist exactly 3/4
              "kitten", "sitting", "saturday", "sunday",
              "flaw", "lawn"]
    corpus += ["".join(rng.choice("abcdef")
                       for _ in range(rng.randint(4, 20)))
               for _ in range(30)]
    corpus = sorted(set(corpus))
    names = spark.createDataFrame([(s,) for s in corpus], ["name"])
    got = {(r["name_a"], r["name_b"]): r["dist"]
           for r in passjoin_candidates(names)
           .withColumn("dist", F.levenshtein("name_a", "name_b"))
           .filter(F.col("dist") <= FUZZY_MAX_DIST)
           .select("name_a", "name_b", "dist").collect()}
    want = {}
    for i, a in enumerate(corpus):
        for b in corpus[i + 1:]:
            d = _lev(a, b)
            if d <= FUZZY_MAX_DIST:
                want[(a, b)] = d
    assert got == want
    # the edge classes actually fired
    assert ("", "abc") in want          # short-block pair incl. empty
    assert ("abcd", "abcdefg") in want  # cross-length at exactly dist 3
    assert all(_lev(a, b) <= FUZZY_MAX_DIST for a, b in got)
