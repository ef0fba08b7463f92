"""Round-10 seventh batch: EMA decay, weighted SSSP, clamped inventory
scan, multi-touch attribution, grouped OLS regression."""
import numpy as np

from bigarrays_jl_spark.operators.round10g import (
    ATTR_WINDOW_S, EMA_TAPS, EPOCH_2024, SSSP_ROUNDS, VQ, graph_sssp_lsh,
    q73_ema_decay, q75_stock_runout, q76_attribution, q77_regression_slope)
from bigarrays_jl_spark.operators.similarity import sim_lsh_pairs
from bigarrays_jl_spark.sources.tables import load


def _events(spark, sf_dir):
    rows = load(spark, sf_dir, "events").collect()
    return sorted(rows, key=lambda r: (r["ts"], r["event_id"]))


def test_ema_matches_python(spark, sf_dir):
    got = {r["user_id"]: r["ema"]
           for r in q73_ema_decay(spark, sf_dir).collect()}
    per_user = {}
    for r in _events(spark, sf_dir):
        per_user.setdefault(r["user_id"], []).append(
            int(round(r["value"] * VQ)))
    for u, vs in per_user.items():
        taps = vs[-EMA_TAPS:][::-1]        # newest first
        num = sum(v << (EMA_TAPS - 1 - j) for j, v in enumerate(taps))
        den = sum(1 << (EMA_TAPS - 1 - j) for j in range(len(taps)))
        assert abs(got[u] - num / den / VQ) < 1e-9, u
    assert set(got) == set(per_user)


def test_sssp_matches_python_bellman_ford(spark, sf_dir):
    got = {r["vec_id"]: r["sssp_dist"]
           for r in graph_sssp_lsh(spark, sf_dir).collect()}
    pairs = sim_lsh_pairs(spark, sf_dir).collect()
    edges = {}
    for r in pairs:
        w = int(round((1.0 - r["cosine"]) * VQ)) + 1
        edges.setdefault(r["vec_a"], []).append((r["vec_b"], w))
        edges.setdefault(r["vec_b"], []).append((r["vec_a"], w))
    nodes = sorted(edges)
    seed = nodes[0]
    dist = {n: (0 if n == seed else None) for n in nodes}
    for _ in range(SSSP_ROUNDS):
        nd = dict(dist)
        for u in nodes:
            if dist[u] is None:
                continue
            for v, w in edges[u]:
                c = dist[u] + w
                if nd[v] is None or c < nd[v]:
                    nd[v] = c
        dist = nd
    want = {n: (-1 if d is None else d) for n, d in dist.items()}
    assert got == want
    assert got[seed] == 0
    # weighted distances dominate hop counts: every finite dist >= 1 hop
    assert all(d >= 1 for n, d in got.items() if n != seed and d >= 0)


def test_stock_runout_matches_python(spark, sf_dir):
    got = {r["user_id"]: (r["n_moves"], r["n_stockouts"],
                          r["final_balance"])
           for r in q75_stock_runout(spark, sf_dir).collect()}
    per_user = {}
    for r in _events(spark, sf_dir):
        if r["event_type"] not in ("click", "purchase"):
            continue
        d = int(round(r["value"] * VQ))
        if r["event_type"] == "purchase":
            d = -d
        per_user.setdefault(r["user_id"], []).append(d)
    for u, ds in per_user.items():
        bal, so = 0, 0
        for d in ds:
            nb = bal + d
            if nb < 0:
                so, nb = so + 1, 0
            bal = nb
        assert got[u] == (len(ds), so, bal), u
        assert bal >= 0
    assert set(got) == set(per_user)
    # the clamp actually fired somewhere (else this is a plain sum)
    assert any(v[1] > 0 for v in got.values())


def test_attribution_conserves_covered_cents(spark, sf_dir):
    res = q76_attribution(spark, sf_dir).collect()
    rows = _events(spark, sf_dir)
    views = [(r["user_id"], int(r["ts"].timestamp()))
             for r in rows if r["event_type"] == "view"]
    covered = 0
    n_cov = 0
    for r in rows:
        if r["event_type"] != "purchase":
            continue
        ps = int(r["ts"].timestamp())
        n_t = sum(1 for u, vs in views
                  if u == r["user_id"] and ps - ATTR_WINDOW_S <= vs < ps)
        if n_t:
            covered += int(round(r["value"] * 100))
            n_cov += 1
    assert sum(r["attributed_cents"] for r in res) == covered
    assert sum(r["n_purchases"] for r in res) >= n_cov  # channel overlap
    assert {r["channel"] for r in res} <= {0, 1, 2, 3}
    assert all(r["attributed_cents"] >= 0 for r in res)


def test_regression_matches_numpy(spark, sf_dir):
    got = {r["event_type"]: (r["n"], r["slope_vi_per_s"],
                             r["intercept_vi"])
           for r in q77_regression_slope(spark, sf_dir).collect()}
    per_type = {}
    for r in _events(spark, sf_dir):
        per_type.setdefault(r["event_type"], []).append(
            (int(r["ts"].timestamp()) - EPOCH_2024,
             int(round(r["value"] * VQ))))
    for t, xy in per_type.items():
        x = np.array([a for a, _ in xy], dtype=np.float64)
        y = np.array([b for _, b in xy], dtype=np.float64)
        slope, intercept = np.polyfit(x, y, 1)
        n, gs, gi = got[t]
        assert n == len(xy)
        assert abs(gs - slope) / abs(slope) < 1e-6, t
        assert abs(gi - intercept) / abs(intercept) < 1e-6, t
    assert set(got) == set(per_type)


def test_windowed_clamp_identity_equals_stateful_scan(spark, sf_dir):
    """The zero-floor closed form (prefix - min(0, running-min)) must
    reproduce the applyInPandas scan exactly — balances AND stockout
    counts (a stockout = a new strict running minimum below zero)."""
    from bigarrays_jl_spark.operators.round10g import q75_windowed
    a = {r["user_id"]: (r["n_moves"], r["n_stockouts"],
                        r["final_balance"])
         for r in q75_stock_runout(spark, sf_dir).collect()}
    b = {r["user_id"]: (r["n_moves"], r["n_stockouts"],
                        r["final_balance"])
         for r in q75_windowed(spark, sf_dir).collect()}
    assert a == b
