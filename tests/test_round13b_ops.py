"""Round-13 batch-2 tests beyond the registry oracle: python twins."""

from collections import defaultdict

from pyspark.sql import functions as F

from bigarrays_jl_spark.operators.events import SESSION_GAP_MIN
from bigarrays_jl_spark.operators.round13b import (BOILER_K,
                                                   boilerplate_prefixes,
                                                   customer_reorder_gaps,
                                                   session_bounce_rate)
from bigarrays_jl_spark.sources.tables import load


def test_bounce_rate_matches_python(spark, sf_dir):
    # ORDER by the raw microsecond ts (the operator/oracle sort key) but
    # compute gaps on floored seconds (the cast("long") canon) — sorting
    # on the floored value would mis-attribute entries whenever two
    # same-second events' event_id order disagrees with their
    # sub-second order (review finding r13)
    rows = (load(spark, sf_dir, "events")
            .select("user_id", "ts",
                    F.col("ts").cast("long").alias("t"),
                    "event_id", "event_type").collect())
    per_user = defaultdict(list)
    for r in rows:
        per_user[r.user_id].append((r.ts, r.event_id, r.t, r.event_type))
    stats = defaultdict(lambda: [0, 0])       # entry -> [sessions, bounces]
    for evs in per_user.values():
        evs.sort(key=lambda x: (x[0], x[1]))
        sessions = []
        for _ts, eid, t, ty in evs:
            if not sessions or t - sessions[-1][-1][0] > SESSION_GAP_MIN * 60:
                sessions.append([])
            sessions[-1].append((t, eid, ty))
        for sess in sessions:
            stats[sess[0][2]][0] += 1
            stats[sess[0][2]][1] += len(sess) == 1
    got = {r.entry_type: (r.n_sessions, r.n_bounces, r.bounce_rate)
           for r in session_bounce_rate(spark, sf_dir).collect()}
    assert set(got) == set(stats)
    for ty, (ns, nb) in stats.items():
        assert got[ty] == (ns, nb, round(nb / ns, 6))


def test_reorder_gaps_match_python(spark, sf_dir):
    import datetime
    orders = (load(spark, sf_dir, "orders")
              .select("o_custkey", F.col("o_orderdate").cast("date")
                      .alias("d")).collect())
    seg = {r.c_custkey: r.c_mktsegment
           for r in load(spark, sf_dir, "customer")
           .select("c_custkey", "c_mktsegment").collect()}
    per_cust = defaultdict(list)
    epoch = datetime.date(1970, 1, 1)
    for r in orders:
        per_cust[r.o_custkey].append((r.d - epoch).days)
    gaps = defaultdict(list)
    for c, days in per_cust.items():
        days.sort()
        for a, b in zip(days, days[1:]):
            gaps[seg[c]].append(b - a)
    got = {r.c_mktsegment: (r.n_gaps, r.p50_gap_days, r.p90_gap_days)
           for r in customer_reorder_gaps(spark, sf_dir).collect()}
    assert set(got) == set(gaps)
    for s, ds in gaps.items():
        ds.sort()
        n = len(ds)
        p50 = next(d for i, d in enumerate(ds) if 2 * (i + 1) >= n)
        p90 = next(d for i, d in enumerate(ds) if 10 * (i + 1) >= 9 * n)
        assert got[s] == (n, p50, p90)


def test_boilerplate_matches_python(spark, sf_dir):
    docs = load(spark, sf_dir, "documents").select(
        "source", "text").collect()
    import hashlib
    per = defaultdict(lambda: [0, set()])
    for r in docs:
        ws = r.text.split(" ")
        if len(ws) >= BOILER_K:
            ph = hashlib.md5(" ".join(ws[:BOILER_K]).encode()).hexdigest()
            per[ph][0] += 1
            per[ph][1].add(r.source)
    cands = sorted(((n, ph, len(srcs)) for ph, (n, srcs) in per.items()
                    if n > 1), key=lambda x: (-x[0], x[1]))[:20]
    want = [(ph, n, ns) for n, ph, ns in cands]
    got = [(r.ph, r.n_docs, r.n_sources)
           for r in boilerplate_prefixes(spark, sf_dir).collect()]
    # output is top-20 by (n_docs desc, ph) — ordered compare
    assert sorted(got, key=lambda x: (-x[1], x[0])) == want
    assert len(got) > 0


def test_round13b_plan_shapes(spark, sf_dir):
    from bigarrays_jl_spark.plans.explain import (has_partial_aggregation,
                                                  simple_plan,
                                                  single_partition_windows,
                                                  uses_take_ordered)
    br = session_bounce_rate(spark, sf_dir)
    assert not single_partition_windows(br)       # user-keyed only
    assert has_partial_aggregation(br)
    bp = boilerplate_prefixes(spark, sf_dir)
    assert uses_take_ordered(bp)                  # top-20 heap, no sort
    rg = customer_reorder_gaps(spark, sf_dir)
    assert not single_partition_windows(rg)
    assert "CartesianProduct" not in simple_plan(rg)
