"""Round-12 operator tests beyond the registry oracle: independent
python recomputations (the DuckDB twins share query STRUCTURE with the
Spark side; these share nothing)."""

import hashlib
from collections import Counter, defaultdict

import pytest
from pyspark.sql import functions as F

from bigarrays_jl_spark.operators.round11d import HASH_BITS, KMV_K
from bigarrays_jl_spark.operators.round12 import (
    day_funnel_conversion, q98_fano_burstiness,
    sketch_union_distinct, text_tfidf_topk)
from bigarrays_jl_spark.sources.tables import load


def _h60(uid) -> int:
    return int(hashlib.md5(str(uid).encode()).hexdigest()[:15], 16)


def test_sketch_union_matches_python_kmv(spark, sf_dir):
    rows = (load(spark, sf_dir, "events")
            .select("event_type", "user_id").distinct().collect())
    by_type = defaultdict(set)
    for r in rows:
        by_type[r.event_type].add(r.user_id)
    got = {(r.type_a, r.type_b): (r.n_exact, r.kmv_estimate)
           for r in sketch_union_distinct(spark, sf_dir).collect()}
    types = sorted(by_type)
    assert len(got) == len(types) * (len(types) - 1) // 2
    for i, ta in enumerate(types):
        for tb in types[i + 1:]:
            mins_a = sorted(_h60(u) for u in by_type[ta])[:KMV_K]
            mins_b = sorted(_h60(u) for u in by_type[tb])[:KMV_K]
            union = sorted(set(mins_a) | set(mins_b))
            exact = len(by_type[ta] | by_type[tb])
            if len(union) >= KMV_K:
                est = (KMV_K - 1) / (union[KMV_K - 1] / 2 ** HASH_BITS)
            else:
                est = float(exact)
            n, e = got[(ta, tb)]
            assert n == exact
            assert e == pytest.approx(round(est, 4), abs=1e-4)
            # the merged estimate must actually estimate: within 40% of
            # truth at k=64 (3-sigma of the KMV error bound 1/sqrt(k-1))
            assert abs(e - exact) / exact < 0.40


def test_tfidf_topk_matches_python_for_one_doc(spark, sf_dir):
    import math
    docs = {r.doc_id: r.text
            for r in load(spark, sf_dir, "documents")
            .select("doc_id", "text").collect()}
    toks = {d: [t for t in txt.strip().lower().split() if t]
            for d, txt in docs.items()}
    df = Counter()
    for terms in toks.values():
        df.update(set(terms))
    n_docs = len([t for t in toks.values() if t])
    target = sorted(toks)[0]
    tf = Counter(toks[target])
    scored = sorted(((round(c * math.log(n_docs / df[t]), 6), t)
                     for t, c in tf.items()),
                    key=lambda p: (-p[0], p[1]))[:3]
    got = sorted(
        ((r.tfidf, r.term) for r in text_tfidf_topk(spark, sf_dir)
         .filter(F.col("doc_id") == target).collect()),
        key=lambda p: (-p[0], p[1]))
    assert [(pytest.approx(s, abs=1e-6), t) for s, t in scored] == got


def test_fano_matches_python(spark, sf_dir):
    rows = (load(spark, sf_dir, "events")
            .select("event_type", F.col("ts").cast("long").alias("sec"))
            .collect())
    cells = Counter((r.event_type, r.sec // 3600) for r in rows)
    per_type = defaultdict(list)
    for (t, _h), c in cells.items():
        per_type[t].append(c)
    got = {r.event_type: (r.n_hours, r.mean_per_hour, r.fano)
           for r in q98_fano_burstiness(spark, sf_dir).collect()}
    assert set(got) == set(per_type)
    for t, cs in per_type.items():
        n, s, ss = len(cs), sum(cs), sum(c * c for c in cs)
        mean = s / n
        fano = (n * ss - s * s) / (n * s)
        assert got[t][0] == n
        assert got[t][1] == pytest.approx(round(mean, 6), abs=1e-6)
        assert got[t][2] == pytest.approx(round(fano, 6), abs=1e-6)


def test_day_funnel_matches_python_simulation(spark, sf_dir):
    rows = (load(spark, sf_dir, "events")
            .select("user_id",
                    F.col("ts").cast("long").alias("sec"), "event_type")
            .collect())
    by_ud = defaultdict(list)
    for r in rows:
        by_ud[(r.user_id, r.sec // 86400)].append((r.sec, r.event_type))
    n_ud, n_v, n_c, n_p = Counter(), Counter(), Counter(), Counter()
    for (_, day), evs in by_ud.items():
        dow = day % 7
        n_ud[dow] += 1
        v = min((s for s, t in evs if t == "view"), default=None)
        if v is None:
            continue
        n_v[dow] += 1
        c = min((s for s, t in evs if t == "click" and s > v),
                default=None)
        if c is None:
            continue
        n_c[dow] += 1
        if any(t == "purchase" and s > c for s, t in evs):
            n_p[dow] += 1
    got = {r.dow: (r.n_user_days, r.n_reached_view, r.n_reached_click,
                   r.n_converted, r.rate)
           for r in day_funnel_conversion(spark, sf_dir).collect()}
    assert set(got) == set(n_ud)
    for d in n_ud:
        assert got[d][:4] == (n_ud[d], n_v[d], n_c[d], n_p[d])
        assert got[d][4] == pytest.approx(
            round(n_p[d] / n_ud[d], 6), abs=1e-6)
    # every funnel step must be exercised by the testdata
    assert sum(n_c.values()) > 0, "no view->click user-days in testdata"
