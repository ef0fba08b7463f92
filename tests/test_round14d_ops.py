"""Round-14 batch-4 tests: python brute-force twins + plan pins."""

import hashlib
from collections import defaultdict

from pyspark.sql import functions as F

from bigarrays_jl_spark.operators.extensions import CLS_BUCKETS
from bigarrays_jl_spark.operators.round14d import (dedup_storage_savings,
                                                   quality_calibration)
from bigarrays_jl_spark.sources.tables import load

STOP = ("the", "a", "and", "of", "to", "in")


def _cls_score(text: str):
    import re
    ts = [t for t in re.split("[^a-z0-9]+", text.lower()) if t != ""]
    if not ts:
        return None
    raw_sum = 0
    for t in ts:
        w = (int(hashlib.md5(t.encode()).hexdigest()[:4], 16)
             % CLS_BUCKETS % 201 - 100)
        raw_sum += w
    raw = raw_sum / (100.0 * len(ts))
    return round(raw / (1 + abs(raw)), 6)


def _gopher_pass(text: str) -> bool:
    ts = [t for t in text.split(" ") if t != ""]
    n = len(ts)
    if not (20 <= n <= 1000):
        return False
    if not (3 <= round(sum(len(t) for t in ts) / n, 4) <= 10):
        return False
    if round(sum(1 for t in ts if any(c.isalpha() for c in t)) / n,
             4) < 0.8:
        return False
    return sum(1 for t in ts if t in STOP) >= 2


def test_quality_calibration_matches_python(spark, sf_dir):
    docs = load(spark, sf_dir, "documents").select("text").collect()
    bins = defaultdict(lambda: [0, 0, 0])
    import math
    for r in docs:
        s = _cls_score(r.text)
        if s is None:
            continue
        b = math.floor(s * 10)
        bins[b][0] += 1
        bins[b][1] += _gopher_pass(r.text)
        bins[b][2] += round(s * 1e6)
    got = {r.score_bin: (r.n_docs, r.n_gopher_pass, r.pass_rate,
                         r.mean_score)
           for r in quality_calibration(spark, sf_dir).collect()}
    assert set(got) == set(bins) and len(got) > 1
    for b, (n, p, ssum) in bins.items():
        assert got[b] == (n, p, round(p / n, 6), ssum / (n * 1e6))


def test_dedup_storage_savings_matches_python(spark, sf_dir):
    rows = load(spark, sf_dir, "documents").select(
        "doc_id", "source", "text", "n_chars").collect()
    aug = [(r.doc_id, r.source, r.text, r.n_chars) for r in rows]
    aug += [(r.doc_id + 2000000, r.source, r.text, r.n_chars)
            for r in rows if r.doc_id % 7 == 0]
    keep = {}
    for did, _, text, _ in aug:
        fp = hashlib.md5(text.encode()).hexdigest()
        keep[fp] = min(keep.get(fp, did), did)
    per = defaultdict(lambda: [0, 0, 0, 0])
    for did, src, text, nc in aug:
        fp = hashlib.md5(text.encode()).hexdigest()
        dup = did != keep[fp]
        per[src][0] += 1
        per[src][1] += dup
        per[src][2] += nc if dup else 0
        per[src][3] += nc
    got = {r.source: (r.n_docs, r.n_dup_instances, r.chars_removable,
                      r.chars_total, r.frac_removable)
           for r in dedup_storage_savings(spark, sf_dir).collect()}
    assert set(got) == set(per)
    total_dups = 0
    for s, (n, d, cr, ct) in per.items():
        assert got[s] == (n, d, cr, ct, round(cr / ct, 6))
        total_dups += d
    # the augmentation guarantees real mass: every 7th doc has a copy
    assert total_dups > 0


def test_round14d_plan_shapes(spark, sf_dir):
    from bigarrays_jl_spark.plans.explain import (has_partial_aggregation,
                                                  simple_plan,
                                                  single_partition_windows)
    qc = quality_calibration(spark, sf_dir)
    assert not single_partition_windows(qc)
    assert has_partial_aggregation(qc)
    ds = dedup_storage_savings(spark, sf_dir)
    assert not single_partition_windows(ds)
    assert "CartesianProduct" not in simple_plan(ds)
