"""Round-14 batch-3 tests: python brute-force twin for the decimal-HDR
quantiles, the bucket-map properties, plan pins, and the streaming
twin's snapshot == batch / replay contract."""

import shutil

from pyspark.sql import functions as F

from bigarrays_jl_spark.operators.round14c import events_hdr_quantiles
from bigarrays_jl_spark.sources.tables import load


def _hdr_lb(c: int) -> int:
    s = str(abs(c))
    if len(s) <= 2:
        return c
    edge = int(s[:2]) * 10 ** (len(s) - 2)
    if c >= 0:
        return edge
    # exact negative edge is its own lower bound (r14 advice)
    return -edge if abs(c) == edge else -(edge + 10 ** (len(s) - 2))


def _python_hdr(rows):
    from collections import Counter, defaultdict
    hist = defaultdict(Counter)
    for t, c in rows:
        hist[t][_hdr_lb(c)] += 1
    out = {}
    for t, h in hist.items():
        tot = sum(h.values())
        lbs = sorted(h)
        def pick(num, den):
            cum = 0
            for lb in lbs:
                cum += h[lb]
                if den * cum >= num * tot:
                    return lb
        out[t] = (tot, len(lbs), pick(1, 2), pick(9, 10), pick(99, 100),
                  pick(999, 1000))
    return out


def test_hdr_quantiles_match_python(spark, sf_dir):
    rows = [(r.event_type, int(round(r.value * 100)))
            for r in load(spark, sf_dir, "events")
            .select("event_type", "value").collect()]
    want = _python_hdr(rows)
    got = {r.event_type: (r.n_events, r.n_buckets, r.p50_cents,
                          r.p90_cents, r.p99_cents, r.p999_cents)
           for r in events_hdr_quantiles(spark, sf_dir).collect()}
    assert got == want and len(got) > 0
    # boundedness + error contract: every bucket holds ≤ ~5% relative
    # error (lb ≤ c < lb + 10^(d-2) step), and the bucket count per key
    # is structurally ≤ 900ish regardless of data size
    for t, (_, n_buckets, p50, p90, p99, p999) in got.items():
        assert n_buckets <= 900
        assert p50 <= p90 <= p99 <= p999


def test_hdr_bucket_map_properties(spark):
    # JVM map == python map over awkward cents (0, single/double digit,
    # powers of ten, 9-runs)
    from bigarrays_jl_spark.operators.round14c import hdr_bucket_cents
    vals = [0, 1, 9, 10, 42, 99, 100, 101, 950, 999, 1000, 45678,
            99999, 100000, 31415926,
            -1, -42, -99, -100, -101, -999, -1000, -45678, -99999,
            -100000]
    df = spark.createDataFrame([(v,) for v in vals], "c long")
    got = {r.c: r.lb for r in
           df.select("c", hdr_bucket_cents(F.col("c")).alias("lb"))
           .collect()}
    assert got == {v: _hdr_lb(v) for v in vals}
    # monotone: lb(c) <= c and lb is non-decreasing in c
    lbs = [got[v] for v in sorted(vals)]
    assert lbs == sorted(lbs)
    assert all(got[v] <= v for v in vals)


def test_hdr_plan_shape(spark, sf_dir):
    from bigarrays_jl_spark.plans.explain import (has_partial_aggregation,
                                                  single_partition_windows)
    df = events_hdr_quantiles(spark, sf_dir)
    assert not single_partition_windows(df)
    assert has_partial_aggregation(df)


def test_streaming_hdr_snapshot_and_replay(spark, sf_dir, tmp_path):
    from bigarrays_jl_spark.streaming.hdr import (hdr_snapshot,
                                                  streaming_hdr_quantiles)
    e = load(spark, sf_dir, "events").select("event_type", "value")
    cut = e.agg(F.expr("percentile(value, 0.5)")).first()[0]
    src = str(tmp_path / "src")
    out, ckpt = (str(tmp_path / p) for p in ("out", "ckpt"))
    e.filter(F.col("value") <= cut).coalesce(1).write.parquet(src)

    def run():
        q = streaming_hdr_quantiles(
            spark.readStream.schema(e.schema).parquet(src), out, ckpt)
        try:
            q.processAllAvailable()
        finally:
            q.stop()

    run()
    e.filter(F.col("value") > cut).coalesce(1) \
        .write.mode("append").parquet(src)
    run()                                   # restart on same checkpoint

    def rows(df):
        return {tuple(r) for r in df.collect()}

    want = rows(events_hdr_quantiles(spark, sf_dir))
    assert rows(hdr_snapshot(spark, out)) == want

    n = spark.read.parquet(out).count()
    shutil.rmtree(ckpt)                     # full replay as batch 0
    run()
    assert spark.read.parquet(out).count() == n, "partials duplicated"
    assert rows(hdr_snapshot(spark, out)) == want


def test_hdr_negative_edge_buckets(spark):
    # r14 advice: exact negative bucket edges are their own lower
    # bound — lb(-100) = -100 (was -110), lb(-110) = -110 (was -120) —
    # so negative buckets are [lb, lb+w) like positives and the
    # relative error at edges is 0, within the ~5% documented bound
    from bigarrays_jl_spark.operators.round14c import hdr_bucket_cents
    vals = [-100, -110, -120, -1000, -45000, -99000, -100000]
    df = spark.createDataFrame([(v,) for v in vals], "c long")
    got = {r.c: r.lb for r in
           df.select("c", hdr_bucket_cents(F.col("c")).alias("lb"))
           .collect()}
    assert got == {v: v for v in vals}          # edges map to themselves
    # and one off-edge value still rounds DOWN (lb <= c)
    off = spark.createDataFrame([(-101,), (-111,), (-45001,)], "c long")
    got_off = {r.c: r.lb for r in
               off.select("c", hdr_bucket_cents(F.col("c")).alias("lb"))
               .collect()}
    assert got_off == {-101: -110, -111: -120, -45001: -46000}


def test_hdr_merge_matches_unsharded(spark, sf_dir):
    # merge-of-sketches == sketch-of-union: the two-shard merge query's
    # P50/P99/P999 equal the single-pass quantiles of the full stream
    from bigarrays_jl_spark.operators.round14c import events_hdr_merge
    merged = {r.event_type: (r.n_events, r.p50_cents, r.p99_cents,
                             r.p999_cents)
              for r in events_hdr_merge(spark, sf_dir).collect()}
    full = {r.event_type: (r.n_events, r.p50_cents, r.p99_cents,
                           r.p999_cents)
            for r in events_hdr_quantiles(spark, sf_dir).collect()}
    assert merged == full and len(merged) > 0


def test_streaming_hdr_merge_two_streams(spark, sf_dir, tmp_path):
    # two INDEPENDENT streams (disjoint user shards, overlapping
    # event_type keys) each keep their own partial table; the merged
    # snapshot equals the batch operator over the union — exercising
    # mergeability across SKETCHES, not just across batches of one
    # stream (r14 verdict task 6)
    from bigarrays_jl_spark.streaming.hdr import (hdr_merge_snapshot,
                                                  streaming_hdr_quantiles)
    e = load(spark, sf_dir, "events").select("event_type", "value",
                                             "user_id")
    outs = []
    for shard in (0, 1):
        src = str(tmp_path / f"src{shard}")
        out, ckpt = (str(tmp_path / f"{p}{shard}") for p in ("out", "ckpt"))
        (e.filter(F.col("user_id") % 2 == shard)
         .select("event_type", "value").coalesce(1).write.parquet(src))
        q = streaming_hdr_quantiles(
            spark.readStream.schema("event_type string, value double")
            .parquet(src), out, ckpt)
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        outs.append(out)

    got = {tuple(r) for r in hdr_merge_snapshot(spark, outs).collect()}
    want = {tuple(r) for r in events_hdr_quantiles(spark, sf_dir).collect()}
    assert got == want and len(want) > 0
