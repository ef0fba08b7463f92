"""Round-15 tests: Count-Min heavy-hitter audit — python brute-force
twin, the never-underestimates invariant, bounded sketch size, and the
streaming twin's snapshot == batch / replay / cross-stream merge
contracts."""

import hashlib
import shutil

from pyspark.sql import functions as F

from bigarrays_jl_spark.operators.round15 import (CM_D, CM_TOPK, CM_W,
                                                  cm_heavyhitters,
                                                  cm_sketch_of,
                                                  gram_counts)
from bigarrays_jl_spark.sources.tables import load


def _py_bucket(j: int, gram: str) -> int:
    return int(hashlib.md5(f"{j}:{gram}".encode()).hexdigest()[:8],
               16) % CM_W


def _python_cm(texts):
    from collections import Counter
    exact = Counter()
    for t in texts:
        ws = t.split(" ")
        for i in range(len(ws) - 1):
            exact[ws[i] + " " + ws[i + 1]] += 1
    sketch = Counter()
    for g, n in exact.items():
        for j in range(CM_D):
            sketch[(j, _py_bucket(j, g))] += n
    top = sorted(exact.items(), key=lambda kv: (-kv[1], kv[0]))[:CM_TOPK]
    return {g: (n, min(sketch[(j, _py_bucket(j, g))]
                       for j in range(CM_D)))
            for g, n in top}


def test_cm_heavyhitters_match_python(spark, sf_dir):
    texts = [r.text for r in
             load(spark, sf_dir, "documents").select("text").collect()]
    want = _python_cm(texts)
    got = {r.gram: (r.exact_n, r.cm_est)
           for r in cm_heavyhitters(spark, sf_dir).collect()}
    assert got == want and len(got) == CM_TOPK
    # the CM invariant: estimates never undershoot
    rows = cm_heavyhitters(spark, sf_dir).collect()
    assert all(r.overest >= 0 for r in rows)
    assert all(r.cm_est == r.exact_n + r.overest for r in rows)


def test_cm_sketch_is_bounded(spark, sf_dir):
    # the whole point: D x W counters at ANY corpus size
    n = cm_sketch_of(gram_counts(spark, sf_dir)).count()
    assert n <= CM_D * CM_W


def test_streaming_cm_snapshot_replay_and_merge(spark, sf_dir, tmp_path):
    from bigarrays_jl_spark.streaming.cm import (cm_merge_snapshot,
                                                 cm_snapshot,
                                                 streaming_cm_sketch)

    d = load(spark, sf_dir, "documents").select("doc_id", "text")
    half = d.agg(F.max("doc_id")).first()[0] // 2
    want = {tuple(r) for r in
            cm_sketch_of(gram_counts(spark, sf_dir)).collect()}

    # one stream, two batches with a restart between: snapshot == batch
    src = str(tmp_path / "src")
    out, ckpt = (str(tmp_path / p) for p in ("out", "ckpt"))
    d.filter(F.col("doc_id") <= half).coalesce(1).write.parquet(src)

    def run(s, o, c):
        q = streaming_cm_sketch(
            spark.readStream.schema(d.schema).parquet(s), o, c)
        try:
            q.processAllAvailable()
        finally:
            q.stop()

    run(src, out, ckpt)
    d.filter(F.col("doc_id") > half).coalesce(1) \
        .write.mode("append").parquet(src)
    run(src, out, ckpt)
    assert {tuple(r) for r in cm_snapshot(spark, out).collect()} == want

    # full replay as batch 0: the guard keeps the partials exactly-once
    n = spark.read.parquet(out).count()
    shutil.rmtree(ckpt)
    run(src, out, ckpt)
    assert spark.read.parquet(out).count() == n, "partials duplicated"
    assert {tuple(r) for r in cm_snapshot(spark, out).collect()} == want

    # two INDEPENDENT streams over disjoint doc shards merge to the
    # batch sketch of the union — cross-sketch mergeability
    outs = []
    for shard in (0, 1):
        s = str(tmp_path / f"s{shard}")
        o, c = (str(tmp_path / f"{p}{shard}") for p in ("o", "c"))
        (d.filter(F.col("doc_id") % 2 == shard)
         .coalesce(1).write.parquet(s))
        run(s, o, c)
        outs.append(o)
    got = {tuple(r) for r in cm_merge_snapshot(spark, outs).collect()}
    assert got == want and len(want) > 0


def _py_bloom_bit(j: int, s: str) -> int:
    from bigarrays_jl_spark.operators.round15 import BLOOM_M
    return int(hashlib.md5(f"{j}:{s}".encode()).hexdigest()[:8],
               16) % BLOOM_M


def test_bloom_decontaminate_match_python(spark, sf_dir):
    from bigarrays_jl_spark.operators.round15 import (BLOOM_K,
                                                      bloom_decontaminate)

    rows = load(spark, sf_dir, "documents").select("doc_id",
                                                   "text").collect()
    grams = {}
    for r in rows:
        t = r.text.strip().lower().split()
        grams[r.doc_id] = {" ".join(t[i:i + 8])
                           for i in range(len(t) - 7)}
    ev = set().union(*(g for d, g in grams.items() if d % 10 == 0),
                     set())
    bits = {(j, _py_bloom_bit(j, s)) for s in ev for j in range(BLOOM_K)}
    want = {}
    for d, g in grams.items():
        if d % 10 == 0:
            continue
        pos = sum(1 for s in g
                  if all((j, _py_bloom_bit(j, s)) in bits
                         for j in range(BLOOM_K)))
        exact = len(g & ev)
        if pos > 0:
            want[d] = (pos, exact, pos - exact)
    got = {r.doc_id: (r.n_bloom_pos, r.n_exact_shared, r.n_false_pos)
           for r in bloom_decontaminate(spark, sf_dir).collect()}
    assert got == want and len(got) > 0
    # the Bloom invariant: no false negatives, so per doc pos >= exact
    assert all(p >= e and fp == p - e >= 0
               for p, e, fp in got.values())


def test_streaming_bloom_screen_eval_first(spark, sf_dir, tmp_path):
    # eval set streams first (the decontamination norm), train docs
    # follow: the screen's snapshot equals the batch operator's
    # bloom-positive counts; replay is exactly-once on the output
    from bigarrays_jl_spark.operators.round15 import bloom_decontaminate
    from bigarrays_jl_spark.streaming.bloom import (bloom_screen_snapshot,
                                                    streaming_bloom_screen)

    d = load(spark, sf_dir, "documents").select("doc_id", "text")
    src = str(tmp_path / "src")
    bits, out, ckpt = (str(tmp_path / p) for p in ("bits", "out", "ckpt"))
    d.filter(F.col("doc_id") % 10 == 0).coalesce(1).write.parquet(src)

    def run():
        q = streaming_bloom_screen(
            spark.readStream.schema(d.schema).parquet(src),
            bits, out, ckpt)
        try:
            q.processAllAvailable()
        finally:
            q.stop()

    run()                                 # batch 0: eval seeds the bits
    # train docs land as two files -> (usually) one more micro-batch;
    # either way every train doc is screened against the full eval bits
    d.filter(F.col("doc_id") % 10 != 0).coalesce(1) \
        .write.mode("append").parquet(src)
    run()

    got = {(r.doc_id, r.n_bloom_pos)
           for r in bloom_screen_snapshot(spark, out).collect()}
    want = {(r.doc_id, r.n_bloom_pos)
            for r in bloom_decontaminate(spark, sf_dir).collect()}
    assert got == want and len(want) > 0

    # full replay as batch 0: bits anti-join + output guard keep both
    # tables exactly-once
    n_bits = spark.read.parquet(bits).count()
    n_out = spark.read.parquet(out).count()
    shutil.rmtree(ckpt)
    run()
    assert spark.read.parquet(bits).count() == n_bits, "bits duplicated"
    assert spark.read.parquet(out).count() == n_out, "screen duplicated"
    assert {(r.doc_id, r.n_bloom_pos)
            for r in bloom_screen_snapshot(spark, out).collect()} == want


def test_streaming_bloom_bits_union_across_shards(spark, sf_dir,
                                                  tmp_path):
    # the Bloom merge rule: two shards' bitsets union to the pooled
    # eval set's bitset exactly
    from bigarrays_jl_spark.streaming.bloom import (_bits_of, _doc_grams,
                                                    bloom_bits_union,
                                                    streaming_bloom_screen)

    d = load(spark, sf_dir, "documents").select("doc_id", "text")
    ev = d.filter(F.col("doc_id") % 10 == 0)
    want = {(r.j, r.bit) for r in _bits_of(_doc_grams(ev)).collect()}

    paths = []
    for shard in (0, 1):
        src = str(tmp_path / f"src{shard}")
        bits, out, ckpt = (str(tmp_path / f"{p}{shard}")
                           for p in ("bits", "out", "ckpt"))
        (ev.filter(F.floor(F.col("doc_id") / 10) % 2 == shard)
         .coalesce(1).write.parquet(src))
        q = streaming_bloom_screen(
            spark.readStream.schema(d.schema).parquet(src),
            bits, out, ckpt)
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        paths.append(bits)

    got = {(r.j, r.bit)
           for r in bloom_bits_union(spark, paths).collect()}
    assert got == want and len(want) > 0
