"""Streaming scale proof (r16 verdict task 3): SCALE_SF1.json covers
the BATCH queries; this tool covers the streaming leg — the risk batch
ratios cannot see is a batch×index join whose cost creeps SUPER-LINEARLY
as the durable index outgrows the batch.

Method: feed N_BATCHES constant-size micro-batches (fresh ids each
batch, so every durable index grows by ~batch-size rows per batch — a
10× stream relative to one batch by the end) through the index-heaviest
bridges and record per-batch wall time:

  - ``streaming_curate``        (3 durable indexes: fp / grams / bitset)
  - ``streaming_minhash_neardup`` (band-signature index probe)
  - ``streaming_span_excise``   (window-hash index probe — the index
                                 grows by ~every batch window, the
                                 largest per-batch index delta here)
  - ``streaming_ann_ingest``    (cell-partitioned index, append-only —
                                 flat by construction; included as the
                                 verdict named it)

Gate: mean wall time of the LAST 3 batches ≤ GROWTH_GATE × mean of
batches 1-3 (batch 0 is excluded everywhere — it pays stream start-up
and codegen).  A healthy bridge is flat-to-linear: its per-batch work
is batch-sized scans plus batch×index joins on compact keys, and at
these index sizes (≤ 10× batch) the join side is still broadcast-class,
so growth beyond the gate means the plan rescans the index or the
output.  Per-batch times, the growth ratio, and the verdict land in
SCALE_STREAM.json (commit-stamped like the batch proof).

Usage::

    python tools/scale_stream_proof.py [--json SCALE_STREAM.json] [sf_dir]
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_BATCHES = 10
GROWTH_GATE = 2.0


def _batches_docs(spark, sf_dir: str):
    """N_BATCHES doc slices with per-batch-unique doc_ids; the offset
    is a multiple of 10 so the eval split (doc_id % 10 == 0) holds in
    every batch and the gram/bitset indexes grow too."""
    from pyspark.sql import functions as F

    from bigarrays_jl_spark.sources.tables import load
    d = load(spark, sf_dir, "documents").select("doc_id", "text")
    per = d.count() // N_BATCHES
    return [
        (d.filter((F.col("doc_id") >= b * per)
                  & (F.col("doc_id") < (b + 1) * per))
         .select((F.col("doc_id") + b * 10_000_000).alias("doc_id"),
                 "text"))
        for b in range(N_BATCHES)
    ]


def _batches_embs(spark, sf_dir: str):
    from pyspark.sql import functions as F

    from bigarrays_jl_spark.sources.tables import load
    e = load(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    per = e.count() // N_BATCHES
    return [
        (e.filter((F.col("vec_id") >= b * per)
                  & (F.col("vec_id") < (b + 1) * per))
         .select((F.col("vec_id") + b * 10_000_000).alias("vec_id"),
                 "embedding"))
        for b in range(N_BATCHES)
    ]


def _drive(spark, batches, schema, start_query, workdir: str) -> list[float]:
    """Start the bridge over a file-source stream, append one parquet
    file per batch, and time each processAllAvailable round trip."""
    src = os.path.join(workdir, "src")
    os.makedirs(src, exist_ok=True)
    stream = spark.readStream.schema(schema).parquet(src)
    q = start_query(stream)
    times = []
    try:
        for b in batches:
            b.coalesce(1).write.mode("append").parquet(src)
            t0 = time.time()
            q.processAllAvailable()
            times.append(round(time.time() - t0, 3))
    finally:
        q.stop()
    return times


def run_bridge(spark, name: str, sf_dir: str) -> dict:
    from bigarrays_jl_spark.streaming.curate import streaming_curate
    from bigarrays_jl_spark.streaming.windows import \
        streaming_minhash_neardup

    wd = tempfile.mkdtemp(prefix=f"scale_stream_{name}_")
    try:
        if name == "streaming_curate":
            batches = _batches_docs(spark, sf_dir)
            times = _drive(
                spark, batches, batches[0].schema,
                lambda s: streaming_curate(
                    s, *(os.path.join(wd, p)
                         for p in ("fp", "grams", "bits", "out", "ckpt"))),
                wd)
        elif name == "streaming_minhash_neardup":
            batches = _batches_docs(spark, sf_dir)
            times = _drive(
                spark, batches, batches[0].schema,
                lambda s: streaming_minhash_neardup(
                    s, os.path.join(wd, "idx"), os.path.join(wd, "out"),
                    os.path.join(wd, "ckpt")),
                wd)
        elif name == "streaming_span_excise":
            from bigarrays_jl_spark.streaming.span import \
                streaming_span_excise
            batches = _batches_docs(spark, sf_dir)
            times = _drive(
                spark, batches, batches[0].schema,
                lambda s: streaming_span_excise(
                    s, os.path.join(wd, "idx"), os.path.join(wd, "out"),
                    os.path.join(wd, "ckpt")),
                wd)
        elif name == "streaming_ann_ingest":
            from bigarrays_jl_spark.operators.similarity import _kmeans_fit
            from bigarrays_jl_spark.streaming.ann import streaming_ann_ingest
            _, cent = _kmeans_fit(spark, sf_dir)
            centroids = cent.collect()
            batches = _batches_embs(spark, sf_dir)
            times = _drive(
                spark, batches, batches[0].schema,
                lambda s: streaming_ann_ingest(
                    s, centroids, os.path.join(wd, "idx"),
                    os.path.join(wd, "ckpt")),
                wd)
        else:
            raise ValueError(name)
    finally:
        shutil.rmtree(wd, ignore_errors=True)
    early = times[1:4]
    late = times[-3:]
    ratio = round((sum(late) / len(late)) / (sum(early) / len(early)), 3)
    return {"per_batch_s": times, "early_mean_s": round(sum(early) / 3, 3),
            "late_mean_s": round(sum(late) / 3, 3),
            "late_vs_early": ratio, "ok": ratio <= GROWTH_GATE,
            "note": ("batch 0 excluded (stream start-up); index size at "
                     f"the last batch ≈ {N_BATCHES}× one batch")}


def main() -> int:
    # argparse from the start (the r16 advice on check_oracle.py's
    # hand-rolled loop applies to every tool: flags must parse the
    # same wherever they appear)
    import argparse
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--json", dest="json_out", metavar="OUT.json")
    ap.add_argument("sf_dir", nargs="?", default="/root/testdata/sf0.1")
    ns = ap.parse_args()
    json_out, sf_dir = ns.json_out, ns.sf_dir

    from bigarrays_jl_spark.session import get_spark
    spark = get_spark("scale-stream-proof")
    report = {}
    for name in ("streaming_curate", "streaming_minhash_neardup",
                 "streaming_span_excise", "streaming_ann_ingest"):
        report[name] = run_bridge(spark, name, sf_dir)
        print(f"{name}: per-batch {report[name]['per_batch_s']} "
              f"late/early={report[name]['late_vs_early']} "
              f"ok={report[name]['ok']}")
    bad = [n for n, r in report.items() if not r["ok"]]
    try:
        commit = subprocess.run(
            ["git", "rev-parse", "HEAD"], capture_output=True, text=True,
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        ).stdout.strip() or None
    except OSError:
        commit = None
    payload = {"sf_dir": sf_dir, "n_batches": N_BATCHES,
               "growth_gate": GROWTH_GATE, "commit": commit,
               "n_failures": len(bad), "bridges": report}
    if json_out:
        with open(json_out, "w") as f:
            json.dump(payload, f, indent=1, sort_keys=True)
        print(f"wrote {json_out}")
    print("FAIL: super-linear bridges:" if bad else "all bridges flat/linear",
          bad if bad else "")
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
