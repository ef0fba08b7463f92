"""Streaming end-to-end curation (streaming/curate.py): snapshot ==
the batch pipeline_e2e_curate census under the eval-first, doc_id-
ordered ingest contract; exactly-once on restart and full replay."""
import shutil

import pytest
from pyspark.sql import functions as F

from bigarrays_jl_spark.operators.round16 import pipeline_e2e_curate
from bigarrays_jl_spark.sources.tables import load
from bigarrays_jl_spark.streaming.curate import (curate_admission_log,
                                                 curate_census_snapshot,
                                                 streaming_curate)


def _run(spark, src, paths, schema):
    q = streaming_curate(
        spark.readStream.schema(schema).parquet(src), *paths)
    try:
        q.processAllAvailable()
    finally:
        q.stop()


def test_streaming_curate_snapshot_equals_batch(spark, sf_dir, tmp_path):
    d = load(spark, sf_dir, "documents").select("doc_id", "text")
    src = str(tmp_path / "src")
    paths = [str(tmp_path / p) for p in ("fpidx", "grams", "bits", "out")]
    ckpt = str(tmp_path / "ckpt")

    # eval-first (the decontamination norm), then train docs split in
    # two doc_id-ordered phases with a stream RESTART between — three
    # durable structures must carry the pipeline across batches
    ev = d.filter(F.col("doc_id") % 10 == 0)
    tr = d.filter(F.col("doc_id") % 10 != 0)
    half = d.agg(F.max("doc_id")).first()[0] // 2
    ev.coalesce(1).write.parquet(src)
    _run(spark, src, paths + [ckpt], d.schema)
    tr.filter(F.col("doc_id") <= half).coalesce(1) \
        .write.mode("append").parquet(src)
    _run(spark, src, paths + [ckpt], d.schema)
    tr.filter(F.col("doc_id") > half).coalesce(1) \
        .write.mode("append").parquet(src)
    _run(spark, src, paths + [ckpt], d.schema)

    want = {tuple(r) for r in pipeline_e2e_curate(spark, sf_dir).collect()}
    got = {tuple(r) for r in
           curate_census_snapshot(spark, paths[3]).collect()}
    assert got == want and len(want) > 0

    # the admission log is consistent: census docs == uncontaminated
    log = curate_admission_log(spark, paths[3]).collect()
    n_surv = sum(1 for r in log if not r.contaminated)
    assert n_surv == sum(r[1] for r in want)       # n_docs per bin sums
    assert any(r.contaminated for r in log), \
        "fixture should exercise the decontamination cut"

    # full replay as batch 0: guards + anti-joins keep all four durable
    # tables exactly-once
    counts = [spark.read.parquet(p).count() for p in paths]
    shutil.rmtree(ckpt)
    _run(spark, src, paths + [ckpt], d.schema)
    assert [spark.read.parquet(p).count() for p in paths] == counts
    assert {tuple(r) for r in
            curate_census_snapshot(spark, paths[3]).collect()} == want


def test_streaming_curate_rejects_negative_doc_ids(spark, tmp_path):
    src = str(tmp_path / "src")
    paths = [str(tmp_path / p) for p in ("f", "g", "b", "o", "c")]
    df = spark.createDataFrame([(-5, "the a of and to in words here")],
                               "doc_id long, text string")
    df.coalesce(1).write.parquet(src)
    q = streaming_curate(
        spark.readStream.schema(df.schema).parquet(src), *paths)
    with pytest.raises(Exception, match="non-negative doc_ids"):
        try:
            q.processAllAvailable()
        finally:
            q.stop()
