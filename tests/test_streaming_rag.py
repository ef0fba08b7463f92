"""Streaming RAG maintenance: the incrementally-maintained part table
snapshots to exactly the batch region_adjacency, across micro-batches,
overwrites, and replays."""
import numpy as np

from bigarrays_jl_spark import indexes as ix
from bigarrays_jl_spark.infos import Info
from bigarrays_jl_spark.volume import Volume

SCHEMA = "cx int, cy int, cz int, key string, payload binary"
SIDE = 32


def _info():
    return Info.from_dict({
        "num_channels": 1, "type": "segmentation", "data_type": "uint32",
        "scales": [{"encoding": "gzip", "chunk_sizes": [[16, 16, 16]],
                    "key": "1_1_1", "resolution": [1, 1, 1],
                    "voxel_offset": [0, 0, 0], "size": [SIDE] * 3}]})


def _labels(seed=0):
    x, y, z = np.meshgrid(*([np.arange(SIDE)] * 3), indexing="ij")
    v = (3 * x + 5 * y + 7 * z + seed) % 11
    return np.where(v < 6, v + 1, 0).astype(np.uint32)


def _chunk_rows(vol, arr, box):
    sc_ = vol.scale
    off = sc_.voxel_offset
    rows = []
    for cs in ix.iter_chunk_slices(box, off, sc_.volume_size,
                                   sc_.chunk_size):
        (x0, x1), (y0, y1), (z0, z1) = cs.cutout_box
        rows.append((cs.cid[0], cs.cid[1], cs.cid[2], cs.key,
                     arr[x0 - off[0]:x1 - off[0], y0 - off[1]:y1 - off[1],
                         z0 - off[2]:z1 - off[2]].tobytes(order="F")))
    return rows


def _edges(df):
    return {(r["label_a"], r["label_b"]): r["contact_faces"]
            for r in df.collect()}


def test_streaming_rag_matches_batch(spark, tmp_path):
    # chunks land in three micro-batches; after each, the snapshot must
    # equal a from-scratch region_adjacency over the content so far
    from bigarrays_jl_spark.operators.volume_rag import region_adjacency
    from bigarrays_jl_spark.streaming.rag import (rag_snapshot,
                                                  streaming_ingest_with_rag)

    vol = Volume.create(spark, str(tmp_path / "acq"), _info())
    rows = _chunk_rows(vol, _labels(), ((0, SIDE),) * 3)
    src = str(tmp_path / "staged")
    ckpt = str(tmp_path / "ckpt")
    rag_root = str(tmp_path / "rag")

    for i, batch in enumerate([rows[:3], rows[3:5], rows[5:]]):
        spark.createDataFrame(batch, SCHEMA).coalesce(1) \
            .write.mode("append").parquet(src)
        q = streaming_ingest_with_rag(
            spark.readStream.schema(SCHEMA).parquet(src), vol,
            rag_root, ckpt)
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        got = _edges(rag_snapshot(spark, rag_root))
        want = _edges(region_adjacency(vol))
        assert got == want, f"batch {i}"
    assert len(got) > 5  # noise volume produces a non-trivial RAG


def test_streaming_rag_overwrite_supersedes(spark, tmp_path):
    # overwriting chunks with different labels must supersede the old
    # parts — including edges that vanish entirely (tombstone path)
    from bigarrays_jl_spark.operators.volume_rag import region_adjacency
    from bigarrays_jl_spark.streaming.rag import (incremental_rag,
                                                  rag_snapshot)

    vol = Volume.create(spark, str(tmp_path / "v"), _info())
    rag_root = str(tmp_path / "rag")
    rows = _chunk_rows(vol, _labels(), ((0, SIDE),) * 3)
    vol.ingest_chunks(spark.createDataFrame(rows, SCHEMA))
    touched = [(r[0], r[1], r[2]) for r in rows]
    incremental_rag(vol, touched, rag_root, batch_id=0)

    # overwrite half the chunks with a constant label (kills most
    # edges inside that half, changes boundary edges)
    flat = np.full((SIDE, SIDE, SIDE), 2, dtype=np.uint32)
    rows2 = [r for r in _chunk_rows(vol, flat, ((0, SIDE),) * 3)
             if r[0] == 0]
    vol.ingest_chunks(spark.createDataFrame(rows2, SCHEMA))
    incremental_rag(vol, [(r[0], r[1], r[2]) for r in rows2],
                    rag_root, batch_id=1)
    assert _edges(rag_snapshot(spark, rag_root)) == \
        _edges(region_adjacency(vol))


def test_streaming_rag_replay_is_noop(spark, tmp_path):
    # re-running a batch id with the same touched set (foreachBatch
    # crash replay) must not change the snapshot
    from bigarrays_jl_spark.streaming.rag import (incremental_rag,
                                                  rag_snapshot)

    vol = Volume.create(spark, str(tmp_path / "v"), _info())
    rag_root = str(tmp_path / "rag")
    rows = _chunk_rows(vol, _labels(), ((0, SIDE),) * 3)
    vol.ingest_chunks(spark.createDataFrame(rows, SCHEMA))
    touched = [(r[0], r[1], r[2]) for r in rows]
    incremental_rag(vol, touched, rag_root, batch_id=0)
    want = _edges(rag_snapshot(spark, rag_root))
    incremental_rag(vol, touched[:4], rag_root, batch_id=0)  # replay
    assert _edges(rag_snapshot(spark, rag_root)) == want
