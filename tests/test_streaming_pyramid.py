"""Streaming pyramid maintenance: incremental downsample of touched
parents equals a from-scratch batch build_pyramid, byte for byte."""
import numpy as np
import pytest

from bigarrays_jl_spark import indexes as ix
from bigarrays_jl_spark.infos import Info
from bigarrays_jl_spark.volume import Volume


def _info(size=(64, 64, 32), chunk=(16, 16, 16), offset=(0, 0, 0)):
    return Info.from_dict({
        "num_channels": 1, "type": "image", "data_type": "uint8",
        "scales": [{"encoding": "gzip",
                    "chunk_sizes": [list(chunk)], "key": "1_1_1",
                    "resolution": [1, 1, 1],
                    "voxel_offset": list(offset), "size": list(size)}]})


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


def _mip_content(vol, mip):
    """Decoded latest content of every stored chunk at ``mip``."""
    import gzip
    rows = vol._latest(vol.chunks_df(mip)).collect()
    return {r["key"]: gzip.decompress(bytes(r["payload"])) for r in rows}


SCHEMA = "cx int, cy int, cz int, key string, payload binary"


def test_streaming_pyramid_matches_batch_build(spark, tmp_path):
    # three micro-batches land disjoint chunk sets; after each, the
    # incrementally-maintained pyramid must equal a from-scratch batch
    # build_pyramid on the data so far — byte-identical at every mip
    from bigarrays_jl_spark.streaming.pyramid import (
        streaming_ingest_with_pyramid)

    info = _info()
    vol = Volume.create(spark, str(tmp_path / "acq"), info)
    rng = np.random.default_rng(11)
    a = rng.integers(0, 256, (64, 64, 32), dtype=np.uint8)
    rows = _chunk_rows(vol, a, ((0, 64), (0, 64), (0, 32)))
    src, ckpt = str(tmp_path / "staged"), str(tmp_path / "ckpt")

    batches = [rows[:5], rows[5:7], rows[7:]]
    seen = []
    for i, batch in enumerate(batches):
        seen.extend(batch)
        spark.createDataFrame(batch, SCHEMA).coalesce(1) \
            .write.mode("append").parquet(src)
        q = streaming_ingest_with_pyramid(
            spark.readStream.schema(SCHEMA).parquet(src), vol, ckpt,
            num_mip=3)
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        # batch twin over the same prefix
        ref = Volume.create(spark, str(tmp_path / f"ref{i}"), _info())
        ref.ingest_chunks(spark.createDataFrame(seen, SCHEMA))
        ref.build_pyramid(num_mip=3)
        for mip in (1, 2):
            assert _mip_content(vol, mip) == _mip_content(ref, mip), \
                f"batch {i} mip {mip}"
    # mip0 voxels intact
    out, _ = vol.cutout(((0, 64), (0, 64), (0, 32)))
    np.testing.assert_array_equal(out, a)


def test_streaming_pyramid_replay_converges(spark, tmp_path):
    # re-running incremental_pyramid on the same touched set (the
    # foreachBatch replay after a mid-cascade crash) must not change
    # any mip content — MVCC epochs supersede to identical bytes
    from bigarrays_jl_spark.streaming.pyramid import incremental_pyramid

    vol = Volume.create(spark, str(tmp_path / "v"), _info())
    a = np.random.default_rng(3).integers(0, 256, (64, 64, 32),
                                          dtype=np.uint8)
    rows = _chunk_rows(vol, a, ((0, 64), (0, 64), (0, 32)))
    vol.ingest_chunks(spark.createDataFrame(rows, SCHEMA))
    touched = [(r[0], r[1], r[2]) for r in rows]
    incremental_pyramid(vol, touched, num_mip=3)
    want = {m: _mip_content(vol, m) for m in (1, 2)}
    incremental_pyramid(vol, touched[:3], num_mip=3)  # partial replay
    incremental_pyramid(vol, touched, num_mip=3)      # full replay
    for m in (1, 2):
        assert _mip_content(vol, m) == want[m]


def test_incremental_downsample_prunes_source_scan(spark, tmp_path):
    # the incremental pass must not rescan the mip table: the
    # only_sources subset plans per-axis BETWEENs that reach the
    # parquet scan as PushedFilters (row-group pruning), bounding the
    # read to the touched ids' bounding box
    vol = Volume.create(spark, str(tmp_path / "v"), _info())
    a = np.random.default_rng(5).integers(0, 256, (64, 64, 32),
                                          dtype=np.uint8)
    rows = _chunk_rows(vol, a, ((0, 64), (0, 64), (0, 32)))
    vol.ingest_chunks(spark.createDataFrame(rows, SCHEMA))
    ids = [(0, 0, 0), (1, 0, 0)]
    plan = (vol._sources_subset(0, ids)
            ._jdf.queryExecution().executedPlan().toString())
    # the per-axis bounds reach the scan (list may be display-truncated,
    # so check the filters themselves rather than the full bracket)
    assert "PushedFilters: [IsNotNull(cx)" in plan, plan[:3000]
    assert "GreaterThanOrEqual(cx,0)" in plan, plan[:3000]
    # the subset reads exactly the listed ids
    got = {(r["cx"], r["cy"], r["cz"])
           for r in vol._sources_subset(0, ids).collect()}
    assert got == set(ids)
    # empty set short-circuits before any metadata/write side effect
    vol.downsample(from_mip=0, only_sources=[])
    assert len(vol.info.scales) == 1


def test_child_to_parent_id_matches_executor_formula(spark, tmp_path):
    # driver-side map must agree with where downsample actually lands
    # blocks, including negative offsets and odd (clamped) edges
    info = _info(size=(48, 33, 20), chunk=(16, 16, 16),
                 offset=(-8, -17, 3))
    vol = Volume.create(spark, str(tmp_path / "v"), info)
    rng = np.random.default_rng(7)
    a = rng.integers(0, 256, (48, 33, 20), dtype=np.uint8)
    box = ((-8, 40), (-17, 16), (3, 23))
    vol.write(a, (-8, -17, 3))
    vol.downsample(from_mip=0)
    want_parents = {(r["cx"], r["cy"], r["cz"])
                    for r in vol.chunks_df(1).collect()}
    got_parents = {vol.child_to_parent_id(0, (r["cx"], r["cy"], r["cz"]))
                   for r in vol.chunks_df(0).collect()}
    # every parent the batch pass wrote is predicted; predicted extras
    # are parents whose blocks all assembled empty at the halved-volume
    # edge (the batch pass drops those too, so re-deriving them is a
    # no-op, merely a slightly larger closure)
    assert want_parents <= got_parents
    # end-to-end on the awkward geometry: incremental over every child
    # equals the batch downsample byte-for-byte
    from bigarrays_jl_spark.streaming.pyramid import incremental_pyramid
    vol2 = Volume.create(spark, str(tmp_path / "v2"), info)
    vol2.write(a, (-8, -17, 3))
    incremental_pyramid(
        vol2, [(r["cx"], r["cy"], r["cz"])
               for r in vol2.chunks_df(0).collect()], num_mip=2)
    assert _mip_content(vol2, 1) == _mip_content(vol, 1)
