"""Distributed ingest tests: voxel/chunk DataFrames → chunk store →
cutout equality with a numpy oracle, with nothing materializing on the
driver during ingest."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from bigarrays_jl_spark.infos import Info
from bigarrays_jl_spark.volume import Volume


@pytest.fixture
def vol(spark, tmp_path):
    info = Info.from_dict({
        "num_channels": 1, "type": "image", "data_type": "uint8",
        "scales": [{"encoding": "gzip", "chunk_sizes": [[16, 16, 16]],
                    "key": "1_1_1", "resolution": [1, 1, 1],
                    "voxel_offset": [0, 0, 0], "size": [64, 64, 48]}]})
    return Volume.create(spark, str(tmp_path / "ing"), info)


def _pattern_df(spark, nx, ny, nz):
    """Fully-generated voxel DataFrame: value = (x*31 + y*7 + z) % 256 —
    born distributed via spark.range cross products."""
    xs = spark.range(nx).select(F.col("id").cast("int").alias("x"))
    ys = spark.range(ny).select(F.col("id").cast("int").alias("y"))
    zs = spark.range(nz).select(F.col("id").cast("int").alias("z"))
    return (xs.crossJoin(ys).crossJoin(zs)
            .withColumn("value", (F.col("x") * 31 + F.col("y") * 7 + F.col("z")) % 256))


def _pattern_np(nx, ny, nz):
    x, y, z = np.meshgrid(np.arange(nx), np.arange(ny), np.arange(nz),
                          indexing="ij")
    return ((x * 31 + y * 7 + z) % 256).astype(np.uint8)


def test_ingest_voxels_roundtrip(spark, vol):
    vol.ingest_voxels(_pattern_df(spark, 64, 64, 48))
    out, _ = vol.cutout(((0, 64), (0, 64), (0, 48)))
    np.testing.assert_array_equal(out, _pattern_np(64, 64, 48))


def test_ingest_voxels_partial_chunk_zero_fill(spark, vol):
    # voxels covering only part of one chunk: the rest of that chunk
    # must read back as zeros
    df = _pattern_df(spark, 8, 8, 8)
    vol.ingest_voxels(df)
    out, _ = vol.cutout(((0, 16), (0, 16), (0, 16)))
    np.testing.assert_array_equal(out[:8, :8, :8], _pattern_np(8, 8, 8))
    assert (out[8:, :, :] == 0).all() and (out[:, 8:, :] == 0).all()


def test_ingest_voxels_drops_out_of_volume(spark, vol):
    # volume is 64x64x48; voxels beyond z=48 must be dropped silently
    df = _pattern_df(spark, 4, 4, 64)
    vol.ingest_voxels(df)
    out, _ = vol.cutout(((0, 4), (0, 4), (0, 48)))
    np.testing.assert_array_equal(out, _pattern_np(4, 4, 64)[:, :, :48])
    assert vol.num_chunks() == 4 * 4 * 3  # lattice of the whole volume


def test_ingest_chunks_roundtrip(spark, vol):
    # build raw chunk rows in a DataFrame (as a bulk converter would),
    # ingest, read back
    arr = _pattern_np(32, 16, 16)
    rows = []
    from bigarrays_jl_spark import indexes as ix
    sc = vol.scale
    for cs in ix.iter_chunk_slices(((0, 32), (0, 16), (0, 16)),
                                   sc.voxel_offset, sc.volume_size,
                                   sc.chunk_size):
        sl = tuple(slice(lo, hi) for lo, hi in cs.cutout_box)
        rows.append((cs.cid[0], cs.cid[1], cs.cid[2], cs.key,
                     np.asfortranarray(arr[sl]).tobytes(order="F")))
    df = spark.createDataFrame(
        rows, schema="cx int, cy int, cz int, key string, payload binary")
    vol.ingest_chunks(df)
    out, _ = vol.cutout(((0, 32), (0, 16), (0, 16)))
    np.testing.assert_array_equal(out, arr)


def test_ingest_then_overwrite_epochs(spark, vol):
    vol.ingest_voxels(_pattern_df(spark, 16, 16, 16))
    vol[0:16, 0:16, 0:16] = np.full((16, 16, 16), 7, dtype=np.uint8)
    assert (vol[0:16, 0:16, 0:16] == 7).all()
