"""Driver-local IO fast path (volume.py ``local_io``): the local
pyarrow writer/reader and the Spark path must be file-format-identical
and semantics-identical — every combination of writer×reader over the
same dataset returns the same voxels.  The Spark path keeps dedicated
coverage here via ``local_io = False`` (scratch dirs are local, so the
rest of the volume suite now exercises the fast path)."""
import numpy as np
import pytest

from bigarrays_jl_spark.infos import Info
from bigarrays_jl_spark.volume import MissingChunkError, Volume


def _info(enc="gzip", size=(96, 64, 80), chunk=(32, 32, 32),
          dtype="uint8", nc=1, offset=(0, 0, 0)):
    sc = {"encoding": enc, "chunk_sizes": [list(chunk)], "key": "1_1_1",
          "resolution": [1, 1, 1], "voxel_offset": list(offset),
          "size": list(size)}
    return Info.from_dict({"num_channels": nc, "type": "image",
                           "data_type": dtype, "scales": [sc]})


def _arr(shape, dtype="uint8", seed=7):
    rng = np.random.default_rng(seed)
    return rng.integers(0, np.iinfo(dtype).max + 1, size=shape,
                        dtype=dtype)


@pytest.mark.parametrize("writer_local,reader_local",
                         [(True, False), (False, True), (True, True)])
def test_writer_reader_parity(spark, tmp_path, writer_local, reader_local):
    arr = _arr((96, 64, 80))
    vol = Volume.create(spark, str(tmp_path / "v"), _info())
    vol.local_io = writer_local
    vol.write(arr, (0, 0, 0))
    vol.local_io = reader_local
    out, origin = vol.cutout(((0, 96), (0, 64), (0, 80)))
    assert origin == (0, 0, 0) and (out == arr).all()
    # unaligned partial cutout (slices chunks on every axis)
    sub, o2 = vol.cutout(((5, 61), (17, 50), (3, 79)))
    assert o2 == (5, 17, 3) and (sub == arr[5:61, 17:50, 3:79]).all()


def test_overwrite_epochs_cross_path(spark, tmp_path):
    """Interleaved Spark-path and local-path writes: latest epoch wins
    identically through both readers."""
    vol = Volume.create(spark, str(tmp_path / "v"), _info())
    a = _arr((96, 64, 80), seed=1)
    b = _arr((32, 32, 32), seed=2)
    vol.local_io = False
    vol.write(a, (0, 0, 0))          # epoch 0, Spark-written files
    vol.local_io = True
    vol.write(b, (32, 32, 32))       # epoch 1, pyarrow-written file
    want = a.copy()
    want[32:64, 32:64, 32:64] = b
    for reader_local in (True, False):
        vol.local_io = reader_local
        out, _ = vol.cutout(((0, 96), (0, 64), (0, 80)))
        assert (out == want).all(), f"reader_local={reader_local}"


@pytest.mark.parametrize("enc", ["raw", "gzip", "blosclz"])
def test_local_roundtrip_encodings(spark, tmp_path, enc):
    arr = _arr((64, 32, 32), dtype="uint16")
    vol = Volume.create(spark, str(tmp_path / enc),
                        _info(enc=enc, size=(64, 32, 32), dtype="uint16"))
    assert vol._local_chunks_dir() is not None
    vol.write(arr, (0, 0, 0))
    out, _ = vol.cutout(((0, 64), (0, 32), (0, 32)))
    assert (out == arr).all()
    # and the Spark reader decodes the locally-written payloads
    vol.local_io = False
    out2, _ = vol.cutout(((0, 64), (0, 32), (0, 32)))
    assert (out2 == arr).all()


def test_local_multichannel_parity(spark, tmp_path):
    arr = _arr((32, 32, 64, 3))
    vol = Volume.create(spark, str(tmp_path / "mc"),
                        _info(size=(32, 32, 64), nc=3))
    vol.write(arr, (0, 0, 0))
    out, _ = vol.cutout(((0, 32), (0, 32), (0, 64)))
    assert out.shape == (32, 32, 64, 3) and (out == arr).all()
    vol.local_io = False
    out2, _ = vol.cutout(((3, 30), (0, 32), (11, 40)))
    vol.local_io = True
    out3, _ = vol.cutout(((3, 30), (0, 32), (11, 40)))
    assert (out2 == out3).all()


def test_local_missing_chunk_semantics(spark, tmp_path):
    vol = Volume.create(spark, str(tmp_path / "v"), _info(),
                        fill_missing=False)
    vol.write(_arr((32, 32, 32)), (0, 0, 0))
    with pytest.raises(MissingChunkError):
        vol.cutout(((0, 96), (0, 64), (0, 80)))
    vol.fill_missing = True
    out, _ = vol.cutout(((0, 64), (0, 32), (0, 32)))
    assert (out[32:, :, :] == 0).all()


def test_local_io_disabled_for_remote_scheme(spark, tmp_path):
    vol = Volume(spark, "viewfs://cluster/data/v", _info())
    assert vol._local_chunks_dir() is None
    local = Volume(spark, str(tmp_path / "v"), _info())
    assert local._local_chunks_dir() is not None
    local.local_io = False
    assert local._local_chunks_dir() is None
