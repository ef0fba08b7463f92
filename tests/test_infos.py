"""Info metadata tests — mirrors reference test/Infos.jl (JSON round-trip,
mip generation) using the F1/F2 fixtures."""

import json

import numpy as np
import pytest

from bigarrays_jl_spark.infos import DATATYPE_MAP, Info, InfoScale

F1_JSON = json.dumps({
    "num_channels": 1, "type": "image", "data_type": "uint8", "scales": [
        {"encoding": "gzip", "chunk_sizes": [[100, 100, 5]], "key": "6_6_30",
         "resolution": [6, 6, 30], "voxel_offset": [-300, -300, -10],
         "size": [510, 510, 2022]},
        {"encoding": "gzip", "chunk_sizes": [[100, 100, 5]], "key": "12_12_30",
         "resolution": [12, 12, 30], "voxel_offset": [-597, -597, -103],
         "size": [12286, 11262, 2046]},
    ]})


def test_f1_roundtrip():
    info = Info.from_json(F1_JSON)
    assert info.data_type == "uint8"
    assert info.dtype == np.uint8
    assert info.num_channels == 1
    assert info.ndim == 3
    assert len(info.scales) == 2
    s0 = info.scale(0)
    assert s0.chunk_size == (100, 100, 5)
    assert s0.voxel_offset == (-300, -300, -10)
    assert s0.volume_size == (510, 510, 2022)
    # round-trip
    again = Info.from_json(info.to_json())
    assert again == info


REFERENCE_INFO = "/root/reference/asset/info"


@pytest.mark.skipif(not __import__("os").path.exists(REFERENCE_INFO),
                    reason="reference checkout not present")
def test_reference_asset_info_roundtrip():
    # the reference's own fixture: a real 10-mip production uint32
    # segmentation layer (test/Infos.jl parses this same file)
    with open(REFERENCE_INFO) as f:
        raw = f.read()
    info = Info.from_json(raw)
    assert info.layer_type == "segmentation"
    assert info.data_type == "uint32"
    assert info.num_channels == 1
    assert len(info.scales) == 10
    s0 = info.scale(0)
    assert s0.key == "5_5_45"
    assert s0.chunk_size == (64, 64, 56)
    assert s0.volume_size == (69888, 34048, 1792)
    assert s0.voxel_offset == (14720, 12032, 16400)
    assert s0.encoding == "raw"
    assert info.scale(9).key == "2560_2560_45"
    # full JSON round-trip preserves every scale
    again = Info.from_json(info.to_json())
    assert again == info
    # mip metadata generation from the real layer matches the stored
    # next level's key (x,y resolution doubles, z unchanged)
    assert s0.next_mip().key == info.scale(1).key


def test_dtype_map_complete():
    # src/Infos.jl:6-14 — full supported set
    assert set(DATATYPE_MAP) == {
        "bool", "uint8", "uint16", "uint32", "uint64", "float32", "float64"}


def test_invalid_dtype_rejected():
    with pytest.raises(ValueError):
        Info(data_type="int8")


def test_next_mip_semantics():
    # src/Infos.jl:162-178: halve x,y resolution & size; z unchanged;
    # chunk size and encoding carried over
    s = InfoScale(key="4_4_40", chunk_size=(64, 64, 56), encoding="raw",
                  resolution=(4, 4, 40), volume_size=(69888, 34048, 1792),
                  voxel_offset=(14720, 12032, 16400))
    n = s.next_mip()
    assert n.resolution == (8, 8, 40)
    assert n.key == "8_8_40"
    assert n.chunk_size == (64, 64, 56)
    assert n.encoding == "raw"
    assert n.volume_size == (34944, 17024, 1792)
    assert n.voxel_offset == (7360, 6016, 16400)


def test_next_mip_odd_geometry_floors():
    # Julia div truncates: odd sizes/offsets floor toward zero
    # (src/Infos.jl:169-178) — consistent with downsample() dropping odd
    # trailing rows instead of padding a ceil voxel.  Fractional
    # resolutions round half-even to int in the key (round(Int, x)).
    s = InfoScale(key="3_3_40", chunk_size=(8, 8, 4), encoding="gzip",
                  resolution=(3, 3, 40), volume_size=(65, 63, 10),
                  voxel_offset=(3, -3, 5))
    n = s.next_mip()
    assert n.volume_size == (32, 31, 10)
    assert n.voxel_offset == (1, -1, 5)
    assert n.resolution == (6, 6, 40)
    assert n.key == "6_6_40"
    # half-even rounding in the key for fractional resolutions
    s2 = InfoScale(key="x", chunk_size=(8, 8, 4), resolution=(2.25, 2.25, 40),
                   volume_size=(4, 4, 4))
    assert s2.next_mip().key == "4_4_40"  # round(4.5) == 4 (half-even)


def test_with_mips():
    info = Info.from_json(F1_JSON)
    info10 = info.with_mips(10)
    assert len(info10.scales) == 10
    # existing scales untouched
    assert info10.scales[:2] == info.scales


def test_channel_chunk_shape():
    info = Info(data_type="float32", num_channels=3, scales=[
        InfoScale(key="1_1_1", chunk_size=(64, 64, 16),
                  volume_size=(256, 256, 64))])
    assert info.ndim == 4
    assert info.chunk_shape(0) == (64, 64, 16, 3)
