"""Volume QC: per-slice stats and adjacent-slice NCC — closed-form
registry parity plus an adversarial random volume where every z-pair
crosses chunk content that the face merge must reassemble."""
import numpy as np

from bigarrays_jl_spark.operators.volume_qc import (QC_BOX, slice_ncc,
                                                    volume_slice_ncc,
                                                    volume_slice_qc)


def _demo_array():
    x, y, z = np.meshgrid(np.arange(64), np.arange(64), np.arange(64),
                          indexing="ij")
    return ((x * 31 + y * 7 + z) % 256).astype(np.int64)


def _pearson(a, b):
    a = a.ravel().astype(np.float64)
    b = b.ravel().astype(np.float64)
    n = a.size
    return ((n * (a * b).sum() - a.sum() * b.sum())
            / np.sqrt((n * (a * a).sum() - a.sum() ** 2)
                      * (n * (b * b).sum() - b.sum() ** 2)))


def test_slice_qc_matches_numpy(spark, sf_dir):
    got = {r["z"]: r for r in volume_slice_qc(spark, sf_dir).collect()}
    arr = _demo_array()
    for z in range(64):
        plane = np.sort(arr[:, :, z].ravel())
        r = got[z]
        assert r["n_voxels"] == plane.size
        assert abs(r["mean_v"] - plane.mean()) < 1e-9
        assert r["min_v"] == plane[0] and r["max_v"] == plane[-1]
        tot = plane.size
        cum = np.arange(1, tot + 1)
        for num, den, name in ((1, 10, "p10"), (1, 2, "p50"),
                               (9, 10, "p90")):
            v = int(plane[np.argmax(den * cum >= num * tot)])
            assert r[name] == v, (z, name)
    assert len(got) == 64


def test_slice_ncc_matches_numpy_closed_form(spark, sf_dir):
    got = {r["z"]: (r["n_pairs"], r["ncc"])
           for r in volume_slice_ncc(spark, sf_dir).collect()}
    arr = _demo_array()
    for z in range(63):
        n, r = got[z]
        assert n == 64 * 64
        assert abs(r - _pearson(arr[:, :, z], arr[:, :, z + 1])) < 1e-9
    assert len(got) == 63


def _noise_volume(spark, tmp_path, side=32):
    from bigarrays_jl_spark.infos import Info
    from bigarrays_jl_spark.volume import Volume

    info = Info.from_dict({
        "num_channels": 1, "type": "image", "data_type": "uint8",
        "scales": [{"encoding": "gzip", "chunk_sizes": [[16, 16, 16]],
                    "key": "1_1_1", "resolution": [1, 1, 1],
                    "voxel_offset": [0, 0, 0], "size": [side] * 3}]})
    vol = Volume.create(spark, str(tmp_path / "qcvol"), info)
    rng = np.random.default_rng(20260815)
    arr = rng.integers(0, 256, size=(side, side, side),
                       dtype=np.uint8)
    vol.write(arr, (0, 0, 0))
    return vol, arr


def test_slice_ncc_noise_volume_and_restricted_box(spark, tmp_path):
    """Random volume: every boundary z-pair must be stitched from two
    chunks' face planes; also a request box that clips mid-chunk."""
    vol, arr = _noise_volume(spark, tmp_path)
    got = {r["z"]: (r["n_pairs"], r["ncc"])
           for r in slice_ncc(vol, ((0, 32), (0, 32), (0, 32)))
           .collect()}
    assert len(got) == 31
    for z in range(31):
        assert got[z][0] == 32 * 32
        assert abs(got[z][1]
                   - _pearson(arr[:, :, z], arr[:, :, z + 1])) < 1e-9, z
    # chunk-boundary pair (15,16) was stitched across chunks — it is
    # present and matches (asserted above); now a clipped box
    box = ((3, 29), (5, 30), (10, 22))
    sub = arr[3:29, 5:30, 10:22]
    got2 = {r["z"]: (r["n_pairs"], r["ncc"])
            for r in slice_ncc(vol, box).collect()}
    assert len(got2) == 11
    for k in range(11):
        z = 10 + k
        assert got2[z][0] == 26 * 25
        assert abs(got2[z][1]
                   - _pearson(sub[:, :, k], sub[:, :, k + 1])) < 1e-9, z
