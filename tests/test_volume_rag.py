"""Region adjacency graph: numpy brute-force parity on an adversarial
noise volume, restricted-request semantics, and registry twin."""
import numpy as np


def _brute_rag(labels):
    """All 6-connected (label_a<label_b, both nonzero) contact-face
    counts via numpy shifts."""
    want = {}
    for ax in range(3):
        lo = [slice(None)] * 3
        hi = [slice(None)] * 3
        lo[ax] = slice(0, labels.shape[ax] - 1)
        hi[ax] = slice(1, labels.shape[ax])
        la, lb = labels[tuple(lo)], labels[tuple(hi)]
        m = (la != lb) & (la != 0) & (lb != 0)
        for a, b in zip(la[m].tolist(), lb[m].tolist()):
            k = (min(a, b), max(a, b))
            want[k] = want.get(k, 0) + 1
    return want


def _noise_volume(spark, tmp_path, side=32):
    from bigarrays_jl_spark.infos import Info
    from bigarrays_jl_spark.volume import Volume

    info = Info.from_dict({
        "num_channels": 1, "type": "segmentation", "data_type": "uint32",
        "scales": [{"encoding": "gzip", "chunk_sizes": [[16, 16, 16]],
                    "key": "1_1_1", "resolution": [1, 1, 1],
                    "voxel_offset": [0, 0, 0], "size": [side] * 3}]})
    vol = Volume.create(spark, str(tmp_path / "ragvol"), info)
    x, y, z = np.meshgrid(*([np.arange(side)] * 3), indexing="ij")
    v = (3 * x + 5 * y + 7 * z) % 11
    labels = np.where(v < 6, v + 1, 0).astype(np.uint32)
    vol.write(labels, (0, 0, 0))
    return vol, labels


def test_region_adjacency_vs_numpy(spark, tmp_path):
    from bigarrays_jl_spark.operators.volume_rag import region_adjacency

    vol, labels = _noise_volume(spark, tmp_path)
    got = {(r["label_a"], r["label_b"]): r["contact_faces"]
           for r in region_adjacency(vol).collect()}
    want = _brute_rag(labels.astype(np.int64))
    assert len(want) > 5, "noise volume must produce a non-trivial RAG"
    assert got == want


def test_region_adjacency_restricted_request(spark, tmp_path):
    """A request interior to the volume counts only contacts with BOTH
    voxels inside the request — including cuts through chunk interiors
    and across chunk boundaries."""
    from bigarrays_jl_spark.operators.volume_rag import region_adjacency

    vol, labels = _noise_volume(spark, tmp_path)
    req = ((3, 29), (8, 24), (5, 32))
    got = {(r["label_a"], r["label_b"]): r["contact_faces"]
           for r in region_adjacency(vol, req).collect()}
    sub = labels[3:29, 8:24, 5:32].astype(np.int64)
    assert got == _brute_rag(sub)


def test_volume_rag_registry_is_blockwise(spark):
    """The registry query's RAG: every edge's contact area is a
    multiple of nothing smaller than a full 24² block face here —
    and its total must be 9 surviving block adjacencies × 24²."""
    from bigarrays_jl_spark.operators.volume_rag import volume_rag

    rows = volume_rag(spark, "unused").collect()
    total = sum(r["contact_faces"] for r in rows)
    assert total == 9 * 24 * 24
