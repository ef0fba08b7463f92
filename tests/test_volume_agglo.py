"""Agglomeration loop: threshold merge over the RAG + distributed
relabel, verified against numpy/python twins end to end."""
import numpy as np

from bigarrays_jl_spark.infos import Info
from bigarrays_jl_spark.volume import Volume


def _union_find_groups(edges, nodes):
    parent = {n: n for n in nodes}

    def find(a):
        while parent[a] != a:
            a = parent[a]
        return a

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in nodes}


def test_agglomerate_map_matches_union_find(spark, tmp_path):
    from bigarrays_jl_spark.operators.volume_agglo import (
        AGG_MIN_CONTACT, demo_agglo_volume, agglomerate_map)
    from bigarrays_jl_spark.operators.volume_rag import region_adjacency

    vol = demo_agglo_volume(spark)
    rag = region_adjacency(vol)
    rag_rows = [(r["label_a"], r["label_b"], r["contact_faces"])
                for r in rag.collect()]
    got = {r["label"]: r["merged_label"]
           for r in agglomerate_map(rag, AGG_MIN_CONTACT).collect()}
    nodes = {a for a, _, _ in rag_rows} | {b for _, b, _ in rag_rows}
    strong = [(a, b) for a, b, n in rag_rows if n >= AGG_MIN_CONTACT]
    weak_only = [(a, b) for a, b, n in rag_rows if n < AGG_MIN_CONTACT]
    assert strong and weak_only, "threshold must discriminate"
    assert got == _union_find_groups(strong, nodes)
    # the merge is non-trivial: >1 group, and one group has >1 member
    roots = set(got.values())
    assert 1 < len(roots) < len(nodes)


def test_relabel_volume_applies_merge(spark, tmp_path):
    from bigarrays_jl_spark.operators.volume_agglo import (
        AGG_MIN_CONTACT, demo_agglo_volume, agglomerate_map,
        relabel_volume)
    from bigarrays_jl_spark.operators.volume_rag import region_adjacency

    vol = demo_agglo_volume(spark)
    merge = {r["label"]: r["merged_label"]
             for r in agglomerate_map(region_adjacency(vol),
                                      AGG_MIN_CONTACT).collect()}
    dest = Volume.create(spark, str(tmp_path / "merged"),
                         Info.from_dict(vol.info.to_dict()))
    relabel_volume(vol, merge, dest)
    src, _ = vol.cutout(vol.vol_box)
    out, _ = dest.cutout(dest.vol_box)
    want = np.vectorize(lambda v: merge.get(v, v))(src.astype(np.int64))
    np.testing.assert_array_equal(out.astype(np.int64), want)
    # background stays background, merged volume has fewer labels
    assert set(np.unique(out)) == set(merge.values()) | {0}
    assert len(np.unique(out)) < len(np.unique(src))


def test_relabel_empty_map_is_identity(spark, tmp_path):
    from bigarrays_jl_spark.operators.volume_agglo import (
        demo_agglo_volume, relabel_volume)

    vol = demo_agglo_volume(spark)
    dest = Volume.create(spark, str(tmp_path / "ident"),
                         Info.from_dict(vol.info.to_dict()))
    relabel_volume(vol, {}, dest)
    src, _ = vol.cutout(vol.vol_box)
    out, _ = dest.cutout(dest.vol_box)
    np.testing.assert_array_equal(out, src)


def test_merged_rag_has_no_strong_internal_edges(spark, tmp_path):
    """After relabel, the RAG of the merged volume has no edge between
    two labels that were merged together — the loop actually closed."""
    from bigarrays_jl_spark.operators.volume_agglo import (
        AGG_MIN_CONTACT, demo_agglo_volume, agglomerate_map,
        relabel_volume)
    from bigarrays_jl_spark.operators.volume_rag import region_adjacency

    vol = demo_agglo_volume(spark)
    merge = {r["label"]: r["merged_label"]
             for r in agglomerate_map(region_adjacency(vol),
                                      AGG_MIN_CONTACT).collect()}
    dest = Volume.create(spark, str(tmp_path / "m2"),
                         Info.from_dict(vol.info.to_dict()))
    relabel_volume(vol, merge, dest)
    merged_edges = {(r["label_a"], r["label_b"])
                    for r in region_adjacency(dest).collect()}
    for a, b in merged_edges:
        assert a != b
        assert merge.get(a, a) == a and merge.get(b, b) == b
