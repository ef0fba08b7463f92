"""Round-17 operator tests: span-level duplicated-text excision."""
import pytest
from pyspark.sql import functions as F

from bigarrays_jl_spark.operators.dedup import RUN_LEN
from bigarrays_jl_spark.operators.round17 import dedup_span_excise


@pytest.fixture()
def crafted_dir(spark, tmp_path):
    """Four docs engineered around RUN_LEN=8 windows:

    - doc 0: 10 distinct tokens (3 windows, all canonical — nothing
      excised from the earliest doc).
    - doc 1: same first 8 tokens as doc 0 (one duplicated window ->
      8 positions excised) then distinct tail.
    - doc 2: doc 0's full 10 tokens verbatim (3 duplicated windows
      whose OVERLAPPING coverage must union to 10, not 24).
    - doc 3: fewer than RUN_LEN tokens (no windows; zero row still
      present).
    """
    v = [f"w{i}" for i in range(10)]        # doc 0's tokens
    tail = [f"x{i}" for i in range(4)]
    rows = [(0, " ".join(v)),
            (1, " ".join(v[:8] + tail)),
            (2, " ".join(v)),
            (3, "a b c")]
    (spark.createDataFrame(rows, "doc_id long, text string")
     .write.parquet(f"{tmp_path}/documents.parquet"))
    return str(tmp_path)


def test_span_excise_first_occurrence_wins_and_overlap_union(
        spark, crafted_dir):
    assert RUN_LEN == 8, "crafted fixture encodes RUN_LEN=8 geometry"
    got = {r["doc_id"]: r.asDict()
           for r in dedup_span_excise(spark, crafted_dir).collect()}
    # doc 0 is globally earliest at every one of its windows: canonical,
    # untouched.
    assert got[0] == {"doc_id": 0, "n_tok": 10, "n_dup_win": 0,
                      "n_excised": 0, "n_clean_tok": 10}
    # doc 1 repeats exactly one window (v[0..7]) -> 8 tokens excised.
    assert got[1] == {"doc_id": 1, "n_tok": 12, "n_dup_win": 1,
                      "n_excised": 8, "n_clean_tok": 4}
    # doc 2 repeats all 3 windows; their coverage overlaps — the union
    # is the whole 10-token doc, NOT 3*8.
    assert got[2] == {"doc_id": 2, "n_tok": 10, "n_dup_win": 3,
                      "n_excised": 10, "n_clean_tok": 0}
    # doc 3 is shorter than a window: present with zeros.
    assert got[3] == {"doc_id": 3, "n_tok": 3, "n_dup_win": 0,
                      "n_excised": 0, "n_clean_tok": 3}


def test_span_excise_matches_python_reference(spark, sf_dir):
    docs = [(r["doc_id"], r["text"]) for r in
            spark.read.parquet(f"{sf_dir}/documents.parquet")
            .select("doc_id", "text").collect()]
    # plain-Python twin of the operator's contract
    first, occs, ntok = {}, [], {}
    for doc_id, text in sorted(docs):
        t = text.strip().lower().split()
        ntok[doc_id] = len(t)
        for pos in range(len(t) - RUN_LEN + 1):
            w = " ".join(t[pos:pos + RUN_LEN])
            if w not in first:
                first[w] = (doc_id, pos)
            elif first[w] != (doc_id, pos):
                occs.append((doc_id, pos))
    cover = {}
    for doc_id, pos in occs:
        cover.setdefault(doc_id, set()).update(
            range(pos, pos + RUN_LEN))
    want = {d: (ntok[d],
                sum(1 for o in occs if o[0] == d),
                len(cover.get(d, ())))
            for d in ntok}
    got = {r["doc_id"]: (r["n_tok"], r["n_dup_win"], r["n_excised"])
           for r in dedup_span_excise(spark, sf_dir).collect()}
    assert got == want


def test_span_excise_plan_has_no_pair_join(spark, sf_dir):
    plan = (dedup_span_excise(spark, sf_dir)
            ._jdf.queryExecution().executedPlan().toString())
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_temperature_mix_invariants(spark, sf_dir):
    from bigarrays_jl_spark.operators.round17 import (
        MIX_BUDGET, pipeline_temperature_mix)
    rows = pipeline_temperature_mix(spark, sf_dir).collect()
    assert sum(r.alloc for r in rows) == MIX_BUDGET
    # T=2 flattens: the head language's weight drops below its raw
    # share, tail languages rise above theirs
    head = max(rows, key=lambda r: r.share)
    tail = min(rows, key=lambda r: r.share)
    assert head.weight < head.share
    assert tail.weight > tail.share
    # weights still order like shares (monotone transform)
    by_share = sorted(rows, key=lambda r: (r.share, r.lang))
    assert by_share == sorted(rows, key=lambda r: (r.weight, r.lang))


def test_temperature_mix_t1_is_proportional(spark, sf_dir):
    from bigarrays_jl_spark.operators.round17 import (
        pipeline_temperature_mix)
    rows = pipeline_temperature_mix(spark, sf_dir, temperature=1.0) \
        .collect()
    for r in rows:
        assert abs(r.weight - r.share) < 1e-6, (r.lang, r.share, r.weight)


def test_temperature_mix_rejects_bad_temperature(spark, sf_dir):
    from bigarrays_jl_spark.operators.round17 import (
        pipeline_temperature_mix)
    with pytest.raises(ValueError, match="positive"):
        pipeline_temperature_mix(spark, sf_dir, temperature=0)
