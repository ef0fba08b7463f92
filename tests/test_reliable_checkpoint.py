"""Reliable-checkpoint mode (r13 verdict task 1): with
``sparkgraft.checkpoint.reliable=true`` + ``setCheckpointDir``, every
materialization inside the global-ordering primitives and the dedup LSH
tables swaps executor-local ``localCheckpoint`` for a reliable
``DataFrame.checkpoint`` — so on a real cluster with dynamic allocation
a lost executor recovers from storage instead of killing the job.

The switch must change WHERE blocks live and nothing else: these tests
re-run the primitives' most representative consumers in both modes and
require bit-identical row sets.  Coverage maps one query per swapped
call site:

- ``q84_rfm_segments``       → distributed_prefix_sum / distributed_ntile
- ``text_quality_buckets``   → grouped_ntile (per-group boundary maps)
- ``q70_mad_outliers``     → bucketed_quantile_pick (two-level picks)
- ``lorenz_curve``         → bucketed_running (dual cumulative sums)
- ``dedup_minhash_pairs``  → the LSH signature-table materialization
- ``dedup_components``     → the iterative label-propagation loop
"""

import pytest

RELIABLE_CONF = "sparkgraft.checkpoint.reliable"

PRIMITIVE_CONSUMERS = [
    "q84_rfm_segments",
    "text_quality_buckets",
    "q70_mad_outliers",
    "lorenz_curve",
    "dedup_minhash_pairs",
    "dedup_components",
]


def test_reliable_without_dir_raises(spark):
    """Misconfiguration (reliable=true, no checkpoint dir) must fail
    fast with an actionable message, not a late executor-side NPE.
    Spark has no way to UNSET a checkpoint dir, so this must run before
    the ckpt_dir fixture fires (it is defined first in this module) —
    skip defensively if some earlier test set one."""
    if spark.sparkContext.getCheckpointDir() is not None:
        pytest.skip("checkpoint dir already set in this session")
    from bigarrays_jl_spark.checkpointing import materialize
    spark.conf.set(RELIABLE_CONF, "true")
    try:
        with pytest.raises(RuntimeError, match="setCheckpointDir"):
            materialize(spark.range(5).toDF("id"))
    finally:
        spark.conf.set(RELIABLE_CONF, "false")


@pytest.fixture(scope="module")
def ckpt_dir(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("reliable_ckpt"))
    spark.sparkContext.setCheckpointDir(d)
    return d


@pytest.mark.parametrize("qname", PRIMITIVE_CONSUMERS)
def test_reliable_mode_bit_identical(spark, sf_dir, ckpt_dir, qname):
    from bigarrays_jl_spark.operators import ALL_QUERIES
    fn = ALL_QUERIES[qname]
    base = sorted(map(tuple, fn(spark, sf_dir).collect()))
    assert base, qname
    spark.conf.set(RELIABLE_CONF, "true")
    try:
        reliable = sorted(map(tuple, fn(spark, sf_dir).collect()))
    finally:
        spark.conf.set(RELIABLE_CONF, "false")
    assert base == reliable, \
        f"{qname} output changed under reliable checkpointing"


def test_materialize_default_is_local(spark):
    """Default mode must not require a checkpoint dir and must still
    truncate lineage (the checkpointed plan is a scan, not the original
    range→filter tree)."""
    from bigarrays_jl_spark.checkpointing import materialize
    df = materialize(spark.range(10).filter("id > 3"))
    assert df.count() == 6
    # a checkpointed DataFrame's logical plan is a leaf scan
    assert "ExistingRDD" in df._jdf.queryExecution().optimizedPlan().toString() \
        or "LogicalRDD" in df._jdf.queryExecution().optimizedPlan().toString() \
        or "Scan" in df._jdf.queryExecution().optimizedPlan().toString()
