"""Plan pins for round-10 batches 9-13 — the scale-critical properties."""

from bigarrays_jl_spark.operators.round10i import q80_welch_ttest, q81_cuped
from bigarrays_jl_spark.operators.round10j import q82_gini
from bigarrays_jl_spark.operators.round10m import (q89_stratified_effect,
                                                   q90_benford,
                                                   q91_dow_seasonality)
from bigarrays_jl_spark.plans.explain import formatted_plan, simple_plan


def test_welch_is_one_conditional_pass(spark, sf_dir):
    """Both arms' moments come from ONE scan + ONE agg pair — never a
    per-arm scan or a self-join."""
    plan = simple_plan(q80_welch_ttest(spark, sf_dir))
    assert "Join" not in plan
    assert plan.count("Scan parquet") == 1


def test_cuped_reads_rollup_not_facts_twice(spark, sf_dir):
    """The θ moments and the arm means must consume the CACHED per-user
    rollup; the single-row moment table broadcasts back."""
    plan = simple_plan(q81_cuped(spark, sf_dir))
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
    # the fact scan happens once; both consumers read the checkpoint
    assert plan.count("Scan parquet") <= 1
    assert "CartesianProduct" not in plan


def test_gini_window_runs_over_histogram(spark, sf_dir):
    """The cumulative window's input must be the (flag, cents)
    aggregate — HashAggregate BELOW Window in the tree — never raw
    rows."""
    plan = formatted_plan(q82_gini(spark, sf_dir))
    tree = plan.split("\n\n")[0].splitlines()
    wi = next(i for i, ln in enumerate(tree) if "Window" in ln)
    below = "\n".join(tree[wi + 1:])
    assert "HashAggregate" in below       # window input is the histogram
    assert "partial_count" in plan        # map-side combine on the fold


def test_stratified_effect_two_folds_no_join(spark, sf_dir):
    plan = simple_plan(q89_stratified_effect(spark, sf_dir))
    assert "Join" not in plan
    assert plan.count("Scan parquet") == 1


def test_benford_broadcasts_total(spark, sf_dir):
    plan = simple_plan(q90_benford(spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" not in plan


def test_dow_totals_broadcast_into_cells(spark, sf_dir):
    plan = simple_plan(q91_dow_seasonality(spark, sf_dir))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
