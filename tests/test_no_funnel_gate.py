"""Repo-wide no-funnel gate (r11 verdict task 2).

Walks EVERY registry query's physical plan and fails on any Window fed
by an ``Exchange SinglePartition`` — the whole-table ORDER BY funnel
that is correct at test scale and dead at 100 TB — unless the query is
on the explicit allowlist below, where each entry carries a one-line
justification of why its window input is BOUNDED (value-domain
compressed: the row count through the single task depends on the value
domain, not the corpus size).  The allowlist is mirrored in SCALE.md.

This is the structural guard that keeps the funnel class dead as the
registry grows: a new operator with a bare ``Window.orderBy(...)`` over
corpus-growing input fails here on the first test run, pointing at
operators/ordering.py (distributed_prefix_sum / distributed_ntile /
grouped_ntile / bucketed_quantile_pick) for the scale-safe rewrite.
"""

from bigarrays_jl_spark.operators import ALL_QUERIES
from bigarrays_jl_spark.plans.explain import single_partition_windows

# query -> why its single-partition window input is bounded.  Keep every
# entry justified by a VALUE DOMAIN (fixed regardless of corpus size),
# never by "the table is small today".  EMPTY since r13: the last four
# value-domain funnels (KS/MWU CDF merges, the Pareto running max, the
# Kaplan–Meier risk set) were rewritten on ordering.bucketed_running
# with bit-identical oracle hashes — any future entry needs a written
# bound AND a reason bucketed_running can't express it.
ALLOWED_BOUNDED_WINDOWS: dict[str, str] = {}


def test_no_single_partition_window_anywhere(spark, sf_dir):
    offenders = {}
    for name, fn in ALL_QUERIES.items():
        windows = single_partition_windows(fn(spark, sf_dir))
        if windows and name not in ALLOWED_BOUNDED_WINDOWS:
            offenders[name] = windows[0][:120]
    assert not offenders, (
        "SinglePartition-fed Window over non-allowlisted input — rewrite "
        "with operators/ordering.py primitives or (only if the input is "
        "value-domain bounded) add an allowlist entry with the bound: "
        f"{offenders}")


def test_allowlist_entries_still_funnel(spark, sf_dir):
    # an allowlist entry whose query no longer has the window is stale —
    # force the list to shrink as operators get de-funneled
    stale = [n for n in ALLOWED_BOUNDED_WINDOWS
             if not single_partition_windows(ALL_QUERIES[n](spark, sf_dir))]
    assert not stale, f"allowlisted but funnel-free (remove): {stale}"


def test_allowlist_entries_are_registered():
    # vacuous while the allowlist is empty; guards future re-additions
    assert all(n in ALL_QUERIES for n in ALLOWED_BOUNDED_WINDOWS)


def test_detector_sees_window_in_join_branch(spark):
    """Gate self-test (r12 advice): a SinglePartition window rendered as
    the ':-' FIRST child of a binary node (rank-then-join) must still be
    detected — the '+- '-only regex missed exactly this shape."""
    from pyspark.sql import Window, functions as F
    df = spark.range(100).withColumn("v", F.col("id") % 7)
    ranked = df.withColumn(
        "r", F.row_number().over(Window.orderBy("v")))
    joined = ranked.join(spark.range(100), "id")
    hits = single_partition_windows(joined)
    assert hits, "rank-then-join funnel not detected (':-' branch)"
    # and the detector still finds the plain (root-chain) shape
    assert single_partition_windows(ranked)
