"""Partition-count invariance: the float-parity canon's core claim is
that every rounded/compared output is ORDER-INDEPENDENT — exact decimal
partials for cross-partition accumulation, one double division after,
no rounding of tie-prone quotients.  These tests re-run the most
float-sensitive registry queries under a different
spark.sql.shuffle.partitions and require bit-identical results: a query
whose values move with the partitioning would only pass the DuckDB
oracle by luck of the current layout, and would silently drift on a
real cluster where partitioning is a tuning knob.
"""

import pytest

PARTITION_SENSITIVE = [
    "q01_pricing_summary",      # decimal money sums
    "text_bm25",                # decimal per-doc term-score sums
    "graph_pagerank",           # iterated decimal contribution sums
    "events_gapfill",           # unrounded decimal-sum/count means
    "events_interpolate",       # blend over the same means
    "events_journeys",          # unrounded count/total shares
    "text_unigram_logprob",     # decimal-accumulated logprob means
    "q42_stats_aggs",           # decimal power sums
    "graph_pagerank_lsh",       # iterated rank/deg decimal sums (r9)
    "q51_top_supplier",         # decimal revenue + global-max equality (r9)
    "chi2_type_dow",            # round-9 decimal cell sums (r11)
    "q70_mad_outliers",         # bucketed two-level quantile picks (r11)
    "sample_weighted_exact",    # exact integer A-RES ranking (r11)
    "ks_two_sample",            # integer sup-norm over cum window (r11)
    "theil_sen_slope",          # per-pair IEEE slopes + median pick (r11)
    "text_zipf_fit",            # round-9 decimal OLS moments (r11)
    "sketch_union_distinct",    # kth-min over merged hash sets (r12)
    "text_tfidf_topk",          # IEEE tf·idf + per-doc rank ties (r12)
    "q98_fano_burstiness",      # exact integer moments, one division (r12)
    "q84_rfm_segments",         # 3× distributed_ntile offsets (r12 rewrite)
    "interval_overlap_join",    # prefix-sum island ids + grid join (r12)
    "retrieval_rrf_hybrid",     # two distributed_prefix_sum ranks (r12)
    "lorenz_curve",             # bucketed_running dual cum sums (r13)
    "q86_kaplan_meier",         # bucketed_running decimal logs (r13)
    "emb_outlier_zscore",       # fixed-point stats + ordered fold (r14)
]


@pytest.mark.parametrize("qname", PARTITION_SENSITIVE)
def test_result_identical_under_different_shuffle_partitions(
        spark, sf_dir, qname):
    from bigarrays_jl_spark.operators import ALL_QUERIES
    fn = ALL_QUERIES[qname]
    orig = spark.conf.get("spark.sql.shuffle.partitions")
    base = sorted(map(tuple, fn(spark, sf_dir).collect()))
    assert base, qname
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "7")
        alt = sorted(map(tuple, fn(spark, sf_dir).collect()))
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", orig)
    assert base == alt, f"{qname} output moved with the partitioning"
