"""The driver grades the FIRST 50 registry names in order
(CORRECTNESS_r{N}.json) — any insertion or reorder ahead of position 50
silently swaps which queries are graded.  This pin freezes the graded
prefix; new operators must append in modules AFTER the prefix (see
operators/__init__.py _MODULES ordering note)."""


GRADED_PREFIX = ['q01_pricing_summary', 'q02_filter_project', 'q03_join_revenue', 'q04_star_dims', 'q05_semi_join', 'q06_anti_join', 'q07_window_rank', 'q08_window_running', 'q09_rollup', 'q10_cube', 'q11_topk', 'q12_setops', 'q41_setops_all', 'q43_histogram', 'q13_distinct_agg', 'q14_string_funcs', 'q15_date_funcs', 'q16_case_buckets', 'q17_exists', 'q18_having', 'q19_grouping_sets', 'q20_pivot', 'q21_array_funcs', 'q22_range_join', 'q23_json_extract', 'q24_asof_join', 'q25_percentiles', 'q26_unpivot', 'q27_math_funcs', 'q28_ntile', 'q29_bucketed_range_join', 'q30_dedup_rows', 'q31_approx_aggs', 'q32_left_outer', 'q33_full_outer', 'q34_cross_join', 'q35_window_partition_stats', 'q36_salted_agg', 'q37_map_funcs', 'q38_salted_join', 'q39_range_frame_window', 'q40_correlated_scalar', 'q42_stats_aggs', 'volume_cutout_sum', 'dedup_exact', 'dedup_incremental', 'dedup_fingerprint', 'dedup_minhash_pairs', 'dedup_ngram_jaccard', 'dedup_embedding_cosine']


def test_graded_prefix_is_frozen():
    from bigarrays_jl_spark.operators import ALL_QUERIES
    assert list(ALL_QUERIES)[:50] == GRADED_PREFIX


def test_every_query_has_oracle_or_tolerance():
    from bigarrays_jl_spark.operators import (ALL_ORACLES, ALL_QUERIES,
                                              ALL_TOLERANCE_ORACLES)
    missing = [n for n in ALL_QUERIES
               if n not in ALL_ORACLES and n not in ALL_TOLERANCE_ORACLES]
    assert not missing, missing
