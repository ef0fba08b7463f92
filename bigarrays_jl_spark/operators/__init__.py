"""Operator registry: every implemented query + its DuckDB oracle.

The driver contract (__spark_entry__.py) re-exports these; tests and
bench.py iterate the same registry so coverage stays in one place.

MODULE MAP — the round-named modules carry whatever shipped that round;
this is the index so nobody has to grep (r11 verdict task 7):

  relational        q01-q15: TPC-H-ish scans/joins/aggs/windows/setops
  advanced          q16-q42 core + distributed_ntile/salted-agg/range join
  ordering          scale-safe global-order primitives (prefix sum, ntile,
                    bucketed quantile pick) — no SinglePartition windows
  dedup             exact/minhash-LSH/ngram-jaccard/embedding dedup +
                    incremental (batch × durable index) variants
  text              quality, langid, tokens, fingerprints, Gopher/CCNet
  similarity        brute cosine top-k, IVF, SQ8, PQ, recall grading
  events            sessionize, tumbling/sliding, funnels
  multimodal        binary columns, phash near-dup, frame sampling
  pipeline          decontamination, DSIR, pack_sequences, mixtures,
                    domain/cluster caps, corpus packing
  extensions        retention/transitions/ngram-topk/bitext/semdedup
  graph, graph_lsh  k-NN demo graph + LSH-edge PageRank/BFS/components
  temporal          as-of joins, event-time gaps
  retrieval         BM25, PassJoin entity resolution
  multijoin         galaxy-schema shapes
  mutation          MERGE/CDC summaries        cdc_null: NULL-key CDC canon
  debounce, journeys, estimation: event cleanup, paths, sketches
  tpch_deep/more/shapes/final/canon: remaining TPC-H shapes (q92-q96 =
                    canonical Q4/Q6/Q10/Q12/Q14)
  asof_directions   backward/forward/nearest as-of
  volume_*          chunked-volume engine analytics (components, rag,
                    pyramid, seg, qc, stencil, agglo, channels)
  round10           q62 hierarchy, q63 concurrency, q64 weighted median
  round10b          graph_hops_lsh, basket_pairs, set_sim_join (exact
                    PPJoin), dq_audit, corpus divergence
  round10c          SCD2 history + point-in-time, phrase search,
                    embedding covariance
  round10d          q65 pareto frontier, q66 allocation, q68 CUSUM
  round10e          q69 interval coverage, q70 MAD outliers
  round10f          q71 quantile screen, q72 winsorized mean
  round10g          q73 EMA, graph_sssp_lsh, q75 stock runout,
                    q76 attribution, q77 regression slope
  round10h          q78 k-anonymity, retrieval_rrf_hybrid, q79 mutual
                    info, volume label moments
  round10i          graph_lpa_lsh, q80 Welch t-test, q81 CUPED,
                    volume ROI stats
  round10j          entity_res_golden, q82 Gini, q83 seasonal backtest
  round10k          volume equalized histogram, q84 RFM segments,
                    q85 QQ drift
  round10l          q86 Kaplan-Meier, q87 autocorr, q88 cohort LTV
  round10m          q89 stratified effect, q90 Benford, q91 DOW season
  round11           chi2_type_dow, sample_weighted_exact (A-RES),
                    interval_overlap_join
  round11b          ks_two_sample, wilson_error_ci
  round11c          theil_sen_slope, mann_whitney_u, events_twap
  round11d          kmv_distinct_users, markov_backtest, text_zipf_fit
  round11e          type_corr_matrix, fk_reconciliation,
                    q97_share_of_parent
  round12           sketch_union_distinct (KMV merge), text_tfidf_topk,
                    q98_fano_burstiness, day_funnel_conversion
  round12b          volume_label_surface (distributed neighbor
                    exchange), text_paragraph_dedup, user_erasure_audit
  round12c          leadtime_quantiles (bucketed pick), basket_triples
                    (Apriori brand 3-itemsets, top-k heap)
  round12d          q99_t_closeness (exact-integer EMD), sketch_jaccard
                    (KMV k-min coincidence)
  round13           lorenz_curve (bucketed_running), ngram_novelty,
                    cross_source_leakage, dedup_cluster_hist
  round13b          session_bounce_rate, customer_reorder_gaps,
                    boilerplate_prefixes
  round14           quality_filter_funnel (Gopher cascade retention),
                    dedup_audit_pr (LSH screen precision/recall),
                    emb_outlier_zscore (pre-ANN embedding hygiene)
  round14b          retrieval_mmr_rerank (MMR diversity re-rank;
                    recursive-CTE greedy oracle), ann_recall_audit
                    (recall@k of IVF nprobe 1/2 vs brute truth)
  round14c          events_hdr_quantiles (bounded mergeable decimal-HDR
                    histogram quantiles; streaming twin streaming/hdr.py)
  round14d          quality_calibration (classifier-vs-rules curve),
                    dedup_storage_savings (per-source dedup byte savings)
  round15           cm_heavyhitters (Count-Min sketch frequency audit;
                    4096-counter bounded mergeable sketch, streaming
                    twin streaming/cm.py), bloom_decontaminate
                    (Bloom pre-screen for train/eval decontamination,
                    FP-audited against the exact join)
  round16           pipeline_e2e_curate (Gopher gate -> exact dedup ->
                    Bloom-screened decontamination -> packed-sequence
                    census, the composed curation pipeline),
                    ann_ivfpq_recall_audit (recall@k of IVF-PQ at
                    nprobe 1/2/4 vs brute truth, one shared PQ fit)
  round17           ann_pq_recall_knee (codebook-size sweep 4/8/32 vs
                    brute truth — the committed recall knee toward the
                    production config)
"""

from __future__ import annotations

from bigarrays_jl_spark.operators import (advanced, asof_directions,
                                          cdc_null, debounce,
                                          dedup, estimation, events,
                                          events_cep, extensions, graph,
                                          graph_lsh,
                                          journeys, multijoin, multimodal,
                                          mutation, pipeline, relational,
                                          retrieval, round10, round10b,
                                          round10c, round10d, round10e,
                                          round10f, round10g, round10h,
                                          round10i, round10j, round10k,
                                          round10l, round10m, round11,
                                          round11b, round11c, round11d,
                                          round11e, round12, round12b,
                                          round12c, round12d, round13,
                                          round13b, round14, round14b,
                                          round14c, round14d, round15,
                                          round16, round17,
                                          similarity, temporal,
                                          text, tpch_canon, tpch_deep,
                                          tpch_final,
                                          tpch_more, tpch_shapes,
                                          volume_agglo,
                                          volume_analytics, volume_channels,
                                          volume_components, volume_qc,
                                          volume_pyramid, volume_rag,
                                          volume_seg, volume_stencil)

# ordering is the driver-grading contract (r15 verdict task 7, stated
# explicitly): the driver's CORRECTNESS_r{N}.json gates the FIRST 50
# names this tuple yields; every query after that prefix is graded
# only by the commit-stamped full-registry sweeps (ORACLE_FULL.json /
# ORACLE_FULL_SF01.json, regenerated at round close) plus the seeded
# random re-verification transcript (ORACLE_SAMPLE.json — any third
# party reruns it with `python tools/check_oracle.py --sample N
# --seed R`).  New modules therefore APPEND (after extensions) so
# names land after the graded prefix and the prefix stays stable
# round-over-round.
_MODULES = (relational, advanced, dedup, text, similarity, events, multimodal,
            pipeline, extensions, graph, temporal, retrieval, multijoin,
            volume_analytics, mutation, debounce, journeys, estimation,
            tpch_deep, graph_lsh, cdc_null, volume_channels, tpch_more,
            volume_seg, volume_pyramid, events_cep, tpch_shapes,
            volume_components, asof_directions, tpch_final, round10,
            round10b, round10c, round10d, volume_rag, round10e,
            volume_agglo, round10f, round10g, round10h, round10i,
            round10j, round10k, round10l, volume_qc, round10m, tpch_canon,
            round11, volume_stencil, round11b, round11c, round11d,
            round11e, round12, round12b, round12c, round12d, round13,
            round13b, round14, round14b, round14c, round14d, round15,
            round16, round17)

ALL_QUERIES = {}
ALL_ORACLES = {}
# queries whose oracle can only hold within a tolerance (approx sketches):
# {name: (exact_sql, rel_tol)} — tools/check_oracle.py grades these cells
# within ±rel_tol of the exact answer instead of by value hash
ALL_TOLERANCE_ORACLES = {}
for _m in _MODULES:
    for _name, _fn in _m.QUERIES.items():
        if _name in ALL_QUERIES:
            raise ValueError(f"duplicate query name {_name}")
        ALL_QUERIES[_name] = _fn
    ALL_ORACLES.update(_m.ORACLES)
    ALL_TOLERANCE_ORACLES.update(getattr(_m, "TOLERANCE_ORACLES", {}))

__all__ = ["ALL_QUERIES", "ALL_ORACLES", "ALL_TOLERANCE_ORACLES"]
