"""Operator registry: every implemented query + its DuckDB oracle.

The driver contract (__spark_entry__.py) re-exports these; tests and
bench.py iterate the same registry so coverage stays in one place.
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
                                          round11e,
                                          similarity, temporal,
                                          text, tpch_canon, tpch_deep,
                                          tpch_final,
                                          tpch_more, tpch_shapes,
                                          volume_agglo,
                                          volume_analytics, volume_channels,
                                          volume_components, volume_qc,
                                          volume_pyramid, volume_rag,
                                          volume_seg, volume_stencil)

# ordering is the driver-grading contract: new modules (graph/temporal/
# retrieval round 8, tpch_deep round 9) append AFTER extensions so
# names land after the graded 50-query prefix
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
            round11e)

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
