"""Operator registry: every implemented query + its DuckDB oracle.

The driver contract (__spark_entry__.py) re-exports these; tests and
bench.py iterate the same registry so coverage stays in one place.
"""

from __future__ import annotations

from bigarrays_jl_spark.operators import (advanced, dedup, events, multimodal,
                                          pipeline, relational, similarity,
                                          text)

_MODULES = (relational, advanced, dedup, text, similarity, events, multimodal,
            pipeline)

ALL_QUERIES = {}
ALL_ORACLES = {}
for _m in _MODULES:
    for _name, _fn in _m.QUERIES.items():
        if _name in ALL_QUERIES:
            raise ValueError(f"duplicate query name {_name}")
        ALL_QUERIES[_name] = _fn
    ALL_ORACLES.update(_m.ORACLES)

__all__ = ["ALL_QUERIES", "ALL_ORACLES"]
