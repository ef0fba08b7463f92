"""Driver contract for the spark-graft builder (PySpark target).

Exports the full operator registry from bigarrays_jl_spark.operators:
every query has a DataFrame implementation and (except where noted) an
equivalent DuckDB oracle SQL, compared by the driver at sf=0.01 via
row-count + schema + order-insensitive value hash.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

# Executor python workers must be able to import bigarrays_jl_spark
# (pandas-UDF closures deserialize against it).  Export the repo root on
# PYTHONPATH at import time — before the harness builds its
# SparkSession — so local-mode workers inherit it.  (On a cluster this
# is a --py-files zip instead.)
_REPO_ROOT = os.path.dirname(os.path.abspath(__file__))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)
_existing = os.environ.get("PYTHONPATH", "")
if _REPO_ROOT not in _existing.split(os.pathsep):
    os.environ["PYTHONPATH"] = (
        _REPO_ROOT + (os.pathsep + _existing if _existing else ""))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: the 3-way join + revenue
    aggregation (broadcast dim + shuffled fact join + hash agg)."""
    from bigarrays_jl_spark.operators.relational import q03_join_revenue
    return q03_join_revenue(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    from bigarrays_jl_spark.operators import ALL_QUERIES
    return dict(ALL_QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL oracle per query (same column aliases)."""
    from bigarrays_jl_spark.operators import ALL_ORACLES
    return dict(ALL_ORACLES)
