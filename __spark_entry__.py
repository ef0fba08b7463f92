"""Driver contract for the spark-graft builder (PySpark target).

Exports the full operator registry from bigarrays_jl_spark.operators:
every query has a DataFrame implementation and (except where noted) an
equivalent DuckDB oracle SQL, compared by the driver at sf=0.01 via
row-count + schema + order-insensitive value hash.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


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
