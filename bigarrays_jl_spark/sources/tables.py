"""Testdata table loaders.

Single place that maps logical table names → parquet scans, so every
operator reads through `spark.read.parquet` (columnar, predicate-pushdown,
partition-discovery) — the Spark analog of the reference's backend
protocol dispatch (src/type.jl:37-50) for relational sources.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

TABLES = ("region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings")


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise ValueError(f"unknown table {name!r}; known: {TABLES}")
    path = f"{sf_dir.rstrip('/')}/{name}.parquet"
    if name == "events":
        # events.ts is TIMESTAMP(NANOS) parquet, which Spark's vectorized
        # reader rejects; read nanos as long and truncate to micros (the
        # same truncation DuckDB applies when it loads TIMESTAMP_NS).
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        from pyspark.sql import functions as F
        return (spark.read.parquet(path)
                .withColumn("ts", F.timestamp_micros(F.expr("ts div 1000"))))
    return spark.read.parquet(path)


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view for SQL-first operators."""
    for t in TABLES:
        load(spark, sf_dir, t).createOrReplaceTempView(t)
