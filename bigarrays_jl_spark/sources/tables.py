"""Testdata table loaders.

Single place that maps logical table names → parquet scans, so every
operator reads through `spark.read.parquet` (columnar, predicate-pushdown,
partition-discovery) — the Spark analog of the reference's backend
protocol dispatch (src/type.jl:37-50) for relational sources.
"""

from __future__ import annotations

import warnings

from pyspark.sql import DataFrame, SparkSession

TABLES = ("region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings")


def fan_out(spark: SparkSession, df: DataFrame) -> DataFrame:
    """Spread a near-single-partition source across the cluster.

    The local testdata is single-row-group parquet, so a scan arrives as
    ONE input split regardless of maxPartitionBytes and every map-side
    stage runs single-threaded.  Callsites with CPU-heavy map work
    (pandas UDFs, per-row hashing) opt in; plain scans/aggregations stay
    shuffle-free — a blanket repartition in load() measurably loses at
    sf0.1.  On a real cluster the source is thousands of splits and this
    is a no-op guard, not a standing shuffle.
    """
    target = spark.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < max(2, target // 4):
        return df.repartition(target)
    return df


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise ValueError(f"unknown table {name!r}; known: {TABLES}")
    path = f"{sf_dir.rstrip('/')}/{name}.parquet"
    if name == "events":
        # events.ts has shipped as both TIMESTAMP(NANOS) (which Spark's
        # vectorized reader rejects unless read as long) and plain
        # timestamp[us]; enable the legacy long read, then apply the
        # nanos→micros truncation ONLY when ts actually arrives as long
        # (the same truncation DuckDB applies when it loads TIMESTAMP_NS).
        # DELIBERATELY session-sticky (not restored): plans are lazy, so
        # a set/restore here would flip the flag out from under a later
        # action on this same DataFrame.  Engine-wide policy: nanos
        # parquet columns read as long everywhere in this session —
        # other readers see bigint nanos instead of an
        # unreadable-type error.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        from pyspark.sql import functions as F
        from pyspark.sql import types as T
        df = spark.read.parquet(path)
        if isinstance(df.schema["ts"].dataType, T.LongType):
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        elif isinstance(df.schema["ts"].dataType, T.TimestampNTZType):
            # normalize to TIMESTAMP so watermarks/windows accept it; the
            # session tz is pinned UTC so the naive value is unchanged
            df = df.withColumn("ts", F.col("ts").cast(T.TimestampType()))
        return df
    return spark.read.parquet(path)


def register_views(spark: SparkSession, sf_dir: str,
                   tables: tuple[str, ...] | list[str] | None = None) -> None:
    """Register tables as temp views for SQL-first operators.

    Per-table isolation: when registering the default full set, a table
    whose load fails (e.g. a schema drift in one parquet file) is skipped
    so it cannot take down queries that never read it — the failure
    surfaces as TABLE_OR_VIEW_NOT_FOUND only when that table is actually
    queried.  Callers that pass an explicit ``tables`` list get loud
    failures for exactly the tables they asked for.
    """
    explicit = tables is not None
    for t in (tables if explicit else TABLES):
        try:
            load(spark, sf_dir, t).createOrReplaceTempView(t)
        except Exception as e:
            # drop any stale same-name view so a failed registration can
            # never leave a PREVIOUS dataset silently answering queries
            spark.catalog.dropTempView(t)
            if explicit:
                raise
            # keep the actionable diagnostic: with a wholly wrong sf_dir
            # every table lands here, and without this warning the later
            # TABLE_OR_VIEW_NOT_FOUND hides the original load error
            warnings.warn(
                f"register_views: skipping table {t!r} from {sf_dir!r} "
                f"(load failed: {type(e).__name__}: {e})",
                stacklevel=2)


def write_bucketed(spark: SparkSession, sf_dir: str, name: str, table: str,
                   keys: list[str], n_buckets: int = 8) -> None:
    """Materialize a testdata table as a bucketed+sorted managed table.

    Bucketing pre-shuffles a table ONCE at write time: every later join
    or aggregation on the bucket keys reads co-located, pre-sorted
    buckets and skips its exchange entirely.  At 100 TB this converts
    the recurring fact⋈fact shuffle (the single most expensive stage in
    a warehouse) into a one-time layout cost — see
    tests/test_plans.py::test_bucketed_join_no_shuffle for the plan
    proof.  Managed-table location comes from spark.sql.warehouse.dir
    (pinned to a scratch dir by session.get_spark).
    """
    (load(spark, sf_dir, name).write
     .bucketBy(n_buckets, *keys).sortBy(*keys)
     .mode("overwrite").format("parquet").saveAsTable(table))
