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


# Recommended physical layout per big table — the layout step a 100 TB
# deployment runs once at ingest.  Dims (region/nation/customer/supplier/
# part) are broadcast-sized and deliberately absent: a clustering pass
# on a table that never row-group-prunes is pure write amplification.
#   - lineitem: z-order on the two selective probe dimensions; a filter
#     on EITHER part or supplier then skips most row groups.
#   - orders: z-order on (custkey, orderkey) — the customer-centric
#     probe plus the natural join key.
#   - events: hive-partition by event date — the coarse, low-cardinality
#     access dimension; date filters prune at the DIRECTORY level
#     (PartitionFilters) before any footer is opened.
CLUSTERED_LAYOUTS: dict[str, dict] = {
    # column ORDER matters: zorder_col assigns the LAST column the most
    # significant interleaved bit, and range-partition file boundaries
    # are row-count quantiles — they align with the bit cells of a
    # near-continuous domain (partkey) far better than with a lumpy
    # 10-value one (suppkey).  High-cardinality dimension last ⇒ its
    # top bits dominate file boundaries ⇒ deepest pruning on the most
    # selective probe.
    "lineitem": {"zorder": ["l_suppkey", "l_partkey"]},
    "orders": {"zorder": ["o_custkey", "o_orderkey"]},
    "events": {"partition": ["event_date"],
               "expr": lambda F: {"event_date": F.to_date("ts")}},
}


def materialize_clustered(spark: SparkSession, sf_dir: str, name: str,
                          path: str, n_files: int = 8) -> None:
    """Write testdata table ``name`` to ``path`` in its recommended
    clustered layout (CLUSTERED_LAYOUTS): z-order for multi-dimensional
    row-group skipping, hive partitioning for directory pruning.  The
    consumer-facing layout step — see operators.extensions.
    layout_zorder_scan for a registry query reading through it and
    tests/test_plans.py for the scan-drops-row-groups proof."""
    from pyspark.sql import functions as F

    from bigarrays_jl_spark.sources import layout as _layout

    spec = CLUSTERED_LAYOUTS.get(name)
    if spec is None:
        raise ValueError(
            f"no clustered layout recommended for {name!r} "
            f"(broadcast-sized dim); known: {sorted(CLUSTERED_LAYOUTS)}")
    df = load(spark, sf_dir, name)
    if "zorder" in spec:
        _layout.write_zorder(df, path, spec["zorder"], n_files=n_files)
    else:
        _layout.write_partitioned(df, path, spec["partition"],
                                  expr=spec["expr"](F))


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
