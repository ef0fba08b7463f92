"""Z-order clustered parquet layout — multi-dimensional data skipping.

Sorting a table by one column gives parquet min/max pruning on that
column only; a 100 TB fact table queried by BOTH part and supplier
needs locality in both.  Z-ordering interleaves the bits of several
columns into one clustering key, so rows close in any dimension land in
the same files — every row group then covers a narrow min/max range in
EVERY z-ordered column and a selective filter on any of them skips most
of the scan.  Same idea as Delta Lake's OPTIMIZE ZORDER BY; implemented
here with nothing but built-in expressions:

1. per-column min/max (one tiny aggregate) → affine map to [0, 2^bits)
2. bit interleave via shiftleft/bitwise-or — pure JVM codegen
3. repartitionByRange + sortWithinPartitions on the z-value → each
   output file owns a contiguous z-range

Scale shape: one narrow agg (2 values/column to the driver), one range
shuffle (the layout cost you pay once), zero Python.  The write is
embarrassingly parallel; file count = shuffle partitions of the range
exchange, so `n_files` sizes output files directly.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

Z_BITS = 16  # per-dimension resolution; n_cols * Z_BITS must stay < 63


def zorder_col(df: DataFrame, cols: list[str], bits: int = Z_BITS) -> F.Column:
    """Interleaved-bit z-value over ``cols``, each min/max-normalized to
    ``bits`` bits.  Runs one driver-side agg for the bounds (2·|cols|
    numbers — negligible at any scale); nulls map to bucket 0."""
    if len(cols) * bits > 62:
        raise ValueError(f"{len(cols)} cols x {bits} bits overflows a long")
    bounds = df.agg(*[f(c).alias(f"{f.__name__}_{c}")
                      for c in cols for f in (F.min, F.max)]).first()
    scaled = []
    for c in cols:
        if bounds[f"min_{c}"] is None:
            raise ValueError(
                f"zorder_col: column {c!r} has no non-NULL values "
                "(empty input or all-NULL column) — no bounds to "
                "normalize against")
        lo = float(bounds[f"min_{c}"])
        hi = float(bounds[f"max_{c}"])
        span = (hi - lo) or 1.0
        # coalesce INSIDE least: least() skips NULL operands, so a
        # NULL value would otherwise inherit the cap (top bucket) —
        # the documented contract is bucket 0
        q = F.least(
            F.lit((1 << bits) - 1),
            F.coalesce(
                F.floor((F.col(c).cast("double") - lo) / span * (1 << bits))
                 .cast("bigint"),
                F.lit(0)))
        scaled.append(q)
    # interleave: output bit (i*n_cols + j) = bit i of column j
    n = len(cols)
    parts = [
        F.shiftleft(F.shiftright(s, i).bitwiseAND(F.lit(1)), i * n + j)
        for j, s in enumerate(scaled) for i in range(bits)]
    return reduce(lambda a, b: a.bitwiseOR(b), parts).alias("_z")


def write_zorder(df: DataFrame, path: str, cols: list[str],
                 n_files: int = 8, bits: int = Z_BITS) -> None:
    """Write ``df`` as parquet clustered by the z-order of ``cols``.

    repartitionByRange on the z-value gives each file a contiguous
    z-range; sortWithinPartitions tightens per-ROW-GROUP min/max stats
    inside each file, so both file-level and row-group-level pruning
    fire on later scans."""
    (df.withColumn("_z", zorder_col(df, cols, bits))
       .repartitionByRange(n_files, "_z")
       .sortWithinPartitions("_z")
       .drop("_z")
       .write.mode("overwrite").parquet(path))


def files_matching(path: str, col: str, value) -> tuple[int, int]:
    """(files whose [min,max] stats admit ``value``, total files) — the
    data-skipping measurement, read straight from parquet footers."""
    import os

    import pyarrow.parquet as pq
    hits = total = 0
    for fn in os.listdir(path):
        if not fn.endswith(".parquet"):
            continue
        total += 1
        md = pq.ParquetFile(os.path.join(path, fn)).metadata
        admit = False
        for rg in range(md.num_row_groups):
            row_group = md.row_group(rg)
            for ci in range(row_group.num_columns):
                cc = row_group.column(ci)
                if cc.path_in_schema == col and cc.statistics is not None:
                    st = cc.statistics
                    # stats objects can exist with has_min_max=False
                    # (some binary/NaN columns); a scanner that cannot
                    # prove exclusion must ADMIT the file, same as a
                    # real reader
                    if not st.has_min_max or st.min <= value <= st.max:
                        admit = True
        hits += admit
    return hits, total


def write_partitioned(df: DataFrame, path: str, cols: list[str],
                      expr: dict[str, "F.Column"] | None = None) -> None:
    """Hive-style directory partitioning — the other half of the layout
    story next to z-order.  Partition columns become directories
    (``.../event_date=2026-01-07/``), so a filter on them never opens a
    single non-matching file: Catalyst resolves `PartitionFilters`
    against the directory listing alone.  Use for the coarse,
    low-cardinality access dimension (event date, source shard);
    z-order the columns WITHIN each partition for the fine-grained
    dimensions.  ``expr`` derives new partition columns on the way in
    (e.g. ``{"event_date": F.to_date("ts")}``).
    """
    out = df
    for name, col in (expr or {}).items():
        out = out.withColumn(name, col)
    out.write.mode("overwrite").partitionBy(*cols).parquet(path)
