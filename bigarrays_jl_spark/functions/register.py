"""SQL-surface registry: the engine's expression canon as SQL UDFs.

`register_sql_functions(spark)` installs the helpers from
``functions.expressions`` as *SQL scalar functions* (Spark 4
``CREATE TEMPORARY FUNCTION … RETURN <expr>``), so `spark.sql` users
get the same tokenization/fingerprint/vector-math canon as DataFrame
users — and crucially these are **Catalyst-inlined expression macros**,
not Python UDFs: the body substitutes into the caller's plan, runs in
whole-stage codegen, and never crosses into a Python worker.  The SQL
bodies are kept textually parallel to the Column builders in
``expressions.py`` (same fold order, same casts) so results are
bit-identical across the two surfaces.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

# name -> (signature, body).  Bodies mirror functions/expressions.py;
# change them ONLY together with the Column twins.
_SQL_FUNCTIONS: dict[str, tuple[str, str]] = {
    "ba_tokens": (
        "(t STRING) RETURNS ARRAY<STRING>",
        r"RETURN split(trim(lower(t)), '\\s+')"),
    "ba_norm_text": (
        "(t STRING) RETURNS STRING",
        "RETURN trim(regexp_replace(lower(t), '[^a-z0-9 ]', ''))"),
    "ba_fingerprint": (
        "(t STRING) RETURNS STRING",
        "RETURN md5(trim(regexp_replace(lower(t), '[^a-z0-9 ]', '')))"),
    "ba_dot": (
        "(a ARRAY<DOUBLE>, b ARRAY<DOUBLE>) RETURNS DOUBLE",
        "RETURN aggregate(zip_with(a, b,"
        " (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)),"
        " CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)"),
    "ba_norm2": (
        "(a ARRAY<DOUBLE>) RETURNS DOUBLE",
        "RETURN aggregate(transform(a,"
        " x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)),"
        " CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)"),
    "ba_cosine": (
        "(a ARRAY<DOUBLE>, b ARRAY<DOUBLE>) RETURNS DOUBLE",
        "RETURN round("
        " aggregate(zip_with(a, b,"
        "  (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)),"
        "  CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)"
        " / (sqrt(aggregate(transform(a,"
        "  x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)),"
        "  CAST(0.0 AS DOUBLE), (acc, v) -> acc + v))"
        " * sqrt(aggregate(transform(b,"
        "  x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)),"
        "  CAST(0.0 AS DOUBLE), (acc, v) -> acc + v))), 6)"),
    "ba_guarded_cosine": (
        # the guarded_cosine twin: -2.0 sentinel on zero-norm inputs so
        # degenerate vectors never win an argmax / pass a threshold
        "(a ARRAY<DOUBLE>, b ARRAY<DOUBLE>) RETURNS DOUBLE",
        "RETURN CASE WHEN"
        " aggregate(transform(a,"
        "  x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)),"
        "  CAST(0.0 AS DOUBLE), (acc, v) -> acc + v) > 0"
        " AND aggregate(transform(b,"
        "  x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)),"
        "  CAST(0.0 AS DOUBLE), (acc, v) -> acc + v) > 0"
        " THEN round("
        " aggregate(zip_with(a, b,"
        "  (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)),"
        "  CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)"
        " / (sqrt(aggregate(transform(a,"
        "  x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)),"
        "  CAST(0.0 AS DOUBLE), (acc, v) -> acc + v))"
        " * sqrt(aggregate(transform(b,"
        "  x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)),"
        "  CAST(0.0 AS DOUBLE), (acc, v) -> acc + v))), 6)"
        " ELSE CAST(-2.0 AS DOUBLE) END"),
    "ba_jaccard": (
        "(a ARRAY<STRING>, b ARRAY<STRING>) RETURNS DOUBLE",
        "RETURN CASE WHEN size(array_union(a, b)) = 0 THEN CAST(1.0 AS DOUBLE)"
        " ELSE round(CAST(size(array_intersect(a, b)) AS DOUBLE)"
        " / size(array_union(a, b)), 6) END"),
    "ba_hash_bucket": (
        "(k STRING) RETURNS BIGINT",
        "RETURN CAST(conv(substring(md5(k), 1, 4), 16, 10) AS BIGINT)"
        " % 100"),
}


def register_sql_functions(spark: SparkSession) -> list[str]:
    """Install the engine's SQL function surface; returns the names.

    Temporary functions are session-scoped; call once per session
    (idempotent via CREATE OR REPLACE)."""
    for name, (sig, body) in _SQL_FUNCTIONS.items():
        spark.sql(f"CREATE OR REPLACE TEMPORARY FUNCTION {name}{sig} {body}")
    return list(_SQL_FUNCTIONS)
