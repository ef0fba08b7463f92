"""Batch mutation semantics — MERGE INTO / CDC-apply (builder
extension, SURVEY §2C round 8).

``pipeline_apply_changes`` applies a change feed (inserts, updates,
deletes keyed by doc_id) to the documents base table and returns the
merged table — the lakehouse MERGE/upsert primitive every incremental
corpus pipeline needs (the incremental-dedup bridges in ``dedup.py``
maintain *indexes*; this maintains the *table*).

The change feed is derived deterministically from the base so the
DuckDB twin reproduces it exactly:

- doc_id % 17 == 0            → DELETE
- else doc_id % 10 == 0       → UPDATE (re-sourced + re-measured)
- doc_id % 25 == 0 (new keys) → INSERT as doc_id + INSERT_OFFSET

Scale shape: one key-partitioned FULL OUTER join between base and
changes — exactly the physical plan a MERGE INTO compiles to — then a
row-level CASE; no broadcast assumption on the change side (change
feeds can be as big as the base), no collect, no second scan of the
base.  Precedence is deterministic: the change feed carries at most
one row per key by construction (delete wins over update by the
``% 17`` guard).

PRECONDITION of the synthetic feed: insert keys are
``doc_id + INSERT_OFFSET``, so the demo requires
``max(doc_id) < INSERT_OFFSET`` — otherwise an "insert" would collide
with a real base key and silently become an update.
``tests/test_round9_ops.py::test_insert_offset_precondition`` pins the
margin against the largest test corpus; a production feed carries its
own keys and has no such constraint.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bigarrays_jl_spark.sources.tables import load

INSERT_OFFSET = 1_000_000


_MERGE_COLS = ("lang", "source", "n_chars")


def merge_changes(base: DataFrame, changes: DataFrame) -> DataFrame:
    """Apply a change feed ``(doc_id, op, c_lang, c_source, c_n_chars)``
    to a ``(doc_id, lang, source, n_chars)`` base — THE merge core
    shared by the batch operators below and the durable streaming
    bridge (``streaming.windows.streaming_apply_changes``), so batch
    and streaming can never disagree on merge semantics.  One
    key-partitioned full-outer join + row-level CASE.  Caller contract:
    at most one change per key per feed (the streaming bridge enforces
    this with an op-precedence collapse).

    Two update dialects, chosen by the feed's schema:

    - legacy 5-column feed: ``coalesce(c_X, X)`` — an update cannot
      set a column to NULL (a NULL change value means "keep").
    - flagged feed carrying ``c_X_set`` booleans: column X becomes
      ``c_X`` (NULL included) exactly when its flag is true — the
      CDC-complete dialect; a false/absent flag keeps the base value.
      Inserts must set every flag true."""
    flagged = f"c_{_MERGE_COLS[0]}_set" in changes.columns
    if flagged:
        def val(c):
            return (F.when(F.coalesce(F.col(f"c_{c}_set"), F.lit(False)),
                           F.col(f"c_{c}"))
                     .otherwise(F.col(c)).alias(c))
    else:
        def val(c):
            return F.coalesce(f"c_{c}", c).alias(c)
    return (base.join(changes, "doc_id", "full_outer")
            .filter(F.coalesce(F.col("op"), F.lit("")) != "delete")
            .select("doc_id", *[val(c) for c in _MERGE_COLS],
                    F.coalesce("op", F.lit("keep")).alias("last_op")))


def derive_change_feed(d: DataFrame) -> DataFrame:
    """The deterministic demo change feed (see module doc) — factored
    so the streaming bridge test can replay the identical feed."""
    deletes = (d.filter(F.col("doc_id") % 17 == 0)
                .select("doc_id", F.lit("delete").alias("op"),
                        F.lit(None).cast("string").alias("c_lang"),
                        F.lit(None).cast("string").alias("c_source"),
                        F.lit(None).cast("bigint").alias("c_n_chars")))
    updates = (d.filter((F.col("doc_id") % 17 != 0)
                        & (F.col("doc_id") % 10 == 0))
                .select("doc_id", F.lit("update").alias("op"),
                        F.col("lang").alias("c_lang"),
                        F.lit("curated").alias("c_source"),
                        (F.col("n_chars") + 1).alias("c_n_chars")))
    inserts = (d.filter(F.col("doc_id") % 25 == 0)
                .select((F.col("doc_id") + INSERT_OFFSET).alias("doc_id"),
                        F.lit("insert").alias("op"),
                        F.col("lang").alias("c_lang"),
                        F.lit("synthetic").alias("c_source"),
                        F.col("n_chars").alias("c_n_chars")))
    return deletes.unionAll(updates).unionAll(inserts)


def pipeline_apply_changes(spark: SparkSession, sf: str) -> DataFrame:
    d = load(spark, sf, "documents").select(
        "doc_id", "lang", "source", "n_chars")
    return merge_changes(d, derive_change_feed(d))


PIPELINE_APPLY_CHANGES_SQL = f"""
WITH d AS (SELECT doc_id, lang, source, n_chars FROM documents),
changes AS (
  SELECT doc_id, 'delete' AS op, CAST(NULL AS VARCHAR) AS c_lang,
         CAST(NULL AS VARCHAR) AS c_source, CAST(NULL AS BIGINT) AS c_n_chars
  FROM d WHERE doc_id % 17 = 0
  UNION ALL
  SELECT doc_id, 'update', lang, 'curated', n_chars + 1
  FROM d WHERE doc_id % 17 <> 0 AND doc_id % 10 = 0
  UNION ALL
  SELECT doc_id + {INSERT_OFFSET}, 'insert', lang, 'synthetic', n_chars
  FROM d WHERE doc_id % 25 = 0)
SELECT coalesce(d.doc_id, c.doc_id) AS doc_id,
       coalesce(c.c_lang, d.lang) AS lang,
       coalesce(c.c_source, d.source) AS source,
       coalesce(c.c_n_chars, d.n_chars) AS n_chars,
       coalesce(c.op, 'keep') AS last_op
FROM d FULL OUTER JOIN changes c ON d.doc_id = c.doc_id
WHERE coalesce(c.op, '') <> 'delete'
"""


QUERIES = {
    "pipeline_apply_changes": pipeline_apply_changes,
}

ORACLES = {
    "pipeline_apply_changes": PIPELINE_APPLY_CHANGES_SQL,
}
