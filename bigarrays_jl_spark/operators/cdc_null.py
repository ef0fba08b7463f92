"""NULL-capable CDC MERGE (builder extension, SURVEY §2C round 9).

The round-8 merge core's legacy dialect coalesces change values into
the base, so an update could never set a column to NULL — a real CDC
source (Debezium-style before/after images) needs exactly that.  The
shared core (``mutation.merge_changes``) now supports a flagged feed:
each change column ``c_X`` travels with a boolean ``c_X_set``, and
column X takes ``c_X`` — NULL included — exactly when the flag is
true.  This module's registry query drives that dialect end-to-end
with a deterministic feed containing a NULL-ing update class, so the
DuckDB twin checks the one behavior the legacy dialect cannot express.

Feed classes (disjoint by construction, one change per key):

- doc_id % 17 == 0                          → DELETE
- else doc_id % 10 == 0                     → UPDATE re-source
                                              (source, n_chars change;
                                              lang flag false)
- else doc_id % 13 == 0                     → UPDATE NULLing source
                                              (source_set true, value
                                              NULL — the new behavior)
- doc_id % 25 == 0 (shifted key)            → INSERT (all flags true)

Same scale shape as the batch MERGE: one key-partitioned full-outer
join + row-level CASE; the flags ride the feed rows, so the plan is
unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bigarrays_jl_spark.operators.mutation import INSERT_OFFSET, merge_changes
from bigarrays_jl_spark.sources.tables import load

def derive_flagged_feed(d: DataFrame) -> DataFrame:
    """Deterministic flagged change feed (see module doc)."""
    _T, _F = F.lit(True), F.lit(False)
    _NS = F.lit(None).cast("string")
    _NL = F.lit(None).cast("bigint")
    deletes = (d.filter(F.col("doc_id") % 17 == 0)
                .select("doc_id", F.lit("delete").alias("op"),
                        _NS.alias("c_lang"), _F.alias("c_lang_set"),
                        _NS.alias("c_source"), _F.alias("c_source_set"),
                        _NL.alias("c_n_chars"), _F.alias("c_n_chars_set")))
    updates = (d.filter((F.col("doc_id") % 17 != 0)
                        & (F.col("doc_id") % 10 == 0))
                .select("doc_id", F.lit("update").alias("op"),
                        _NS.alias("c_lang"), _F.alias("c_lang_set"),
                        F.lit("curated").alias("c_source"),
                        _T.alias("c_source_set"),
                        (F.col("n_chars") + 1).alias("c_n_chars"),
                        _T.alias("c_n_chars_set")))
    nulling = (d.filter((F.col("doc_id") % 17 != 0)
                        & (F.col("doc_id") % 10 != 0)
                        & (F.col("doc_id") % 13 == 0))
               .select("doc_id", F.lit("update").alias("op"),
                       _NS.alias("c_lang"), _F.alias("c_lang_set"),
                       _NS.alias("c_source"), _T.alias("c_source_set"),
                       _NL.alias("c_n_chars"), _F.alias("c_n_chars_set")))
    inserts = (d.filter(F.col("doc_id") % 25 == 0)
                .select((F.col("doc_id") + INSERT_OFFSET).alias("doc_id"),
                        F.lit("insert").alias("op"),
                        F.col("lang").alias("c_lang"), _T.alias("c_lang_set"),
                        F.lit("synthetic").alias("c_source"),
                        _T.alias("c_source_set"),
                        F.col("n_chars").alias("c_n_chars"),
                        _T.alias("c_n_chars_set")))
    return deletes.unionAll(updates).unionAll(nulling).unionAll(inserts)


def pipeline_apply_changes_nullable(spark: SparkSession, sf: str) -> DataFrame:
    d = load(spark, sf, "documents").select(
        "doc_id", "lang", "source", "n_chars")
    return merge_changes(d, derive_flagged_feed(d))


PIPELINE_APPLY_CHANGES_NULLABLE_SQL = f"""
WITH d AS (SELECT doc_id, lang, source, n_chars FROM documents),
changes AS (
  SELECT doc_id, 'delete' AS op,
         CAST(NULL AS VARCHAR) AS c_lang, false AS f_lang,
         CAST(NULL AS VARCHAR) AS c_source, false AS f_source,
         CAST(NULL AS BIGINT) AS c_n_chars, false AS f_n_chars
  FROM d WHERE doc_id % 17 = 0
  UNION ALL
  SELECT doc_id, 'update', NULL, false, 'curated', true,
         n_chars + 1, true
  FROM d WHERE doc_id % 17 <> 0 AND doc_id % 10 = 0
  UNION ALL
  SELECT doc_id, 'update', NULL, false, NULL, true, NULL, false
  FROM d WHERE doc_id % 17 <> 0 AND doc_id % 10 <> 0 AND doc_id % 13 = 0
  UNION ALL
  SELECT doc_id + {INSERT_OFFSET}, 'insert', lang, true,
         'synthetic', true, n_chars, true
  FROM d WHERE doc_id % 25 = 0)
SELECT coalesce(d.doc_id, c.doc_id) AS doc_id,
       CASE WHEN coalesce(c.f_lang, false) THEN c.c_lang
            ELSE d.lang END AS lang,
       CASE WHEN coalesce(c.f_source, false) THEN c.c_source
            ELSE d.source END AS source,
       CASE WHEN coalesce(c.f_n_chars, false) THEN c.c_n_chars
            ELSE d.n_chars END AS n_chars,
       coalesce(c.op, 'keep') AS last_op
FROM d FULL OUTER JOIN changes c ON d.doc_id = c.doc_id
WHERE coalesce(c.op, '') <> 'delete'
"""


QUERIES = {
    "pipeline_apply_changes_nullable": pipeline_apply_changes_nullable,
}

ORACLES = {
    "pipeline_apply_changes_nullable": PIPELINE_APPLY_CHANGES_NULLABLE_SQL,
}
