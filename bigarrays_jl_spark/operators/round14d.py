"""Round-14 batch 4 (builder extension, SURVEY §2C):

- ``quality_calibration`` — the classifier-vs-rules calibration curve:
  documents bucket by their hashed-classifier score (fixed 0.1-wide
  bins over the score's [−1, 1] range) and each bin reports how often
  the rule-based Gopher gate agrees.  THE check a curation team runs
  before trusting a cheap classifier threshold in place of the full
  rule cascade; composes the two existing canons (`_cls_metrics`,
  `_gopher_metrics`) so the curve can never drift from the gates it
  calibrates.  Mean score per bin is exact: the 6-rounded score
  re-quantizes to an integer at 1e-6 (exact by construction), sums as
  integers, and divides once.
- ``dedup_storage_savings`` — the dedup business case, per source:
  how many exact-duplicate document instances exist and how many
  bytes deleting them saves (keep = min doc_id per md5(text), the
  dedup_exact keep rule).  Uses dedup_cluster_hist's exact-copy
  augmentation idiom (every 7th doc gains a copy at doc_id+2e6) —
  the raw corpus has no exact dups at graded SFs, which would make
  the readout vacuous.

Scale shape: the calibration is two map-side flag/score passes folded
to ≤ 20 bins; the savings readout is one md5-keyed shuffle (the
dedup_exact plan) plus a source-keyed fold — nothing wider than the
fingerprint groupBy at any corpus size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bigarrays_jl_spark.operators.extensions import (TEXT_GOPHER_RULES_SQL,
                                                     _cls_metrics,
                                                     _cls_score_ctes,
                                                     _gopher_metrics)
from bigarrays_jl_spark.sources.tables import fan_out, load


def quality_calibration(spark: SparkSession, sf: str) -> DataFrame:
    d = fan_out(spark, load(spark, sf, "documents"))
    cls = _cls_metrics(F.col("text"))
    gop = _gopher_metrics(F.col("text"))
    scored = (d.select(cls["score"].alias("score"),
                       F.coalesce(gop["gopher_pass"], F.lit(False))
                        .alias("gp"))
              .filter(F.col("score").isNotNull()))
    binned = scored.select(
        F.floor(F.col("score") * 10).cast("bigint").alias("score_bin"),
        # 6-rounded score × 1e6 is an exact integer — summable exactly
        F.round(F.col("score") * 1e6).cast("bigint").alias("si"),
        F.col("gp").cast("int").alias("p"))
    return (binned.groupBy("score_bin")
            .agg(F.count("*").cast("bigint").alias("n_docs"),
                 F.sum("p").cast("bigint").alias("n_gopher_pass"),
                 F.sum("si").alias("ssum"))
            .select("score_bin", "n_docs", "n_gopher_pass",
                    F.round(F.col("n_gopher_pass").cast("double")
                            / F.col("n_docs"), 6).alias("pass_rate"),
                    (F.col("ssum").cast("double")
                     / (F.col("n_docs") * 1e6)).alias("mean_score")))


# the Gopher side of the oracle reuses TEXT_GOPHER_RULES_SQL verbatim —
# the same shared-fragment discipline as the classifier CTEs, so a
# canon change can never leave this oracle grading the old rules
QUALITY_CALIBRATION_SQL = f"""
WITH {_cls_score_ctes('documents')},
gm AS (
  SELECT doc_id, gopher_pass AS gp FROM ({TEXT_GOPHER_RULES_SQL}) gq),
s AS (
  SELECT CAST(floor(cls.score * 10) AS BIGINT) AS score_bin,
         CAST(round(cls.score * 1e6) AS BIGINT) AS si,
         CASE WHEN coalesce(gm.gp, false) THEN 1 ELSE 0 END AS p
  FROM cls JOIN gm ON cls.doc_id = gm.doc_id
  WHERE cls.score IS NOT NULL)
SELECT score_bin,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(p) AS BIGINT) AS n_gopher_pass,
       round(CAST(sum(p) AS DOUBLE) / count(*), 6) AS pass_rate,
       CAST(sum(si) AS DOUBLE) / (count(*) * 1e6) AS mean_score
FROM s GROUP BY score_bin
"""


def dedup_storage_savings(spark: SparkSession, sf: str) -> DataFrame:
    d = load(spark, sf, "documents").select("doc_id", "source", "text",
                                            "n_chars")
    self_row = F.struct(F.col("doc_id").alias("doc_id"),
                        F.col("source").alias("source"),
                        F.col("text").alias("text"),
                        F.col("n_chars").alias("n_chars"))
    copy = F.struct((F.col("doc_id") + 2000000).alias("doc_id"),
                    F.col("source").alias("source"),
                    F.col("text").alias("text"),
                    F.col("n_chars").alias("n_chars"))
    rows = (F.when(F.col("doc_id") % 7 == 0, F.array(self_row, copy))
             .otherwise(F.array(self_row)))
    aug = d.select(F.explode(rows).alias("r")).select("r.*")
    keep = (aug.groupBy(F.md5("text").alias("fp"))
            .agg(F.min("doc_id").alias("keep_id")))
    dup = (aug.join(keep, F.md5(aug["text"]) == keep["fp"])
           .withColumn("is_dup",
                       (F.col("doc_id") != F.col("keep_id")).cast("int")))
    return (dup.groupBy("source")
            .agg(F.count("*").cast("bigint").alias("n_docs"),
                 F.sum("is_dup").cast("bigint").alias("n_dup_instances"),
                 F.sum(F.col("is_dup") * F.col("n_chars")).cast("bigint")
                  .alias("chars_removable"),
                 F.sum("n_chars").cast("bigint").alias("chars_total"))
            .select("source", "n_docs", "n_dup_instances",
                    "chars_removable", "chars_total",
                    F.round(F.col("chars_removable").cast("double")
                            / F.col("chars_total"), 6)
                    .alias("frac_removable")))


DEDUP_STORAGE_SAVINGS_SQL = """
WITH aug AS (
  SELECT doc_id, source, text, n_chars FROM documents
  UNION ALL
  SELECT doc_id + 2000000 AS doc_id, source, text, n_chars
  FROM documents WHERE doc_id % 7 = 0),
keep AS (
  SELECT md5(text) AS fp, min(doc_id) AS keep_id FROM aug GROUP BY 1),
d AS (
  SELECT a.source, a.n_chars,
         CASE WHEN a.doc_id <> k.keep_id THEN 1 ELSE 0 END AS is_dup
  FROM aug a JOIN keep k ON md5(a.text) = k.fp)
SELECT source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(is_dup) AS BIGINT) AS n_dup_instances,
       CAST(sum(is_dup * n_chars) AS BIGINT) AS chars_removable,
       CAST(sum(n_chars) AS BIGINT) AS chars_total,
       round(CAST(sum(is_dup * n_chars) AS DOUBLE) / sum(n_chars), 6)
         AS frac_removable
FROM d GROUP BY source
"""


QUERIES = {
    "quality_calibration": quality_calibration,
    "dedup_storage_savings": dedup_storage_savings,
}

ORACLES = {
    "quality_calibration": QUALITY_CALIBRATION_SQL,
    "dedup_storage_savings": DEDUP_STORAGE_SAVINGS_SQL,
}
