"""Sample-based estimation with in-query verification (builder
extension, SURVEY §2C round 8).

``text_heavy_hitters`` finds corpus heavy hitters (terms in ≥ 1% of
documents) exactly, and ALONGSIDE each exact count carries the estimate
a 25% deterministic document sample would have produced plus a
``within_tol`` boolean — the q31_approx_aggs pattern generalized:
sketch/sample paths are graded against exact answers INSIDE the query,
so the accuracy claim itself is part of the hash-checked output.

Why this shape matters at 100 TB: the sample path is the one you
actually run on the full corpus (25% of the explode/shuffle), and the
exact path is the audit you run on a slice to calibrate the tolerance.
Running both over the same data here is the calibration harness.

The sample is the md5 hash-bucket canon (``pipeline._hash_bucket`` —
deterministic, rerun-stable, both engines hash the same bytes), never
``rand()``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bigarrays_jl_spark.functions import tokens as _toks
from bigarrays_jl_spark.operators.pipeline import _hash_bucket
from bigarrays_jl_spark.sources.tables import load

HH_MIN_FRAC = 0.01      # heavy hitter: doc_freq >= 1% of corpus
SAMPLE_PCT = 25         # deterministic sample size (percent)
# estimate accepted within 50% relative error or ±8 docs absolute —
# generous because a 25% sample of a small demo corpus is noisy; the
# boolean is part of the output, so the accuracy claim is hash-checked
TOL_REL = 0.5
TOL_ABS = 8


def text_heavy_hitters(spark: SparkSession, sf: str) -> DataFrame:
    d = load(spark, sf, "documents")
    n_docs = d.agg(F.count("*").cast("double").alias("n"))
    toks = d.select("doc_id", F.explode(_toks()).alias("term"))
    exact = toks.groupBy("term").agg(
        F.countDistinct("doc_id").alias("doc_freq"))
    sampled = (toks.filter(_hash_bucket("doc_id") < SAMPLE_PCT)
               .groupBy("term")
               .agg((F.countDistinct("doc_id") * (100 // SAMPLE_PCT))
                    .alias("est_doc_freq")))
    err_ok = (F.abs(F.coalesce(F.col("est_doc_freq"), F.lit(0))
                    - F.col("doc_freq"))
              <= F.greatest(TOL_REL * F.col("doc_freq"), F.lit(TOL_ABS)))
    return (exact.crossJoin(F.broadcast(n_docs))
            .filter(F.col("doc_freq") >= HH_MIN_FRAC * F.col("n"))
            .join(sampled, "term", "left")
            .select("term", "doc_freq",
                    F.coalesce("est_doc_freq", F.lit(0)).cast("bigint")
                     .alias("est_doc_freq"),
                    err_ok.alias("within_tol")))


TEXT_HEAVY_HITTERS_SQL = rf"""
WITH tok AS (
  SELECT doc_id, unnest(regexp_split_to_array(trim(lower(text)), '\s+'))
           AS term
  FROM documents),
n AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM documents),
exact AS (SELECT term, count(DISTINCT doc_id) AS doc_freq
          FROM tok GROUP BY term),
sampled AS (
  SELECT term,
         count(DISTINCT doc_id) * {100 // SAMPLE_PCT} AS est_doc_freq
  FROM tok
  WHERE ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4))::BIGINT
          % 100 < {SAMPLE_PCT}
  GROUP BY term)
SELECT e.term, e.doc_freq,
       CAST(coalesce(s.est_doc_freq, 0) AS BIGINT) AS est_doc_freq,
       abs(coalesce(s.est_doc_freq, 0) - e.doc_freq)
         <= greatest({TOL_REL} * e.doc_freq, {TOL_ABS}) AS within_tol
FROM exact e CROSS JOIN n LEFT JOIN sampled s ON e.term = s.term
WHERE e.doc_freq >= {HH_MIN_FRAC} * n.n
"""


QUERIES = {
    "text_heavy_hitters": text_heavy_hitters,
}

ORACLES = {
    "text_heavy_hitters": TEXT_HEAVY_HITTERS_SQL,
}
