"""Ranked retrieval + approximate string matching (builder extension,
SURVEY §2C round 8).

``text_bm25`` — Okapi BM25 (Lucene idf variant) over the documents
table for a fixed conjunctive-ish keyword query: the classic inverted-
index scoring function a corpus-search surface needs next to the
TF-IDF statistics already in ``text.text_doc_freq``.

Scale posture: term frequencies for the QUERY terms only (filter pushed
into the post-explode stream, so the shuffle carries |query| terms per
doc, not the vocabulary); document frequency and the corpus constants
(N, avgdl) are one tiny aggregate each, broadcast into the scoring
join.  No vocabulary-sized shuffle, no driver constants.

``fuzzy_name_pairs`` — blocked approximate string self-join on part
names with Levenshtein distance: the entity-resolution candidate
generator.  The block key (last name token) turns the quadratic
all-pairs into per-block pairs — the same blocking discipline the
MinHash band join uses — and the distance predicate runs JVM-side
(``F.levenshtein``), with DuckDB's integer ``levenshtein`` as the exact
twin.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bigarrays_jl_spark.functions import tokens as _toks
from bigarrays_jl_spark.sources.tables import load

# fixed keyword query (terms present in the synthetic corpus vocab)
BM25_QUERY = ("spark", "vector", "query")
_QUERY_SQL = ", ".join(f"'{t}'" for t in BM25_QUERY)
BM25_K1 = 1.2
BM25_B = 0.75


def text_bm25(spark: SparkSession, sf: str) -> DataFrame:
    d = load(spark, sf, "documents").select(
        "doc_id", _toks().alias("t")).withColumn("dl", F.size("t"))
    stats = d.agg(F.count("*").cast("double").alias("n_docs"),
                  F.avg("dl").alias("avgdl"))
    tf = (d.select("doc_id", "dl", F.explode("t").alias("term"))
           .filter(F.col("term").isin(*BM25_QUERY))
           .groupBy("doc_id", "dl", "term")
           .agg(F.count("*").cast("double").alias("tf")))
    df_t = tf.groupBy("term").agg(
        F.countDistinct("doc_id").cast("double").alias("df"))
    scored = (tf.join(F.broadcast(df_t), "term")
                .crossJoin(F.broadcast(stats)))
    idf = F.log((F.col("n_docs") - F.col("df") + 0.5)
                / (F.col("df") + 0.5) + 1.0)
    tf_norm = (F.col("tf") * (BM25_K1 + 1.0)
               / (F.col("tf") + BM25_K1
                  * (1.0 - BM25_B + BM25_B * F.col("dl") / F.col("avgdl"))))
    # decimal partials for the per-doc term sum: each term's double
    # score is engine-identical, but a raw double sum is addition-order
    # dependent — decimal accumulation keeps the rounded result stable
    # under any partitioning (repo float-parity canon)
    return (scored.withColumn("s", (idf * tf_norm).cast("decimal(28,12)"))
            .groupBy("doc_id")
            .agg(F.count("*").cast("int").alias("n_terms_matched"),
                 F.round(F.sum("s").cast("double"), 6).alias("bm25")))


TEXT_BM25_SQL = rf"""
WITH d AS (
  SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\s+') AS t
  FROM documents),
dl AS (SELECT doc_id, len(t) AS dl FROM d),
stats AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs,
                 CAST(avg(dl) AS DOUBLE) AS avgdl
          FROM dl),
tf AS (
  SELECT d.doc_id, dl.dl, term, CAST(count(*) AS DOUBLE) AS tf
  FROM (SELECT doc_id, unnest(t) AS term FROM d) d
  JOIN dl ON d.doc_id = dl.doc_id
  WHERE term IN ({_QUERY_SQL})
  GROUP BY d.doc_id, dl.dl, term),
df_t AS (SELECT term, CAST(count(DISTINCT doc_id) AS DOUBLE) AS df
         FROM tf GROUP BY term)
SELECT tf.doc_id, CAST(count(*) AS INT) AS n_terms_matched,
       round(CAST(sum(CAST(
         ln((s.n_docs - df_t.df + 0.5) / (df_t.df + 0.5) + 1.0)
         * (tf.tf * ({BM25_K1} + 1.0)
            / (tf.tf + {BM25_K1}
               * (1.0 - {BM25_B} + {BM25_B} * tf.dl / s.avgdl)))
         AS DECIMAL(28,12))) AS DOUBLE), 6)
         AS bm25
FROM tf JOIN df_t ON tf.term = df_t.term CROSS JOIN stats s
GROUP BY tf.doc_id
"""


# --------------------------------------------------------------------------
# blocked fuzzy self-join on part names
# --------------------------------------------------------------------------

FUZZY_MAX_DIST = 3


def fuzzy_name_pairs(spark: SparkSession, sf: str) -> DataFrame:
    """Distinct part-name pairs within Levenshtein distance
    FUZZY_MAX_DIST, blocked on the last name token so the join is
    per-block, never corpus-quadratic."""
    names = (load(spark, sf, "part")
             .select(F.col("p_name").alias("name")).distinct()
             .withColumn("block", F.element_at(F.split("name", " "), -1)))
    a = names.select(F.col("name").alias("name_a"), "block")
    b = names.select(F.col("name").alias("name_b"), "block")
    return (a.join(b, "block")
             .filter(F.col("name_a") < F.col("name_b"))
             .withColumn("dist", F.levenshtein("name_a", "name_b"))
             .filter(F.col("dist") <= FUZZY_MAX_DIST)
             .select("name_a", "name_b", F.col("dist").cast("int").alias("dist")))


FUZZY_NAME_PAIRS_SQL = f"""
WITH names AS (
  SELECT DISTINCT p_name AS name,
         string_split(p_name, ' ')[-1] AS block
  FROM part)
SELECT a.name AS name_a, b.name AS name_b,
       CAST(levenshtein(a.name, b.name) AS INT) AS dist
FROM names a JOIN names b ON a.block = b.block AND a.name < b.name
WHERE levenshtein(a.name, b.name) <= {FUZZY_MAX_DIST}
"""


QUERIES = {
    "text_bm25": text_bm25,
    "fuzzy_name_pairs": fuzzy_name_pairs,
}

ORACLES = {
    "text_bm25": TEXT_BM25_SQL,
    "fuzzy_name_pairs": FUZZY_NAME_PAIRS_SQL,
}
