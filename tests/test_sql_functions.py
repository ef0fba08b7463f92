"""SQL function surface: the expression canon via spark.sql must match
the Column builders bit-for-bit and stay JVM-side (Catalyst-inlined
macros, never Python workers)."""

import pytest
from pyspark.sql import functions as F

from bigarrays_jl_spark.functions import cosine, fingerprint, tokens
from bigarrays_jl_spark.functions.register import register_sql_functions
from bigarrays_jl_spark.sources.tables import load, register_views


@pytest.fixture(scope="module", autouse=True)
def _registered(spark, sf_dir):
    names = register_sql_functions(spark)
    assert "ba_cosine" in names
    register_views(spark, sf_dir, ["documents", "embeddings"])


def test_sql_cosine_matches_column_builder(spark, sf_dir):
    sql = spark.sql("""
        SELECT a.vec_id AS ia, b.vec_id AS ib,
               ba_cosine(a.embedding, b.embedding) AS c
        FROM embeddings a JOIN embeddings b
          ON a.vec_id < 20 AND b.vec_id >= 20 AND b.vec_id < 40
    """)
    e = load(spark, sf_dir, "embeddings")
    a = e.filter(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("ia"), F.col("embedding").alias("ea"))
    b = e.filter(F.col("vec_id").between(20, 39)).select(
        F.col("vec_id").alias("ib"), F.col("embedding").alias("eb"))
    col = a.crossJoin(b).select(
        "ia", "ib", cosine(F.col("ea"), F.col("eb")).alias("c"))
    assert sorted(map(tuple, sql.collect())) == \
        sorted(map(tuple, col.collect()))


def test_sql_fingerprint_and_tokens_match(spark, sf_dir):
    sql = spark.sql("""
        SELECT doc_id, ba_fingerprint(text) AS fp,
               size(ba_tokens(text)) AS n
        FROM documents
    """)
    col = (load(spark, sf_dir, "documents")
           .select("doc_id", fingerprint("text").alias("fp"),
                   F.size(tokens("text")).alias("n")))
    assert sorted(map(tuple, sql.collect())) == \
        sorted(map(tuple, col.collect()))


def test_sql_functions_stay_jvm_side(spark):
    # the macro body must inline into the plan — no Python eval node
    plan = spark.sql(
        "SELECT ba_cosine(embedding, embedding) AS c, "
        "ba_hash_bucket(CAST(vec_id AS STRING)) AS hb "
        "FROM embeddings")._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan


def test_sql_jaccard_values(spark):
    r = spark.sql("""
        SELECT ba_jaccard(array('a','b','c'), array('b','c','d')) AS half,
               ba_jaccard(array('a'), array('a')) AS one,
               ba_jaccard(CAST(array() AS ARRAY<STRING>),
                          CAST(array() AS ARRAY<STRING>)) AS empty
    """).first()
    assert r.half == 0.5
    assert r.one == 1.0
    assert r.empty == 1.0


def test_sql_hash_bucket_matches_pipeline_sampler(spark, sf_dir):
    from bigarrays_jl_spark.operators.pipeline import _hash_bucket
    sql = spark.sql(
        "SELECT doc_id, ba_hash_bucket(CAST(doc_id AS STRING)) AS hb "
        "FROM documents")
    col = (load(spark, sf_dir, "documents")
           .select("doc_id", _hash_bucket("doc_id").alias("hb")))
    assert sorted(map(tuple, sql.collect())) == \
        sorted(map(tuple, col.collect()))


def test_sql_guarded_cosine_matches_and_sentinels(spark):
    from bigarrays_jl_spark.functions.register import register_sql_functions
    register_sql_functions(spark)
    rows = spark.sql("""
        SELECT ba_guarded_cosine(CAST(array(1.0, 0.0) AS ARRAY<FLOAT>),
                                 CAST(array(1.0, 0.0) AS ARRAY<FLOAT>)) AS same,
               ba_guarded_cosine(CAST(array(0.0, 0.0) AS ARRAY<FLOAT>),
                                 CAST(array(1.0, 0.0) AS ARRAY<FLOAT>)) AS zero
    """).collect()[0]
    assert rows.same == 1.0 and rows.zero == -2.0
    # parity with the Column builder on a real pair
    from pyspark.sql import functions as F

    from bigarrays_jl_spark.functions import guarded_cosine
    df = spark.createDataFrame(
        [([1.0, 2.0], [2.0, 1.0]), ([0.0, 0.0], [1.0, 1.0])],
        "a array<float>, b array<float>")
    col = [r.c for r in df.select(
        guarded_cosine(F.col("a"), F.col("b")).alias("c")).collect()]
    df.createOrReplaceTempView("gc_pairs")
    sql = [r.c for r in spark.sql(
        "SELECT ba_guarded_cosine(a, b) AS c FROM gc_pairs").collect()]
    assert col == sql
