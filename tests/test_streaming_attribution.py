"""Streaming multi-touch attribution (applyInPandasWithState) vs the
batch largest-remainder operator.

The allocation is only correct when purchases finalize AFTER every
view that could enter their lookback — these tests drive multi-batch
feeds whose splits land inside lookback windows, plus the timeout path
(the last purchases finalize with no further real rows)."""

import datetime as dt

from pyspark.sql import functions as F

from bigarrays_jl_spark.operators.round10g import q76_attribution
from bigarrays_jl_spark.sources.tables import load
from bigarrays_jl_spark.streaming.attribution import streaming_attribution

EVENT_SCHEMA = ("user_id long, event_id long, event_type string, "
                "ts timestamp, value double, props string")


def _feed(spark, src, ckpt, files, name):
    import os
    os.makedirs(src, exist_ok=True)
    stream = spark.readStream.schema(EVENT_SCHEMA).parquet(src)
    q = (streaming_attribution(stream).writeStream
         .outputMode("append").format("memory")
         .queryName(name).option("checkpointLocation", ckpt).start())
    try:
        for df in files:
            df.coalesce(1).write.mode("append").parquet(src)
            q.processAllAvailable()
    finally:
        q.stop()
    return spark.sql(f"SELECT * FROM {name}")


def _sentinels(spark, n=2):
    return [spark.createDataFrame(
        [(-1, -1 - i, "noop", dt.datetime(2030, 1, 1 + i), 0.0, "{}")],
        EVENT_SCHEMA)
        for i in range(n)]


def test_streaming_attribution_matches_batch(spark, sf_dir, tmp_path):
    e = (load(spark, sf_dir, "events")
         .select("user_id", "event_id", "event_type", "ts", "value",
                 "props", F.col("ts").cast("long").alias("sec")))
    lo, hi = e.agg(F.min("sec"), F.max("sec")).first()
    cut1, cut2 = lo + (hi - lo) // 3, lo + 2 * (hi - lo) // 3
    batches = [e.filter(F.col("sec") <= cut1).drop("sec"),
               e.filter((F.col("sec") > cut1)
                        & (F.col("sec") <= cut2)).drop("sec"),
               e.filter(F.col("sec") > cut2).drop("sec")]
    rows = _feed(spark, str(tmp_path / "src"), str(tmp_path / "ckpt"),
                 batches + _sentinels(spark), "t_attr")
    got = {r["channel"]: (r["attributed_cents"], r["n_touches"],
                          r["n_purchases"])
           for r in (rows.filter(F.col("user_id") >= 0)
                     .groupBy("channel")
                     .agg(F.sum("alloc").cast("bigint")
                           .alias("attributed_cents"),
                          F.count("*").alias("n_touches"),
                          F.countDistinct("p_id").alias("n_purchases"))
                     .collect())}
    want = {r["channel"]: (r["attributed_cents"], r["n_touches"],
                           r["n_purchases"])
            for r in q76_attribution(spark, sf_dir).collect()}
    assert got == want
    # multiple channels genuinely received allocations
    assert len(got) > 1


def test_streaming_attribution_cent_conservation(spark, sf_dir,
                                                 tmp_path):
    """Every allocated purchase's cents sum exactly to its price —
    the largest-remainder invariant survives streaming finalization."""
    e = (load(spark, sf_dir, "events")
         .select("user_id", "event_id", "event_type", "ts", "value",
                 "props"))
    rows = _feed(spark, str(tmp_path / "src"), str(tmp_path / "ckpt"),
                 [e] + _sentinels(spark), "t_attr_c")
    alloc = (rows.filter(F.col("user_id") >= 0)
             .groupBy("p_id").agg(F.sum("alloc").alias("tot")))
    p = (load(spark, sf_dir, "events")
         .filter(F.col("event_type") == "purchase")
         .select(F.col("event_id").alias("p_id"),
                 F.round(F.col("value") * 100).cast("bigint")
                  .alias("cents")))
    bad = (alloc.join(p, "p_id")
           .filter(F.col("tot") != F.col("cents")).count())
    assert bad == 0
    assert alloc.count() > 0
