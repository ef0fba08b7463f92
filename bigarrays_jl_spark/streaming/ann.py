"""Streaming ANN index maintenance (builder extension, SURVEY §2C
round 9).

``similarity.py`` proves the IVF search path (broadcast-routed cell
pruning); a production corpus does not arrive in one batch, so the
index needs CONTINUOUS maintenance.  This bridge is the ANN analog of
``streaming_minhash_neardup``'s durable-index discipline:

- the coarse quantizer is FIT OFFLINE (``similarity._kmeans_fit`` —
  re-fitting per micro-batch would make cell identities drift and
  invalidate the standing index; production IVF systems freeze the
  quantizer and only re-train out-of-band);
- each micro-batch assigns its vectors to their nearest fitted
  centroid with the SAME ``_km_assign``/``_cosine`` canon as the batch
  operators (one canon, so streaming and batch can never disagree on a
  cell assignment), and appends ``(vec_id, score, embedding)`` rows to
  a parquet index HIVE-PARTITIONED BY CELL — a probe therefore prunes
  to nprobe directories at the file-listing level, exactly the
  partition-pruning story ``sources/layout.py`` pins for relational
  data;
- probes (``ann_index_topk``) route queries through the same broadcast
  centroids and scan only the probed cells' partitions.

Replay safety: foreachBatch is at-least-once, so a replayed batch
re-appends identical rows; ``read_ann_index`` drops duplicates by
``vec_id`` (the assignment is deterministic, so duplicates are exact
copies) — results are replay-invariant, pinned by the restart test.

Scale shape: per batch one broadcast cross-score against k centroids
(map-side, no shuffle — the row_number per vec_id partitions by the
batch's own ids) and one partitioned append ∝ batch size.  Probe cost
is |cells probed| data, never the corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from bigarrays_jl_spark.operators.similarity import (TOP_K, _cosine,
                                                     _km_assign)


def streaming_ann_ingest(embs: DataFrame, centroids,
                         index_path: str, checkpoint_path: str):
    """Continuously assign arriving ``(vec_id, embedding)`` rows to the
    frozen coarse quantizer and append them to the cell-partitioned
    index.  ``centroids`` is the collected fit — a list of
    ``(cell, centroid)`` rows (plan-time constants, broadcast each
    batch).  Returns the started StreamingQuery (caller stops it)."""
    cent_rows = [(int(c["cell"] if hasattr(c, "__getitem__") else c.cell),
                  list(c["centroid"] if hasattr(c, "__getitem__")
                       else c.centroid)) for c in centroids]

    def process_batch(batch_df, batch_id: int) -> None:
        spark = batch_df.sparkSession
        if not batch_df.head(1):
            return
        cent = spark.createDataFrame(
            cent_rows, "cell bigint, centroid array<double>")
        (_km_assign(batch_df.select("vec_id", "embedding"), cent)
         .select("vec_id", "score", "embedding", "cell")
         .write.mode("append").partitionBy("cell").parquet(index_path))

    return (embs.writeStream
            .foreachBatch(process_batch)
            .option("checkpointLocation", checkpoint_path)
            .start())


def read_ann_index(spark: SparkSession, index_path: str) -> DataFrame:
    """The standing index, replay-deduplicated (assignment is
    deterministic, so same-vec duplicates are exact copies — any one
    survives)."""
    return (spark.read.parquet(index_path)
            .dropDuplicates(["vec_id"]))


def ann_index_topk(spark: SparkSession, index_path: str,
                   queries: DataFrame, centroids,
                   top_k: int = TOP_K, nprobe: int = 1) -> DataFrame:
    """Search the streamed index: route each ``(qid, qe)`` query to its
    ``nprobe`` nearest frozen centroids, scan ONLY those cells'
    partitions (hive pruning at file-listing level), exact-cosine
    rescore, deterministic top-k."""
    cent_rows = [(int(c["cell"] if hasattr(c, "__getitem__") else c.cell),
                  list(c["centroid"] if hasattr(c, "__getitem__")
                       else c.centroid)) for c in centroids]
    cent = spark.createDataFrame(
        cent_rows, "cell bigint, centroid array<double>")
    routed = (queries.crossJoin(F.broadcast(cent))
              .withColumn("s", _cosine(F.col("qe"), F.col("centroid")))
              .withColumn("r", F.row_number().over(
                  W.partitionBy("qid").orderBy(F.col("s").desc(), "cell")))
              .filter(F.col("r") <= nprobe)
              .select("qid", "qe", F.col("cell").alias("probe")))
    # prune the index scan to the probed cells BEFORE deduplicating:
    # `cell` is the hive partition column, so the isin filter prunes at
    # file-listing level and probe cost is ∝ cells probed, never the
    # corpus.  (Deduplicating per-cell is equivalent to the global
    # dropDuplicates: assignment to the frozen quantizer is
    # deterministic, so every replayed duplicate of a vector lands in
    # the SAME cell.)  The probed-cell list is nprobe × |queries| ids —
    # driver-tiny by construction.
    probed = sorted({r["probe"] for r in
                     routed.select("probe").distinct().collect()})
    idx = (spark.read.parquet(index_path)
           .filter(F.col("cell").isin(probed))
           .dropDuplicates(["vec_id"]))
    scored = (idx.join(F.broadcast(routed), idx["cell"] == routed["probe"])
              .filter(F.col("vec_id") != F.col("qid"))
              .withColumn("cosine", _cosine(F.col("qe"), F.col("embedding"))))
    w = W.partitionBy("qid").orderBy(F.col("cosine").desc(), F.col("vec_id"))
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= top_k)
            .select("qid", F.col("probe").alias("cell"),
                    "vec_id", "cosine", "rank"))
