"""Multimodal column operators (SURVEY §2B).

Pattern: media (image/audio/video) are opaque ``binary`` payload columns
with a typed metadata struct riding alongside — exactly the chunk-payload
machinery the Volume uses (SURVEY §1.6), applied to per-document blobs.

The container has no image/audio libraries, so the *decode* step is a
stub: ``decode_media`` raises NotImplementedError for real codecs, and
the tested pipeline uses the deterministic byte-level feature extractor
``mm_byte_features`` (mapInPandas, Arrow-batched) whose features are also
SQL-expressible — giving the UDF plumbing a real DuckDB oracle.

Scale notes: payloads never pass through Python row-at-a-time; the
feature extractor is an Arrow-batched mapInPandas and everything else is
JVM-side expressions.  At 100 TB the payload column stays columnar in
Parquet, so metadata-only queries never read the blobs (column pruning).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bigarrays_jl_spark.sources.tables import fan_out, load


def media_table(spark: SparkSession, sf: str) -> DataFrame:
    """Build the multimodal table: documents' text re-cast as an opaque
    binary payload + typed metadata struct (mime, n_bytes, source)."""
    d = load(spark, sf, "documents")
    return d.select(
        "doc_id",
        F.encode("text", "utf-8").alias("payload"),
        F.struct(
            F.lit("text/plain").alias("mime"),
            F.length(F.encode("text", "utf-8")).alias("n_bytes"),
            F.col("source").alias("origin"),
        ).alias("meta"))


def decode_media(payload_format: str):
    """Real media decode — stubbed: the container has no imaging/audio
    libraries.  The Spark-side plumbing (schema, batching, partitioning)
    is exercised by mm_byte_features below."""
    raise NotImplementedError(
        f"decode for {payload_format!r} requires imaging/audio libraries "
        "not present in this environment; see mm_byte_features for the "
        "tested UDF pipeline shape")


# --------------------------------------------------------------------------
# metadata-only query: never touches the payload column (column pruning)
# --------------------------------------------------------------------------

def mm_metadata(spark: SparkSession, sf: str) -> DataFrame:
    m = media_table(spark, sf)
    return (m.groupBy(F.col("meta.origin").alias("origin"),
                      F.col("meta.mime").alias("mime"))
             .agg(F.count("*").alias("n_media"),
                  F.sum("meta.n_bytes").cast("bigint").alias("total_bytes"),
                  F.max("meta.n_bytes").cast("bigint").alias("max_bytes")))


MM_METADATA_SQL = """
SELECT source AS origin, 'text/plain' AS mime, count(*) AS n_media,
       CAST(sum(octet_length(encode(text))) AS BIGINT) AS total_bytes,
       CAST(max(octet_length(encode(text))) AS BIGINT) AS max_bytes
FROM documents GROUP BY 1, 2
"""


# --------------------------------------------------------------------------
# Arrow-batched byte-feature extraction over the binary payload — the
# tested stand-in for image decode / resize / frame-sample UDFs.  Features
# are deterministic byte arithmetic so DuckDB can oracle them.
# --------------------------------------------------------------------------

def mm_byte_features(spark: SparkSession, sf: str) -> DataFrame:
    m = fan_out(spark, media_table(spark, sf).select("doc_id", "payload"))

    def extract(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np
        for b in it:
            payloads = b["payload"]
            n_bytes = payloads.map(len)
            first = payloads.map(lambda p: int(p[0]))
            # mean×10⁴ as exact integer arithmetic — immune to float
            # rounding-mode differences between engines
            mean_e4 = payloads.map(
                lambda p: int(np.frombuffer(p, dtype=np.uint8)
                              .astype(np.int64).sum()) * 10000 // len(p))
            yield pd.DataFrame({
                "doc_id": b["doc_id"],
                "n_bytes": n_bytes.astype("int64"),
                "first_byte": first.astype("int32"),
                "mean_byte_e4": mean_e4.astype("int64"),
            })

    return m.mapInPandas(
        extract, schema="doc_id bigint, n_bytes bigint, first_byte int, mean_byte_e4 bigint")


MM_BYTE_FEATURES_SQL = """
WITH b AS (SELECT doc_id, encode(text) AS p FROM documents),
s AS (SELECT doc_id,
             (SELECT sum(ascii(substr(text, CAST(i AS INT), 1)))
              FROM UNNEST(range(1, length(text) + 1)) u(i)) AS byte_sum
      FROM documents)
SELECT doc_id, CAST(octet_length(p) AS BIGINT) AS n_bytes,
       CAST(ascii(substr(text, 1, 1)) AS INT) AS first_byte,
       CAST(byte_sum * 10000 // octet_length(p) AS BIGINT) AS mean_byte_e4
FROM b JOIN documents USING (doc_id) JOIN s USING (doc_id)
"""


# --------------------------------------------------------------------------
# payload head fingerprint: hex head + content hash (dedup key for media)
# --------------------------------------------------------------------------

def mm_fingerprint(spark: SparkSession, sf: str) -> DataFrame:
    m = media_table(spark, sf)
    d = load(spark, sf, "documents").select("doc_id", "text")
    return (m.join(d, "doc_id")
             .select("doc_id",
                     F.hex(F.expr("substring(payload, 1, 8)")).alias("head_hex"),
                     F.md5("text").alias("content_md5"),
                     F.col("meta.n_bytes").cast("bigint").alias("n_bytes")))


MM_FINGERPRINT_SQL = """
SELECT doc_id, hex(encode(substr(text, 1, 8))) AS head_hex,
       md5(text) AS content_md5,
       CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes
FROM documents
"""


# --------------------------------------------------------------------------
# "resize": deterministic thumbnail — keep the first 16 bytes of every
# 64-byte block.  The real image-resize UDF has exactly this shape
# (binary in → smaller binary out, Arrow-batched, 1:1 rows); only the
# kernel inside the loop changes when an imaging library is present.
# --------------------------------------------------------------------------

THUMB_KEEP = 16
THUMB_BLOCK = 64


def mm_resize_thumb(spark: SparkSession, sf: str) -> DataFrame:
    m = fan_out(spark, media_table(spark, sf).select("doc_id", "payload"))

    def resize(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib
        for b in it:
            thumbs = b["payload"].map(
                lambda p: b"".join(p[i:i + THUMB_KEEP]
                                   for i in range(0, len(p), THUMB_BLOCK)))
            yield pd.DataFrame({
                "doc_id": b["doc_id"],
                "thumb_bytes": thumbs.map(len).astype("int64"),
                "thumb_md5": thumbs.map(lambda t: hashlib.md5(t).hexdigest()),
            })

    return m.mapInPandas(
        resize, schema="doc_id bigint, thumb_bytes bigint, thumb_md5 string")


MM_RESIZE_THUMB_SQL = f"""
WITH t AS (
  SELECT doc_id,
         (SELECT string_agg(substr(text, CAST(i AS INT) + 1, {THUMB_KEEP}),
                            '' ORDER BY i)
          FROM UNNEST(range(0, octet_length(encode(text)), {THUMB_BLOCK})) u(i))
         AS thumb
  FROM documents)
SELECT doc_id, CAST(octet_length(encode(thumb)) AS BIGINT) AS thumb_bytes,
       md5(thumb) AS thumb_md5
FROM t
"""


# --------------------------------------------------------------------------
# "frame sample": slice the payload into fixed-size frames and keep every
# 4th — the video-keyframe-extraction pipeline shape (binary in → MANY
# rows out through mapInPandas, the 1:N batch contract).
# --------------------------------------------------------------------------

FRAME_SIZE = 32
FRAME_STRIDE = 4


def mm_frame_sample(spark: SparkSession, sf: str) -> DataFrame:
    m = fan_out(spark, media_table(spark, sf).select("doc_id", "payload"))

    def sample(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib
        for b in it:
            ids, idxs, digests = [], [], []
            for doc_id, p in zip(b["doc_id"], b["payload"]):
                n_frames = len(p) // FRAME_SIZE
                for f in range(0, n_frames, FRAME_STRIDE):
                    ids.append(doc_id)
                    idxs.append(f)
                    digests.append(hashlib.md5(
                        p[f * FRAME_SIZE:(f + 1) * FRAME_SIZE]).hexdigest())
            yield pd.DataFrame({
                "doc_id": pd.Series(ids, dtype="int64"),
                "frame_idx": pd.Series(idxs, dtype="int32"),
                "frame_md5": pd.Series(digests, dtype="object"),
            })

    return m.mapInPandas(
        sample, schema="doc_id bigint, frame_idx int, frame_md5 string")


MM_FRAME_SAMPLE_SQL = f"""
SELECT doc_id, CAST(f AS INT) AS frame_idx,
       md5(substr(text, CAST(f * {FRAME_SIZE} AS INT) + 1, {FRAME_SIZE}))
       AS frame_md5
FROM documents,
     UNNEST(range(0, octet_length(encode(text)) // {FRAME_SIZE},
                  {FRAME_STRIDE})) u(f)
"""


QUERIES = {
    "mm_metadata": mm_metadata,
    "mm_byte_features": mm_byte_features,
    "mm_fingerprint": mm_fingerprint,
    "mm_resize_thumb": mm_resize_thumb,
    "mm_frame_sample": mm_frame_sample,
}

ORACLES = {
    "mm_metadata": MM_METADATA_SQL,
    "mm_byte_features": MM_BYTE_FEATURES_SQL,
    "mm_fingerprint": MM_FINGERPRINT_SQL,
    "mm_resize_thumb": MM_RESIZE_THUMB_SQL,
    "mm_frame_sample": MM_FRAME_SAMPLE_SQL,
}
