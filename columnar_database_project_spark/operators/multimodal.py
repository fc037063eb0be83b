"""Multimodal column plumbing: opaque binary payloads + typed metadata.

The container has no image/audio libraries, so the decode step is a
clearly-marked stub (``decode_image`` raises NotImplementedError; a
deterministic fake extractor stands in for tests). What IS real and
tested is the Spark-side plumbing a 100 TB multimodal pipeline needs:

- binary columns with typed metadata (schema contract below),
- Arrow-batched ``mapInPandas`` feature extraction with a bounded
  batch size (``spark.sql.execution.arrow.maxRecordsPerBatch`` governs
  memory per executor — binary payloads must not be row-exploded),
- partition-count control so payload partitions stay under executor
  memory.

``documents.text`` (utf-8 encoded) stands in for the payload bytes.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from columnar_database_project_spark.catalog import load_table

FEATURE_SCHEMA = "doc_id long, n_bytes int, first_byte int, byte_mean double"


def decode_image(payload: bytes) -> "object":
    """Decode an image payload → array. STUB: no codec libs in this
    container; wire Pillow/ffmpeg here in a real deployment."""
    raise NotImplementedError(
        "image/audio codecs are not available in this environment; "
        "use fake_feature_batches for the tested plumbing path"
    )


def fake_feature_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Deterministic stand-in feature extractor (mapInPandas shape):
    consumes (doc_id, payload) Arrow batches, emits fixed-schema
    features. A real extractor swaps the body, not the plumbing."""
    for pdf in batches:
        payloads = pdf["payload"]
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "n_bytes": payloads.map(len).astype("int32"),
                "first_byte": payloads.map(
                    lambda b: b[0] if len(b) else -1
                ).astype("int32"),
                "byte_mean": payloads.map(
                    lambda b: float(sum(b)) / len(b) if len(b) else 0.0
                ).round(6),
            }
        )


def binary_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The multimodal table shape: (doc_id, payload binary, media_type,
    n_bytes) — text bytes standing in for image/audio payloads."""
    docs = load_table(spark, sf_dir, "documents")
    payload = F.encode(F.col("text"), "UTF-8")
    return docs.select(
        "doc_id",
        payload.alias("payload"),
        F.lit("text/plain").alias("media_type"),
        F.length(payload).alias("n_bytes"),
    )


def q_mm_binary_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed metadata over the binary column — pure JVM ops (byte
    length, content hash); fully oracle-checkable."""
    bt = binary_table(spark, sf_dir)
    return bt.select(
        "doc_id",
        "media_type",
        "n_bytes",
        F.md5(F.col("payload")).alias("payload_md5"),
    )


def q_mm_fake_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mapInPandas feature extraction over binary payloads (the fake
    extractor — deterministic, so the oracle can still verify the
    byte-level features in SQL)."""
    bt = binary_table(spark, sf_dir).select("doc_id", "payload")
    return bt.mapInPandas(fake_feature_batches, schema=FEATURE_SCHEMA)


QUERIES = {
    "mm_binary_meta": q_mm_binary_meta,
    "mm_fake_features": q_mm_fake_features,
}

ORACLES = {
    "mm_binary_meta": """
        SELECT doc_id, 'text/plain' AS media_type,
               CAST(octet_length(encode(text)) AS INT) AS n_bytes,
               md5(text) AS payload_md5
        FROM documents
    """,
    # byte-level features of utf-8 text: first byte = ascii code of first
    # char; mean byte value over the utf-8 encoding.
    "mm_fake_features": """
        SELECT doc_id,
               CAST(octet_length(encode(text)) AS INT) AS n_bytes,
               CAST(CASE WHEN octet_length(encode(text)) > 0
                         THEN ascii(substring(text, 1, 1)) ELSE -1 END AS INT)
                   AS first_byte,
               ROUND(list_sum(list_transform(
                         generate_series(1, octet_length(encode(text))),
                         i -> ascii(substring(text, i, 1))
                     )) / CAST(octet_length(encode(text)) AS DOUBLE), 6)
                   AS byte_mean
        FROM documents
    """,
}
