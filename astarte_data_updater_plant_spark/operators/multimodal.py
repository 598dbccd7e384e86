"""Multimodal columns: opaque binary media + typed metadata.

The pattern for image/audio/video at 100 TB: media travels as an
opaque ``binary`` column with typed metadata alongside; decode /
feature-extraction runs as Arrow-batched Python (``mapInPandas``) so
each task processes a columnar batch without per-row serde. The
container has no image/audio codecs, so the decode step is a
deterministic stub (documented NotImplementedError for real codecs +
a reproducible fake) — the Spark-side plumbing (schema, batching,
partition flow) is real and oracle-checked.

``documents.text`` bytes stand in for the media payload; on a real
corpus the source column would be parquet binary written by the
ingest layer.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..plans.registry import register
from ..sources.tables import load_table

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("media_md5", T.StringType(), True),
        T.StructField("header_hex", T.StringType(), True),
        T.StructField("thumb_md5", T.StringType(), True),
    ]
)


def decode_media(payload: bytes) -> object:
    """Real codec hook — NOT available in this container.

    A production deployment plugs Pillow/libav here; the engine only
    requires that the function is batch-applied inside mapInPandas.
    """
    raise NotImplementedError("media codecs not installed; use extract_features (stub)")


def _extract_batch(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in it:
        payloads = pdf["media"]
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "n_bytes": payloads.map(len).astype("int64"),
                "media_md5": payloads.map(lambda b: hashlib.md5(b).hexdigest()),
                "header_hex": payloads.map(lambda b: bytes(b[:8]).hex()),
                # deterministic fake "thumbnail": first 64 bytes digest
                "thumb_md5": payloads.map(lambda b: hashlib.md5(bytes(b[:64])).hexdigest()),
            }
        )


@register(
    "q60_multimodal_features",
    """
    SELECT doc_id,
           CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) AS n_bytes,
           md5(text) AS media_md5,
           lower(hex(CAST(substr(text, 1, 8) AS BLOB))) AS header_hex,
           md5(substr(text, 1, 64)) AS thumb_md5
    FROM documents
    ORDER BY doc_id
    """,
    doc="Multimodal feature extraction: binary media column -> Arrow-"
    "batched mapInPandas (length, content hash, header bytes, "
    "thumbnail digest stub). Partition-parallel, no shuffle; the "
    "oracle recomputes the same features in SQL.",
)
def q60_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    media = docs.select("doc_id", F.col("text").cast("binary").alias("media"))
    return media.mapInPandas(_extract_batch, schema=FEATURE_SCHEMA).orderBy("doc_id")


@register(
    "q61_media_dedup",
    """
    SELECT media_md5 AS content_hash, COUNT(*) AS n_copies, MIN(doc_id) AS canonical_doc
    FROM (
      SELECT doc_id, md5(text) AS media_md5 FROM documents
    ) t
    GROUP BY media_md5
    ORDER BY content_hash
    """,
    doc="Media dedup on the extracted content hash — exact dedup over "
    "binary columns composes the multimodal extraction with the "
    "hash-groupBy dedup stage.",
)
def q61_media_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    feats = q60_multimodal_features(spark, sf_dir)
    return (
        feats.groupBy(F.col("media_md5").alias("content_hash"))
        .agg(F.count(F.lit(1)).alias("n_copies"), F.min("doc_id").alias("canonical_doc"))
        .orderBy("content_hash")
    )


# keep the by-value shipping invariant for mapInPandas closures
try:
    import sys as _sys

    from pyspark import cloudpickle as _cp

    _cp.register_pickle_by_value(_sys.modules[__name__])
except Exception:  # pragma: no cover
    pass
