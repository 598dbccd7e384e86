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


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("frame_idx", T.IntegerType(), False),
        T.StructField("frame_offset", T.LongType(), False),
        T.StructField("frame_md5", T.StringType(), True),
    ]
)

#: fixed-size "frame" window over the media payload and the sampling
#: stride — a real deployment reads container metadata instead.
FRAME_BYTES = 32
FRAME_STRIDE = 4


def _sample_frames(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """1 media row -> N sampled frames: every FRAME_STRIDE-th
    FRAME_BYTES-sized window. Real frame decode (libav) would slot in
    here; the fan-out, offsets and per-frame metadata are the part the
    engine owns."""
    for pdf in it:
        out: dict[str, list] = {"doc_id": [], "frame_idx": [], "frame_offset": [], "frame_md5": []}
        for doc_id, payload in zip(pdf["doc_id"], pdf["media"]):
            data = bytes(payload)
            n_frames = len(data) // FRAME_BYTES
            for i in range(0, n_frames, FRAME_STRIDE):
                off = i * FRAME_BYTES
                out["doc_id"].append(doc_id)
                out["frame_idx"].append(i)
                out["frame_offset"].append(off)
                out["frame_md5"].append(
                    hashlib.md5(data[off : off + FRAME_BYTES]).hexdigest()
                )
        yield pd.DataFrame(out)


@register(
    "q62_frame_sample",
    f"""
    WITH frames AS (
      SELECT doc_id,
             unnest(range(0, len(text) // {FRAME_BYTES}, {FRAME_STRIDE})) AS frame_idx
      FROM documents
    )
    SELECT f.doc_id,
           CAST(f.frame_idx AS INTEGER) AS frame_idx,
           CAST(f.frame_idx * {FRAME_BYTES} AS BIGINT) AS frame_offset,
           md5(substr(d.text, 1 + f.frame_idx * {FRAME_BYTES}, {FRAME_BYTES})) AS frame_md5
    FROM frames f JOIN documents d USING (doc_id)
    ORDER BY doc_id, frame_idx
    """,
    doc="Frame sampling: one media row fans out to every 4th fixed-size "
    "frame window with offset metadata and a per-frame digest (the "
    "video keyframe-sampling shape). Arrow-batched mapInPandas, "
    "partition-parallel, output size bounded by stride.",
)
def q62_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    media = docs.select("doc_id", F.col("text").cast("binary").alias("media"))
    return media.mapInPandas(_sample_frames, schema=FRAME_SCHEMA).orderBy(
        "doc_id", "frame_idx"
    )


# keep the by-value shipping invariant for mapInPandas closures
try:
    import sys as _sys

    from pyspark import cloudpickle as _cp

    _cp.register_pickle_by_value(_sys.modules[__name__])
except Exception:  # pragma: no cover
    pass
