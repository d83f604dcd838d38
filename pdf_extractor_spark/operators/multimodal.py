"""Multimodal column plumbing: opaque binary payloads + typed metadata, with
decode/feature-extraction as Arrow-batched mapInPandas stubs.

The real image/audio decode libraries are not in this container, so the
decode kernel is a clearly-marked deterministic fake (byte-length-derived
features); everything Spark-side — binary schema, batching, UDF signature,
partition behavior — is real and oracle-checked (the fake features are
reproducible in SQL from octet lengths).
"""
from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

FEATURE_SCHEMA = (
    "doc_id bigint, n_bytes int, fake_width int, fake_height int, "
    "fake_frames int, modality string"
)


def _decode_stub(payload: bytes) -> dict:
    """STUB decode: a real deployment would decode image/audio bytes here
    (PIL/librosa/ffmpeg). Deterministic byte-length-derived fake so the
    Spark plumbing is testable without the codec libraries."""
    n = len(payload)
    return {
        "n_bytes": n,
        "fake_width": n % 640,
        "fake_height": n % 480,
        "fake_frames": n % 7 + 1,
        "modality": ("image", "audio", "video")[n % 3],
    }


def decode_features(binary_df: DataFrame) -> DataFrame:
    """mapInPandas over (doc_id, payload:binary): Arrow-batched binary in,
    typed feature rows out — the multimodal feature-extraction shape."""
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [_decode_stub(p) for p in pdf["payload"]]
            out = pd.DataFrame(feats)
            out.insert(0, "doc_id", pdf["doc_id"].values)
            yield out

    return binary_df.mapInPandas(run, schema=FEATURE_SCHEMA)


def real_decode_stub(payload: bytes):
    """The honest version: raises until codec libraries exist."""
    raise NotImplementedError(
        "image/audio decode requires PIL/librosa which are not installed; "
        "use _decode_stub for the deterministic fake path"
    )


def q_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Treat each document's utf-8 bytes as an opaque binary payload and run
    the decode/feature pipeline over it."""
    from . import load

    docs = load(spark, sf_dir, "documents")
    binary = docs.select("doc_id", F.encode("text", "utf-8").alias("payload"))
    return decode_features(binary)


FRAME_SCHEMA = (
    "doc_id bigint, frame_idx bigint, frame_offset bigint, frame_len bigint"
)


def sample_frames(binary_df: DataFrame) -> DataFrame:
    """1→N mapInPandas: each binary "video" payload emits one row per
    sampled frame (deterministic equal-stride offsets). This is the row-
    exploding UDTF shape — a real decoder would yield decoded frame tensors
    at these offsets; the stride/offset plumbing here is the real thing."""
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                n = len(payload)
                n_frames = n % 7 + 1
                stride = n // n_frames
                for i in range(n_frames):
                    rows.append((doc_id, i, i * stride, stride))
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "frame_idx", "frame_offset", "frame_len"],
            )

    return binary_df.mapInPandas(run, schema=FRAME_SCHEMA)


def q_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling over fake video payloads (documents' utf-8 bytes)."""
    from . import load

    docs = load(spark, sf_dir, "documents")
    binary = docs.select("doc_id", F.encode("text", "utf-8").alias("payload"))
    return sample_frames(binary)


ORACLES = {
    "frame_sample": """
        WITH d AS (
            SELECT doc_id,
                   octet_length(encode(text)) AS n,
                   octet_length(encode(text)) % 7 + 1 AS nf
            FROM documents
        )
        SELECT doc_id, r.frame_idx,
               r.frame_idx * (n // nf) AS frame_offset,
               n // nf AS frame_len
        FROM d, LATERAL (SELECT unnest(range(nf)) AS frame_idx) r
    """,
    "multimodal_features": """
        SELECT doc_id,
               octet_length(encode(text)) AS n_bytes,
               octet_length(encode(text)) % 640 AS fake_width,
               octet_length(encode(text)) % 480 AS fake_height,
               octet_length(encode(text)) % 7 + 1 AS fake_frames,
               CASE octet_length(encode(text)) % 3
                    WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video'
               END AS modality
        FROM documents
    """,
}

QUERIES = {
    "multimodal_features": q_multimodal_features,
    "frame_sample": q_frame_sample,
}
