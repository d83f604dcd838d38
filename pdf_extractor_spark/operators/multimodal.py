"""Multimodal columns: opaque binary payloads with typed metadata, decoded
by Arrow-batched mapInPandas kernels.

The decode is REAL (round 3): documents are wrapped into valid WAV
(RIFF/fmt/data) or BMP (BITMAPFILEHEADER + BITMAPINFOHEADER) containers —
built entirely JVM-side from little-endian byte expressions, parameters a
deterministic function of the row — and the kernel parses the headers back
with stdlib ``struct`` (kernels/media.py): magic dispatch, RIFF chunk walk,
sample-rate/channel/dimension extraction. No codec library is involved
because container headers don't need one; pixel/sample DATA decode (PIL /
librosa territory) is the only part out of scope in this container.

The DuckDB oracle replays the synthesis arithmetic in SQL, so a green row
proves the parser extracted from real bytes exactly the values the writer
put in — writer and parser share no code (reference analog: byte-payload
magic dispatch in /root/reference/src/services/workflow_orchestrator.py).
"""
from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..kernels.media import _FIELDS, parse_media_header


def _le_sql(expr: str, n_bytes: int) -> str:
    """SQL for the ``n_bytes``-wide little-endian encoding of an integer
    expression: per-byte hex -> lpad -> unhex, concatenated as BINARY."""
    return "concat(" + ", ".join(
        f"unhex(lpad(hex((({expr}) div {256 ** i}) % 256), 2, '0'))"
        for i in range(n_bytes)
    ) + ")"


# WAV synthesis parameters — deterministic functions of doc_id, mirrored
# verbatim in the DuckDB oracle.
_WAV_CH = "((doc_id div 2) % 2) + 1"
_WAV_SR = "8000 + ((doc_id div 4) % 5) * 4000"
_BMP_W = "4 + doc_id % 13"
_BMP_H = "4 + doc_id % 7"

_WAV_BYTES = (
    "concat(X'52494646', "                      # 'RIFF'
    + _le_sql("36 + data_len", 4)
    + ", X'57415645666D7420', "                 # 'WAVEfmt '
    + _le_sql("16", 4)                          # fmt chunk length
    + ", " + _le_sql("1", 2)                    # PCM
    + ", " + _le_sql("ch", 2)
    + ", " + _le_sql("sr", 4)
    + ", " + _le_sql("sr * ch * 2", 4)          # byte rate
    + ", " + _le_sql("ch * 2", 2)               # block align
    + ", " + _le_sql("16", 2)                   # bits per sample
    + ", X'64617461', "                         # 'data'
    + _le_sql("data_len", 4)
    + ", substring(body, 1, cast(data_len AS int)))"
)

_BMP_BYTES = (
    "concat(X'424D', "                          # 'BM'
    + _le_sql("54 + img", 4)
    + ", " + _le_sql("0", 4)                    # reserved
    + ", " + _le_sql("54", 4)                   # pixel offset
    + ", " + _le_sql("40", 4)                   # BITMAPINFOHEADER size
    + ", " + _le_sql("w", 4)
    + ", " + _le_sql("h", 4)
    + ", " + _le_sql("1", 2)                    # planes
    + ", " + _le_sql("24", 2)                   # bpp
    + ", " + _le_sql("0", 4)                    # BI_RGB
    + ", " + _le_sql("img", 4)
    + ", " + _le_sql("2835", 4)                 # x px/m
    + ", " + _le_sql("2835", 4)                 # y px/m
    + ", " + _le_sql("0", 4)                    # palette colors
    + ", " + _le_sql("0", 4)                    # important colors
    # pixel rows padded to 4-byte stride; pad/truncate body to exactly img
    + ", rpad(substring(body, 1, cast(img AS int)), cast(img AS int), X'00'))"
)


def synthesize_media(docs: DataFrame) -> DataFrame:
    """(doc_id, payload:binary) with REAL container bytes — even doc_ids
    become PCM WAV files (body = the document's utf-8 bytes as samples),
    odd doc_ids become 24-bit BMPs. Pure JVM expression work: the binary
    column is assembled from hex/unhex little-endian pieces, no Python."""
    params = docs.selectExpr(
        "doc_id",
        "encode(text, 'utf-8') AS body",
        f"CAST({_WAV_CH} AS bigint) AS ch",
        f"CAST({_WAV_SR} AS bigint) AS sr",
        f"CAST({_BMP_W} AS bigint) AS w",
        f"CAST({_BMP_H} AS bigint) AS h",
    ).selectExpr(
        "doc_id",
        "body",
        "ch",
        "sr",
        "w",
        "h",
        # sample data must align to whole blocks (block align = ch * 2)
        "octet_length(body) - octet_length(body) % (ch * 2) AS data_len",
        "(((w * 3 + 3) div 4) * 4) * h AS img",
    )
    return params.selectExpr(
        "doc_id",
        f"CASE WHEN doc_id % 2 = 0 THEN {_WAV_BYTES} ELSE {_BMP_BYTES} END"
        " AS payload",
    )


FEATURE_SCHEMA = (
    "doc_id bigint, n_bytes bigint, container string, sample_rate bigint, "
    "channels bigint, bits bigint, n_samples bigint, duration_ms bigint, "
    "width bigint, height bigint, bpp bigint, image_size bigint"
)


def decode_features(binary_df: DataFrame) -> DataFrame:
    """mapInPandas over (doc_id, payload:binary): Arrow-batched bytes in,
    header-parsed typed feature rows out. The kernel sees only the bytes —
    container type comes from magic dispatch, fields from ``struct``
    unpacking (kernels/media.py), never from the synthesis parameters."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                parsed = parse_media_header(bytes(payload))
                rows.append(
                    (int(doc_id), len(payload))
                    + tuple(parsed[k] for k in _FIELDS)
                )
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "n_bytes", *_FIELDS],
                dtype=object,
            )

    return binary_df.mapInPandas(run, schema=FEATURE_SCHEMA)


def q_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Synthesize real WAV/BMP containers from the documents table, then
    decode their headers back in the Arrow kernel.

    Fields of the other modality are emitted as -1 rather than NULL in this
    REGISTERED form only: the gate comparator pulls DuckDB results through
    pandas, which coerces a nullable BIGINT column to float64 — a sentinel
    keeps both sides exact int. ``decode_features`` itself yields true
    nulls."""
    from . import load

    feats = decode_features(
        synthesize_media(load(spark, sf_dir, "documents"))
    )
    return feats.select(
        "doc_id",
        "n_bytes",
        "container",
        *[
            F.coalesce(F.col(c), F.lit(-1)).alias(c)
            for c in _FIELDS
            if c != "container"
        ],
    )


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
    """Frame sampling over opaque payloads (documents' utf-8 bytes)."""
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
    # Replays the synthesis arithmetic: a hash match proves the struct
    # parser read back from real container bytes exactly what the JVM
    # byte-expression writer encoded.
    "multimodal_features": """
        WITH d AS (
            SELECT doc_id, octet_length(encode(text)) AS n,
                   ((doc_id // 2) % 2) + 1 AS ch,
                   8000 + ((doc_id // 4) % 5) * 4000 AS sr,
                   4 + doc_id % 13 AS w_,
                   4 + doc_id % 7 AS h_
            FROM documents
        ), wav AS (
            SELECT doc_id, n - n % (ch * 2) AS data_len, ch, sr FROM d
            WHERE doc_id % 2 = 0
        ), bmp AS (
            SELECT doc_id, w_, h_, (((w_ * 3 + 3) // 4) * 4) * h_ AS img
            FROM d WHERE doc_id % 2 = 1
        )
        SELECT doc_id, 44 + data_len AS n_bytes, 'wav' AS container,
               sr AS sample_rate, ch AS channels, 16 AS bits,
               data_len // (ch * 2) AS n_samples,
               (data_len // (ch * 2)) * 1000 // sr AS duration_ms,
               -1 AS width, -1 AS height,
               -1 AS bpp, -1 AS image_size
        FROM wav
        UNION ALL
        SELECT doc_id, 54 + img AS n_bytes, 'bmp' AS container,
               -1 AS sample_rate,
               -1 AS channels, -1 AS bits,
               -1 AS n_samples,
               -1 AS duration_ms,
               w_ AS width, h_ AS height, 24 AS bpp, img AS image_size
        FROM bmp
    """,
}

QUERIES = {
    "multimodal_features": q_multimodal_features,
    "frame_sample": q_frame_sample,
}


# ---------------------------------------------------------------------------
# Perceptual image dedup: average-hash over DECODED pixels. This is the
# image-modality sibling of simhash_buckets — the fingerprint is computed
# from the actual pixel bytes the BMP decoder reads back (bottom-up rows,
# 4-byte stride), not from any metadata, so visually identical payloads
# collide regardless of their doc ids. The mixed WAV/BMP stream goes
# through magic dispatch; only image payloads emit a hash row.
# ---------------------------------------------------------------------------

AHASH_SCHEMA = "doc_id bigint, width bigint, height bigint, ahash bigint"


def image_ahash(binary_df: DataFrame) -> DataFrame:
    """mapInPandas: BMP payloads -> (doc_id, width, height, ahash); other
    containers are dropped by magic dispatch inside the kernel."""
    from ..kernels.media import ahash_bmp

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                got = ahash_bmp(bytes(payload))
                if got is not None:
                    hv, w, h = got
                    rows.append((int(doc_id), w, h, hv))
            yield pd.DataFrame(
                rows, columns=["doc_id", "width", "height", "ahash"],
                dtype=object,
            )

    return binary_df.mapInPandas(run, schema=AHASH_SCHEMA)


def q_image_ahash_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per image: its pixel-level perceptual hash and how many corpus
    images share it (exact-collision dup clusters; Hamming-band probing
    for NEAR-dups is the simhash_buckets mechanism applied to this hash).

    Scale shape: the pixel decode is a pure Arrow map over the scan
    (spread to all cores — CPU-dense kernel, CLAUDE.md repartition rule);
    the collision count is one hash-keyed groupBy joined back on the same
    key. The oracle replays the full pixel arithmetic — stride layout,
    bottom-up row order, zero padding — from the source bytes in SQL."""
    from . import load, spread_for_cpu_map

    docs = load(spark, sf_dir, "documents")
    feats = image_ahash(spread_for_cpu_map(synthesize_media(docs)))
    counts = feats.groupBy("ahash").agg(
        F.count("*").alias("n_same_hash")
    )
    return feats.join(counts, "ahash").select(
        "doc_id", "width", "height", "ahash", "n_same_hash"
    )


QUERIES["image_ahash_dedup"] = q_image_ahash_dedup

# Pixel replay: byte at 0-based offset o of the (zero-padded) pixel body.
# DuckDB has no BLOB slicing, so the body is hexed ONCE and bytes come from
# 2-char substrings — byte-exact for any encoding.
_PX_BYTE = (
    "(CASE WHEN {o} < n_body THEN "
    "('0x' || substring(hx, 2 * ({o}) + 1, 2))::BIGINT ELSE 0 END)"
)

ORACLES["image_ahash_dedup"] = f"""
    WITH b AS (
        SELECT doc_id,
               4 + doc_id % 13 AS w,
               4 + doc_id % 7 AS h,
               (((4 + doc_id % 13) * 3 + 3) // 4) * 4 AS stride,
               hex(encode(text)) AS hx,
               octet_length(encode(text)) AS n_body
        FROM documents WHERE doc_id % 2 = 1
    ), px AS (
        SELECT doc_id, w, h, k,
               (h - 1 - k // w) * stride + (k % w) * 3 AS off,
               hx, n_body
        FROM b, LATERAL (SELECT unnest(range(w * h)) AS k) r
    ), g AS (
        SELECT doc_id, k,
               {_PX_BYTE.format(o="off")}
               + {_PX_BYTE.format(o="off + 1")}
               + {_PX_BYTE.format(o="off + 2")} AS gray
        FROM px
    ), tot AS (
        SELECT doc_id, sum(gray)::BIGINT AS s, count(*) AS n
        FROM g GROUP BY doc_id
    ), bits AS (
        SELECT g.doc_id,
               sum(CASE WHEN k < 60 AND gray * n > s
                        THEN 1::BIGINT << k::INT ELSE 0::BIGINT END
               )::BIGINT AS ahash
        FROM g JOIN tot USING (doc_id) GROUP BY g.doc_id
    ), cnt AS (
        SELECT ahash, count(*) AS n_same_hash FROM bits GROUP BY ahash
    )
    SELECT doc_id, w AS width, h AS height, ahash, n_same_hash
    FROM bits JOIN b USING (doc_id) JOIN cnt USING (ahash)
"""


# --- WAV payload (sample-stream) statistics --------------------------------------
PAYLOAD_STATS_SCHEMA = (
    "doc_id bigint, n_data_bytes bigint, sum_bytes bigint,"
    " max_byte bigint, n_rest bigint"
)
REST_BYTE = 32  # the space byte: the synthesized stream's silence point


def wav_payload_stats(binary_df: DataFrame) -> DataFrame:
    """The step PAST header decode: locate the RIFF data chunk (shared
    chunk walk in kernels/media.py) and compute statistics over the PCM
    sample stream itself — count, sum, max, and how many samples sit at
    the rest point. A real audio featurizer (RMS, VAD) is exactly this
    shape: Arrow batches of bytes in, numpy over the sample buffer, typed
    rows out. Non-WAV payloads yield no row (the kernel dispatches on
    magic, never on synthesis parameters)."""
    import numpy as np

    from ..kernels.media import wav_data_chunk

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                data = wav_data_chunk(bytes(payload))
                if data is None:
                    continue
                a = np.frombuffer(data, dtype=np.uint8)
                rows.append((
                    int(doc_id),
                    int(a.size),
                    int(a.sum(dtype=np.int64)),
                    int(a.max()) if a.size else -1,
                    int((a == REST_BYTE).sum()),
                ))
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "n_data_bytes", "sum_bytes", "max_byte",
                    "n_rest",
                ],
            )

    return binary_df.mapInPandas(run, schema=PAYLOAD_STATS_SCHEMA)


def q_wav_payload_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registered form: synthesize the WAV half of the corpus (even
    doc_ids) and stat the sample streams. The oracle recomputes from the
    source text's code points (the stream IS the utf-8 bytes; the corpus
    is pure ASCII so code point = byte) — a green row proves the kernel
    read the same bytes out of the container the writer put in."""
    from . import load

    docs = load(spark, sf_dir, "documents").where(F.col("doc_id") % 2 == 0)
    return wav_payload_stats(
        synthesize_media(docs).select("doc_id", "payload")
    )


QUERIES["wav_payload_stats"] = q_wav_payload_stats

ORACLES["wav_payload_stats"] = """
    WITH d AS (
        -- the writer truncates the sample stream to whole blocks
        -- (block align = ch * 2); mirror before streaming the chars
        SELECT doc_id, text,
               length(text)
                   - length(text) % ((((doc_id // 2) % 2) + 1) * 2) AS dl
        FROM documents WHERE doc_id % 2 = 0
    ), chars AS (
        SELECT doc_id, ord(substring(text, i, 1)) AS c
        FROM d, LATERAL (SELECT unnest(range(1, dl + 1)) AS i)
    )
    SELECT doc_id,
           count(*)::BIGINT AS n_data_bytes,
           sum(c)::BIGINT AS sum_bytes,
           max(c)::BIGINT AS max_byte,
           (count(*) FILTER (WHERE c = 32))::BIGINT AS n_rest
    FROM chars GROUP BY doc_id
"""
