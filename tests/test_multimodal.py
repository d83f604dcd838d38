"""Real media decode: the struct-based header parser (kernels/media.py)
must agree with INDEPENDENT implementations — stdlib ``wave`` both as a
writer (we parse its output) and as a reader (it parses our synthesized
bytes) — and the Spark synthesize→decode round trip must be exact."""
import io
import struct
import wave

import pytest
from pyspark.sql import functions as F

from pdf_extractor_spark.kernels.media import (
    parse_bmp,
    parse_media_header,
    parse_wav,
)
from pdf_extractor_spark.operators.multimodal import (
    decode_features,
    synthesize_media,
)


def test_parse_wav_from_stdlib_writer():
    """Parse a WAV written by Python's wave module (independent writer)."""
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(2)
        w.setsampwidth(2)
        w.setframerate(22050)
        w.writeframes(b"\x01\x02\x03\x04" * 500)  # 500 stereo frames
    got = parse_wav(buf.getvalue())
    assert got["container"] == "wav"
    assert got["channels"] == 2
    assert got["sample_rate"] == 22050
    assert got["bits"] == 16
    assert got["n_samples"] == 500
    assert got["duration_ms"] == 500 * 1000 // 22050


def test_parse_wav_walks_extra_chunks():
    """The RIFF walker must skip unknown chunks (incl. odd-length padding)
    before fmt/data — fixed-offset parsing would fail here."""
    fmt = struct.pack("<HHIIHH", 1, 1, 8000, 16000, 2, 16)
    junk = b"JUNK" + struct.pack("<I", 3) + b"abc" + b"\x00"  # odd, padded
    data = b"\x00\x01" * 10
    body = junk + b"fmt " + struct.pack("<I", 16) + fmt
    body += b"data" + struct.pack("<I", len(data)) + data
    payload = b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body
    got = parse_wav(payload)
    assert got["sample_rate"] == 8000
    assert got["n_samples"] == 10


def test_parse_bmp_header():
    img = ((7 * 3 + 3) // 4) * 4 * 5
    payload = (
        b"BM" + struct.pack("<IHHI", 54 + img, 0, 0, 54)
        + struct.pack("<IiiHHII", 40, 7, 5, 1, 24, 0, img)
        + struct.pack("<iiII", 2835, 2835, 0, 0)
        + b"\x00" * img
    )
    got = parse_bmp(payload)
    assert (got["width"], got["height"], got["bpp"]) == (7, 5, 24)
    assert got["image_size"] == img


def test_malformed_payload_is_data_not_failure():
    for junk in (b"", b"RIFF", b"BMx", b"%PDF-1.4 not media", b"RIFFxxxxWAVE"):
        got = parse_media_header(junk)
        assert got["container"] == "unknown"
        assert got["sample_rate"] is None and got["width"] is None


def test_synthesized_wav_opens_with_stdlib_reader(spark):
    """Our JVM byte-expression writer must produce files Python's wave
    module accepts, with the parameters the synthesis arithmetic says."""
    docs = spark.createDataFrame(
        [(i, "payload text for synth " * (i + 1)) for i in range(0, 8, 2)],
        "doc_id long, text string",
    )
    for row in synthesize_media(docs).collect():
        with wave.open(io.BytesIO(bytes(row.payload)), "rb") as w:
            assert w.getnchannels() == ((row.doc_id // 2) % 2) + 1
            assert w.getframerate() == 8000 + ((row.doc_id // 4) % 5) * 4000
            assert w.getsampwidth() == 2


def test_synthesized_bmp_header_fields(spark):
    docs = spark.createDataFrame(
        [(i, "bmp body " * 40) for i in range(1, 8, 2)],
        "doc_id long, text string",
    )
    for row in synthesize_media(docs).collect():
        got = parse_bmp(bytes(row.payload))
        w, h = 4 + row.doc_id % 13, 4 + row.doc_id % 7
        assert (got["width"], got["height"]) == (w, h)
        assert got["image_size"] == ((w * 3 + 3) // 4) * 4 * h
        assert len(bytes(row.payload)) == 54 + got["image_size"]


def test_decode_features_roundtrip(spark):
    """End-to-end synthesize -> Arrow decode: parsed fields equal the
    synthesis parameters for every row, nulls on the other modality."""
    docs = spark.createDataFrame(
        [(i, f"text body number {i} " * (3 + i)) for i in range(10)],
        "doc_id long, text string",
    )
    rows = {r.doc_id: r for r in decode_features(synthesize_media(docs)).collect()}
    assert len(rows) == 10
    for i, r in rows.items():
        if i % 2 == 0:
            assert r.container == "wav"
            assert r.channels == ((i // 2) % 2) + 1
            assert r.sample_rate == 8000 + ((i // 4) % 5) * 4000
            assert r.width is None
            assert r.n_bytes == 44 + r.n_samples * r.channels * 2
        else:
            assert r.container == "bmp"
            assert r.bpp == 24 and r.sample_rate is None
            assert r.n_bytes == 54 + r.image_size


def test_decode_unknown_payload_in_spark(spark):
    binary = spark.createDataFrame(
        [(1, bytearray(b"not a media file at all"))],
        "doc_id long, payload binary",
    )
    r = decode_features(binary).first()
    assert r.container == "unknown" and r.sample_rate is None


def test_truncated_wav_fmt_chunk_is_data():
    """Payload declares a 16-byte fmt chunk but ends mid-chunk: the walk
    must treat it as malformed data, not raise struct.error in the task."""
    truncated = b"RIFF" + b"\x24\x00\x00\x00" + b"WAVE" + b"fmt " + \
        struct.pack("<I", 16) + b"\x01\x00\x02"  # 3 of 16 declared bytes
    got = parse_media_header(truncated)
    assert got["container"] == "unknown"
