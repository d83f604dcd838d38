"""Perceptual image hash: kernel decode vs independent pixel-layout replay,
plus the dedup property (same pixels => same hash, regardless of doc id)."""
import struct

from pdf_extractor_spark.kernels import media
from pdf_extractor_spark.operators.multimodal import (
    image_ahash,
    synthesize_media,
)


def _bmp(w, h, pixel_bytes):
    """Independent BMP writer (struct-based, shares nothing with the JVM
    synthesis expressions)."""
    stride = ((w * 3 + 3) // 4) * 4
    img = stride * h
    body = (pixel_bytes + b"\x00" * img)[:img]
    return (
        b"BM"
        + struct.pack("<IHHI", 54 + img, 0, 0, 54)
        + struct.pack("<IiiHHIIIIII", 40, w, h, 1, 24, 0, img,
                      2835, 2835, 0, 0)
        + body
    )


def _py_ahash(w, h, body_bytes, bits=media.AHASH_BITS):
    """Replay from the SOURCE bytes (pre-container), mirroring the oracle."""
    stride = ((w * 3 + 3) // 4) * 4
    img = stride * h
    body = (body_bytes + b"\x00" * img)[:img]
    grays = []
    for k in range(w * h):
        off = (h - 1 - k // w) * stride + (k % w) * 3
        grays.append(body[off] + body[off + 1] + body[off + 2])
    n, s = len(grays), sum(grays)
    hv = 0
    for j in range(min(bits, n)):
        if grays[j] * n > s:
            hv |= 1 << j
    return hv


def test_known_grid():
    # 2x2, bright top-left only; scan order is top-down => bit 0 set
    px = bytes([255, 255, 255, 0, 0, 0, 0, 0]) + bytes(8)
    hv, w, h = media.ahash_bmp(_bmp(2, 2, b"\x00" * 8 + px[:8]))
    assert (w, h) == (2, 2)
    # rows stored bottom-up: bright pixel written in the SECOND stored row
    assert hv == 0b0001


def test_kernel_matches_source_replay():
    for w, h, text in [(4, 4, b"spark graft pixels"), (7, 3, b"x" * 5),
                       (5, 6, bytes(range(90)))]:
        hv, _, _ = media.ahash_bmp(_bmp(w, h, text))
        assert hv == _py_ahash(w, h, text)


def test_non_bmp_dispatch():
    assert media.ahash_bmp(b"RIFFxxxxWAVE") is None
    assert media.ahash_bmp(b"") is None


def test_same_pixels_same_hash(spark):
    # doc ids 13 and 13 + 2*lcm(13,7)=195 -> same (w, h); same text =>
    # identical pixel grids at different ids must collide
    rows = [(13, "identical pixel content"), (195, "identical pixel content"),
            (15, "different content entirely")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r.doc_id: r.ahash
        for r in image_ahash(synthesize_media(docs)).collect()
    }
    assert out[13] == out[195]
    assert out[13] != out[15]


def test_truncated_or_unsupported_bmp_is_data():
    # header claims 16x10 pixels but carries none: must not IndexError
    hdr = b"BM" + struct.pack("<IHHI", 54, 0, 0, 54) + struct.pack(
        "<IiiHHII", 40, 16, 10, 1, 24, 0, 0
    )
    assert media.ahash_bmp(hdr) is None
    # 8-bpp palette BMP: offsets would read garbage — refuse, don't guess
    hdr8 = b"BM" + struct.pack("<IHHI", 54, 0, 0, 54) + struct.pack(
        "<IiiHHII", 40, 4, 4, 1, 8, 0, 16
    ) + bytes(64)
    assert media.ahash_bmp(hdr8) is None
    # top-down (negative height) layout: refuse
    hdrneg = b"BM" + struct.pack("<IHHI", 54, 0, 0, 54) + struct.pack(
        "<IiiHHII", 40, 4, -4, 1, 24, 0, 48
    ) + bytes(64)
    assert media.ahash_bmp(hdrneg) is None
    # parse_bmp still reports the header fields for all of them
    assert media.parse_bmp(hdr8)["bpp"] == 8
