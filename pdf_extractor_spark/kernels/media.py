"""Stdlib-only media container decode: WAV (RIFF/fmt/data chunk walk) and
BMP (BITMAPFILEHEADER + BITMAPINFOHEADER) header parsing with ``struct``.

No codec library is needed to read these container headers — sample rate,
channel count, sample count, pixel dimensions and bit depth all live in
fixed little-endian header structures. This is the real decode step of the
multimodal pipeline (reference analog: the payload-type dispatch in
/root/reference/src/services/workflow_orchestrator.py:36-44 routes bytes to
format-specific handlers); pixel/sample DATA decode beyond the header would
need PIL/librosa and stays out of scope in this container.
"""
from __future__ import annotations

import struct
from typing import Optional

_FIELDS = (
    "container",
    "sample_rate",
    "channels",
    "bits",
    "n_samples",
    "duration_ms",
    "width",
    "height",
    "bpp",
    "image_size",
)


def _empty(container: str) -> dict:
    d: dict = {k: None for k in _FIELDS}
    d["container"] = container
    return d


def parse_wav(payload: bytes) -> Optional[dict]:
    """Walk the RIFF chunk list (chunks are 8-byte headers + payload, padded
    to even length) and pull the fmt fields + data length. Returns None if
    the bytes are not a well-formed RIFF/WAVE container."""
    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        return None
    out = _empty("wav")
    pos, data_len = 12, None
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        (clen,) = struct.unpack("<I", payload[pos + 4 : pos + 8])
        body = payload[pos + 8 : pos + 8 + clen]
        # a truncated payload can declare clen >= 16 yet carry fewer
        # bytes — slicing is silent, unpack is not; treat it as malformed
        # data (skip the chunk), never a struct.error task failure
        if cid == b"fmt " and clen >= 16 and len(body) >= 16:
            _fmt, ch, sr, _br, block_align, bits = struct.unpack(
                "<HHIIHH", body[:16]
            )
            out["channels"], out["sample_rate"], out["bits"] = ch, sr, bits
            out["_block_align"] = block_align
        elif cid == b"data":
            data_len = clen
        pos += 8 + clen + (clen & 1)  # RIFF pads odd-length chunks
    ba = out.pop("_block_align", None)
    if not ba or data_len is None or not out["sample_rate"]:
        return None
    out["n_samples"] = data_len // ba
    out["duration_ms"] = out["n_samples"] * 1000 // out["sample_rate"]
    return out


def parse_bmp(payload: bytes) -> Optional[dict]:
    """BITMAPFILEHEADER (14 bytes) + BITMAPINFOHEADER (40 bytes)."""
    if len(payload) < 54 or payload[:2] != b"BM":
        return None
    _size, _r1, _r2, _offset = struct.unpack("<IHHI", payload[2:14])
    header_size, w, h, _planes, bpp, _comp, image_size = struct.unpack(
        "<IiiHHII", payload[14:38]
    )
    if header_size != 40:
        return None
    out = _empty("bmp")
    out["width"], out["height"], out["bpp"] = w, h, bpp
    out["image_size"] = image_size
    return out


def parse_media_header(payload: bytes) -> dict:
    """Dispatch on the magic bytes; unrecognized payloads come back with
    container='unknown' and all fields null — malformed input is data,
    never a task failure (same guardrail contract as the PDF source)."""
    for parser in (parse_wav, parse_bmp):
        parsed = parser(payload)
        if parsed is not None:
            return parsed
    return _empty("unknown")


AHASH_BITS = 60  # bits 0..59 only: a 64-bit mask would overflow signed i64


def ahash_bmp(payload: bytes, bits: int = AHASH_BITS):
    """Perceptual average-hash over the DECODED pixel grid of a 24-bpp BMP:
    per-pixel brightness = the sum of its three channel bytes (monotone
    equivalent of the mean — no division), scan order top-down/left-right
    (BMP stores rows bottom-up with 4-byte row stride), bit j set iff
    pixel j is brighter than the image average (cross-multiplied:
    gray*n > sum — integer-exact). Returns (hash, width, height) or None
    for non-BMP bytes.

    Spec note: classic aHash resizes to 8x8 first; these fixture images
    are already <= 16x10, so the hash covers the first ``bits`` pixels of
    the native grid. The resize would be the only extra step at
    production image sizes (PIL territory, out of scope here)."""
    hdr = parse_bmp(payload)
    if hdr is None:
        return None
    w, h = hdr["width"], hdr["height"]
    # only the 24-bpp bottom-up layout this scan understands; anything
    # else (8-bpp palette, top-down negative height, dimensionless) would
    # read garbage offsets — malformed input is data, return None
    if hdr["bpp"] != 24 or w <= 0 or h <= 0:
        return None
    stride = ((w * 3 + 3) // 4) * 4
    px = payload[54:]
    # a truncated pixel array (header claims more pixels than the payload
    # carries) must not IndexError the task; the last row needs no pad
    if len(px) < (h - 1) * stride + w * 3:
        return None
    grays = []
    for k in range(w * h):
        off = (h - 1 - k // w) * stride + (k % w) * 3
        grays.append(px[off] + px[off + 1] + px[off + 2])
    n, s = len(grays), sum(grays)
    hv = 0
    for j in range(min(bits, n)):
        if grays[j] * n > s:
            hv |= 1 << j
    return hv, w, h


def wav_data_chunk(payload: bytes) -> Optional[bytes]:
    """The raw data-chunk bytes of a RIFF/WAVE container (the PCM sample
    stream), via the same chunk walk as :func:`parse_wav`. Returns None
    for non-WAV or data-less containers. Used by the payload-stats kernel
    — the step PAST header decode: arithmetic over the samples
    themselves."""
    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        return None
    pos = 12
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        (clen,) = struct.unpack("<I", payload[pos + 4 : pos + 8])
        if cid == b"data":
            return payload[pos + 8 : pos + 8 + clen]
        pos += 8 + clen + (clen & 1)
    return None
