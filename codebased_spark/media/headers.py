"""Real media header codecs — pure stdlib, no PIL/ffmpeg needed.

Header-level decode covers the metadata a training-data pipeline actually
filters on (dimensions, duration, format) without pixel/sample decoding:

- PNG: IHDR width/height (spec: 8-byte signature, IHDR first chunk).
- JPEG: SOF0/SOF2 frame header scan (marker walk).
- WAV: RIFF fmt/data chunks -> sample rate + duration.
- MP4: box walk to moov/mvhd -> timescale/duration; moov/trak/tkhd ->
  display width/height.

Each format also has a deterministic BUILDER producing a structurally
valid minimal file (PNG includes correct CRCs and a real zlib IDAT), so
round-trip tests and the oracle-checked driver query exercise the real
parsers end-to-end on bytes we fully control — no external fixtures.

Full pixel/sample decode (PIL/soundfile/ffmpeg) remains out of scope in
this container and still raises NotImplementedError in decode.py.
"""

from __future__ import annotations

import struct
import zlib

PNG_MAGIC = b"\x89PNG\r\n\x1a\n"
JPEG_MAGIC = b"\xff\xd8"
RIFF_MAGIC = b"RIFF"


def sniff_media_format(b: bytes) -> str | None:
    """Magic-byte container detection (the real S4 file-type detection)."""
    if b.startswith(PNG_MAGIC):
        return "png"
    if b.startswith(JPEG_MAGIC):
        return "jpeg"
    if b.startswith(RIFF_MAGIC) and b[8:12] == b"WAVE":
        return "wav"
    if len(b) >= 12 and b[4:8] == b"ftyp":
        return "mp4"
    return None


# ---------------------------------------------------------------------------
# PNG
# ---------------------------------------------------------------------------


def parse_png(b: bytes) -> tuple[int, int]:
    """(width, height) from the IHDR chunk."""
    if not b.startswith(PNG_MAGIC):
        raise ValueError("not a PNG")
    length, ctype = struct.unpack(">I4s", b[8:16])
    if ctype != b"IHDR" or length < 8:
        raise ValueError("PNG missing IHDR")
    return struct.unpack(">II", b[16:24])


def _png_chunk(ctype: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + ctype
        + data
        + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
    )


def make_png(width: int, height: int) -> bytes:
    """Minimal valid 8-bit grayscale PNG of the given dimensions (each row
    zero-filled; real zlib IDAT, correct CRCs)."""
    ihdr = struct.pack(">IIBBBBB", width, height, 8, 0, 0, 0, 0)
    raw = (b"\x00" + b"\x00" * width) * height  # filter byte + pixels
    return (
        PNG_MAGIC
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(raw, 1))
        + _png_chunk(b"IEND", b"")
    )


# ---------------------------------------------------------------------------
# JPEG
# ---------------------------------------------------------------------------

_SOF_MARKERS = {0xC0, 0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                0xCD, 0xCE, 0xCF}


def parse_jpeg(b: bytes) -> tuple[int, int]:
    """(width, height) from the first SOF frame header (marker walk)."""
    if not b.startswith(JPEG_MAGIC):
        raise ValueError("not a JPEG")
    i = 2
    while i + 4 <= len(b):
        if b[i] != 0xFF:
            raise ValueError("JPEG marker desync")
        marker = b[i + 1]
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            i += 2
            continue
        seglen = struct.unpack(">H", b[i + 2 : i + 4])[0]
        if marker in _SOF_MARKERS:
            h, w = struct.unpack(">HH", b[i + 5 : i + 9])
            return w, h
        i += 2 + seglen
    raise ValueError("JPEG has no SOF header")


def make_jpeg(width: int, height: int) -> bytes:
    """Structurally valid JPEG header sequence (SOI, JFIF APP0, SOF0, EOI)
    carrying the given frame dimensions — enough for any header parser;
    not a renderable image (no scan data), which header-level tooling
    never reads."""
    app0 = b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    sof0 = struct.pack(">BHHB", 8, height, width, 1) + b"\x01\x11\x00"
    return (
        JPEG_MAGIC
        + b"\xff\xe0" + struct.pack(">H", 2 + len(app0)) + app0
        + b"\xff\xc0" + struct.pack(">H", 2 + len(sof0)) + sof0
        + b"\xff\xd9"
    )


# ---------------------------------------------------------------------------
# WAV
# ---------------------------------------------------------------------------


def parse_wav(b: bytes) -> tuple[int, int]:
    """(sample_rate, duration_ms) from RIFF fmt/data chunks."""
    if not (b.startswith(RIFF_MAGIC) and b[8:12] == b"WAVE"):
        raise ValueError("not a WAV")
    i = 12
    rate = block_align = data_size = None
    while i + 8 <= len(b):
        cid, csize = struct.unpack("<4sI", b[i : i + 8])
        if cid == b"fmt ":
            _, channels, rate = struct.unpack("<HHI", b[i + 8 : i + 16])
            block_align = struct.unpack("<H", b[i + 20 : i + 22])[0]
        elif cid == b"data":
            data_size = csize
        i += 8 + csize + (csize & 1)
    if rate is None or data_size is None or not block_align:
        raise ValueError("WAV missing fmt/data")
    n_frames = data_size // block_align
    return rate, (n_frames * 1000) // rate


def make_wav(sample_rate: int, duration_ms: int) -> bytes:
    """Minimal valid 16-bit mono PCM WAV of the given duration (silence).
    duration_ms must be a multiple of full milliseconds at sample_rate
    for exact round-trips (true for rate multiples of 1000)."""
    n_frames = (sample_rate * duration_ms) // 1000
    block_align = 2
    data = b"\x00" * (n_frames * block_align)
    fmt = struct.pack("<HHIIHH", 1, 1, sample_rate,
                      sample_rate * block_align, block_align, 16)
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )
    return RIFF_MAGIC + struct.pack("<I", len(body)) + body


# ---------------------------------------------------------------------------
# MP4
# ---------------------------------------------------------------------------


def _walk_boxes(b: bytes, start: int, end: int):
    i = start
    while i + 8 <= end:
        size, btype = struct.unpack(">I4s", b[i : i + 8])
        if size < 8:
            break
        yield btype, i + 8, min(i + size, end)
        i += size


def parse_mp4(b: bytes) -> tuple[int, int, int]:
    """(width, height, duration_ms) from moov/mvhd + moov/trak/tkhd."""
    if sniff_media_format(b) != "mp4":
        raise ValueError("not an MP4")
    width = height = dur_ms = None
    for btype, s, e in _walk_boxes(b, 0, len(b)):
        if btype != b"moov":
            continue
        for ityp, is_, ie in _walk_boxes(b, s, e):
            if ityp == b"mvhd":
                timescale, duration = struct.unpack(">II", b[is_ + 12 : is_ + 20])
                dur_ms = (duration * 1000) // timescale
            elif ityp == b"trak":
                for ttyp, ts_, te in _walk_boxes(b, is_, ie):
                    if ttyp == b"tkhd":
                        w16, h16 = struct.unpack(">II", b[te - 8 : te])
                        width, height = w16 >> 16, h16 >> 16
    if dur_ms is None:
        raise ValueError("MP4 missing moov/mvhd")
    return width or 0, height or 0, dur_ms


def _box(btype: bytes, payload: bytes) -> bytes:
    return struct.pack(">I4s", 8 + len(payload), btype) + payload


def make_mp4(width: int, height: int, duration_ms: int, timescale: int = 1000) -> bytes:
    """Minimal structurally valid MP4: ftyp + moov(mvhd, trak(tkhd))."""
    duration = (duration_ms * timescale) // 1000
    mvhd = b"\x00" * 12 + struct.pack(">II", timescale, duration) + b"\x00" * 80
    tkhd = b"\x00" * 76 + struct.pack(">II", width << 16, height << 16)
    moov = _box(b"mvhd", mvhd) + _box(b"trak", _box(b"tkhd", tkhd))
    return _box(b"ftyp", b"isom\x00\x00\x02\x00isomiso2") + _box(b"moov", moov)
