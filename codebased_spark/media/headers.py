"""Real media codecs — pure stdlib, no PIL/ffmpeg needed.

Header-level decode covers the metadata a training-data pipeline actually
filters on (dimensions, duration, format):

- PNG: IHDR width/height (spec: 8-byte signature, IHDR first chunk).
- JPEG: SOF0/SOF2 frame header scan (marker walk).
- WAV: RIFF fmt/data chunks -> sample rate + duration.
- MP4: box walk to moov/mvhd -> timescale/duration; moov/trak/tkhd ->
  display width/height.

SAMPLE-level decode is real for the uncompressed containers (r4,
shrinking the NotImplementedError surface to codec-library formats):

- BMP (24-bit BI_RGB): full pixel decode incl. bottom-up rows + 4-byte
  row padding.
- PPM (P6 binary): full pixel decode.
- WAV (16-bit mono PCM): full sample decode.

Each format also has a deterministic BUILDER producing a structurally
valid minimal file (PNG includes correct CRCs and a real zlib IDAT), so
round-trip tests and the oracle-checked driver queries exercise the real
parsers end-to-end on bytes we fully control — no external fixtures.

Pixel/sample decode of COMPRESSED containers (JPEG scan data, MP4 tracks,
non-PCM audio) needs PIL/soundfile/ffmpeg and still raises
NotImplementedError in decode.py.
"""

from __future__ import annotations

import struct
import zlib

PNG_MAGIC = b"\x89PNG\r\n\x1a\n"
JPEG_MAGIC = b"\xff\xd8"
RIFF_MAGIC = b"RIFF"
BMP_MAGIC = b"BM"
PPM_MAGIC = b"P6"


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
    if b.startswith(BMP_MAGIC):
        return "bmp"
    if b.startswith(PPM_MAGIC):
        return "ppm"
    if b[:6] in (b"GIF87a", b"GIF89a"):
        return "gif"
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
    return make_wav_pcm([0] * n_frames, sample_rate)


def make_wav_pcm(samples: list[int], sample_rate: int = 8000) -> bytes:
    """Valid 16-bit mono PCM WAV carrying the given sample values."""
    block_align = 2
    data = struct.pack(f"<{len(samples)}h", *samples)
    fmt = struct.pack("<HHIIHH", 1, 1, sample_rate,
                      sample_rate * block_align, block_align, 16)
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )
    return RIFF_MAGIC + struct.pack("<I", len(body)) + body


# ---------------------------------------------------------------------------
# BMP / PPM — uncompressed raster containers with REAL pixel decode
# ---------------------------------------------------------------------------


def make_bmp(gray_rows: bytes, width: int, height: int) -> bytes:
    """Valid 24-bit BI_RGB BMP: `gray_rows` is a width*height single-
    channel array (row-major, top-down); each value is replicated to BGR.
    Rows are stored bottom-up with 4-byte padding per the spec."""
    if len(gray_rows) != width * height:
        raise ValueError("gray_rows must be width*height bytes")
    pad = (4 - (width * 3) % 4) % 4
    body = bytearray()
    for y in range(height - 1, -1, -1):  # bottom-up
        row = gray_rows[y * width : (y + 1) * width]
        for v in row:
            body += bytes((v, v, v))
        body += b"\x00" * pad
    info = struct.pack(
        "<IiiHHIIiiII", 40, width, height, 1, 24, 0, len(body), 2835, 2835, 0, 0
    )
    header = struct.pack("<2sIHHI", BMP_MAGIC, 14 + 40 + len(body), 0, 0, 54)
    return header + info + bytes(body)


def parse_bmp(b: bytes) -> tuple[int, int, bytes]:
    """(width, height, gray_rows top-down) — real pixel decode of a
    24-bit BI_RGB BMP (gray = blue channel; the builder writes B=G=R)."""
    if not b.startswith(BMP_MAGIC):
        raise ValueError("not a BMP")
    offset = struct.unpack("<I", b[10:14])[0]
    hdr_size, width, height = struct.unpack("<Iii", b[14:26])
    bpp = struct.unpack("<H", b[28:30])[0]
    compression = struct.unpack("<I", b[30:34])[0]
    if hdr_size < 40 or bpp != 24 or compression != 0:
        raise ValueError("only 24-bit BI_RGB BMP supported")
    bottom_up = height > 0
    height = abs(height)
    stride = (width * 3 + 3) // 4 * 4
    rows = []
    for r in range(height):
        start = offset + r * stride
        rows.append(b[start : start + width * 3 : 3])  # blue channel
    if bottom_up:
        rows.reverse()
    return width, height, b"".join(rows)


def make_ppm(gray_rows: bytes, width: int, height: int) -> bytes:
    """Valid binary PPM (P6, maxval 255): gray replicated to RGB."""
    if len(gray_rows) != width * height:
        raise ValueError("gray_rows must be width*height bytes")
    head = f"P6\n{width} {height}\n255\n".encode("ascii")
    return head + bytes(v for g in gray_rows for v in (g, g, g))


def parse_ppm(b: bytes) -> tuple[int, int, bytes]:
    """(width, height, gray_rows) — real pixel decode of a binary PPM
    (gray = red channel; comments and flexible whitespace per the spec)."""
    if not b.startswith(PPM_MAGIC):
        raise ValueError("not a P6 PPM")
    # header = magic + 3 whitespace-separated ints, '#' comments allowed
    fields: list[int] = []
    i = 2
    while len(fields) < 3:
        while i < len(b) and b[i : i + 1].isspace():
            i += 1
        if b[i : i + 1] == b"#":
            while i < len(b) and b[i] != 0x0A:
                i += 1
            continue
        j = i
        while j < len(b) and not b[j : j + 1].isspace():
            j += 1
        fields.append(int(b[i:j]))
        i = j
    i += 1  # single whitespace after maxval
    width, height, maxval = fields
    if maxval != 255:
        raise ValueError("only maxval 255 PPM supported")
    return width, height, b[i : i + width * height * 3 : 3]


def parse_wav_samples(b: bytes) -> list[int]:
    """Real sample decode: the 16-bit mono PCM sample values of a WAV.
    Raises on non-PCM / non-16-bit / multi-channel (codec territory)."""
    if not (b.startswith(RIFF_MAGIC) and b[8:12] == b"WAVE"):
        raise ValueError("not a WAV")
    i = 12
    fmt_ok = False
    data = None
    while i + 8 <= len(b):
        cid, csize = struct.unpack("<4sI", b[i : i + 8])
        if cid == b"fmt ":
            audio_fmt, channels = struct.unpack("<HH", b[i + 8 : i + 12])
            bits = struct.unpack("<H", b[i + 22 : i + 24])[0]
            if audio_fmt != 1 or channels != 1 or bits != 16:
                raise ValueError("only 16-bit mono PCM supported")
            fmt_ok = True
        elif cid == b"data":
            data = b[i + 8 : i + 8 + csize]
        i += 8 + csize + (csize & 1)
    if not fmt_ok or data is None:
        raise ValueError("WAV missing fmt/data")
    return list(struct.unpack(f"<{len(data) // 2}h", data[: len(data) // 2 * 2]))


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


# ---------------------------------------------------------------------------
# EXIF (TIFF IFD0 inside a JPEG APP1 segment)
# ---------------------------------------------------------------------------

EXIF_TAG_MAKE = 0x010F  # ASCII
EXIF_TAG_ORIENTATION = 0x0112  # SHORT


def make_jpeg_exif(
    width: int,
    height: int,
    make: str,
    orientation: int,
    big_endian: bool = False,
) -> bytes:
    """JPEG whose APP1 segment carries a real EXIF TIFF block: byte-order
    mark (II/MM), magic 42, IFD0 with Make (ASCII, value stored past the
    IFD when longer than the 4-byte inline field) and Orientation (SHORT,
    inlined left-justified). APP1 goes immediately after SOI per the EXIF
    spec; the JFIF APP0 + SOF0 frame from make_jpeg follow, so parse_jpeg's
    marker walk still finds the dimensions. Reference analog: S4 file-type
    detection (src/codebased/parsers/file_types.py:47-74) routes docs by
    format exactly like sniff_media_format + this typed-metadata parser."""
    bo = ">" if big_endian else "<"
    make_bytes = make.encode("ascii") + b"\x00"
    ifd_offset = 8
    value_offset = ifd_offset + 2 + 2 * 12 + 4

    def entry(tag: int, typ: int, count: int, field: bytes) -> bytes:
        return struct.pack(bo + "HHI", tag, typ, count) + field

    if len(make_bytes) <= 4:
        make_field, tail = make_bytes.ljust(4, b"\x00"), b""
    else:
        make_field, tail = struct.pack(bo + "I", value_offset), make_bytes
    orient_field = struct.pack(bo + "H", orientation) + b"\x00\x00"
    tiff = (
        (b"MM" if big_endian else b"II")
        + struct.pack(bo + "H", 42)
        + struct.pack(bo + "I", ifd_offset)
        + struct.pack(bo + "H", 2)
        + entry(EXIF_TAG_MAKE, 2, len(make_bytes), make_field)
        + entry(EXIF_TAG_ORIENTATION, 3, 1, orient_field)
        + struct.pack(bo + "I", 0)
        + tail
    )
    app1 = b"Exif\x00\x00" + tiff
    return (
        JPEG_MAGIC
        + b"\xff\xe1" + struct.pack(">H", 2 + len(app1)) + app1
        + make_jpeg(width, height)[2:]
    )


def _parse_tiff_ifd0(t: bytes) -> tuple[str, int, str]:
    order = t[:2]
    if order == b"II":
        bo = "<"
    elif order == b"MM":
        bo = ">"
    else:
        raise ValueError("bad TIFF byte-order mark")
    (magic,) = struct.unpack_from(bo + "H", t, 2)
    if magic != 42:
        raise ValueError("bad TIFF magic")
    (off,) = struct.unpack_from(bo + "I", t, 4)
    (count,) = struct.unpack_from(bo + "H", t, off)
    make, orientation = "", 0
    for k in range(count):
        e = off + 2 + 12 * k
        tag, typ, n = struct.unpack_from(bo + "HHI", t, e)
        if tag == EXIF_TAG_MAKE and typ == 2:
            if n <= 4:
                raw = t[e + 8 : e + 8 + n]
            else:
                (voff,) = struct.unpack_from(bo + "I", t, e + 8)
                raw = t[voff : voff + n]
            make = raw.rstrip(b"\x00").decode("ascii")
        elif tag == EXIF_TAG_ORIENTATION and typ == 3:
            (orientation,) = struct.unpack_from(bo + "H", t, e + 8)
    return make, orientation, "MM" if bo == ">" else "II"


def parse_exif(b: bytes) -> tuple[str, int, str]:
    """(camera_make, orientation, byte_order) from the first APP1 Exif
    segment — the camera metadata an image-curation pipeline filters and
    deduplicates on (and strips before release: EXIF can carry GPS)."""
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
        if marker == 0xE1 and b[i + 4 : i + 10] == b"Exif\x00\x00":
            return _parse_tiff_ifd0(b[i + 10 : i + 2 + seglen])
        i += 2 + seglen
    raise ValueError("JPEG has no Exif APP1 segment")


# ---------------------------------------------------------------------------
# ID3v1 (fixed 128-byte MP3 trailer)
# ---------------------------------------------------------------------------


def make_mp3_id3v1(title: str, artist: str, genre: int) -> bytes:
    """Minimal MP3-ish payload: one MPEG frame-sync header + an ID3v1
    trailer (the fixed-layout 128-byte block: 'TAG', 30-byte title,
    30-byte artist, 30-byte album, 4-byte year, 30-byte comment, genre
    byte). ID3v1 is the simplest real audio-metadata container and is
    still ubiquitous in crawled MP3s."""
    tag = (
        b"TAG"
        + title.encode("ascii")[:30].ljust(30, b"\x00")
        + artist.encode("ascii")[:30].ljust(30, b"\x00")
        + b"\x00" * 30  # album
        + b"2024"
        + b"\x00" * 30  # comment
        + bytes([genre & 0xFF])
    )
    return b"\xff\xfb\x90\x00" + b"\x00" * 16 + tag


def parse_id3v1(b: bytes) -> tuple[str, str, int]:
    """(title, artist, genre) from the trailing 128-byte ID3v1 block."""
    if len(b) < 128 or b[-128:-125] != b"TAG":
        raise ValueError("no ID3v1 trailer")
    t = b[-128:]
    title = t[3:33].rstrip(b"\x00").decode("ascii", "ignore")
    artist = t[33:63].rstrip(b"\x00").decode("ascii", "ignore")
    return title, artist, t[127]


# ---------------------------------------------------------------------------
# GIF
# ---------------------------------------------------------------------------

GIF_MAGICS = (b"GIF87a", b"GIF89a")


def make_gif(width: int, height: int, animated: bool = False) -> bytes:
    """Minimal structurally valid GIF: header + logical screen
    descriptor (+ a NETSCAPE2.0 loop extension when animated) +
    trailer."""
    lsd = struct.pack("<HH", width, height) + b"\x00\x00\x00"
    loop = (
        b"\x21\xff\x0bNETSCAPE2.0\x03\x01\x00\x00\x00" if animated else b""
    )
    return b"GIF89a" + lsd + loop + b"\x3b"


def parse_gif(b: bytes) -> tuple[int, int, bool]:
    """(width, height, is_animated) — dimensions from the logical screen
    descriptor (little-endian, unlike the network-order formats above);
    animation detected by the NETSCAPE loop application extension."""
    if b[:6] not in GIF_MAGICS:
        raise ValueError("not a GIF")
    w, h = struct.unpack("<HH", b[6:10])
    return w, h, b"NETSCAPE2.0" in b
