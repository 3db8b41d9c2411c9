"""Multimodal columns: opaque binary payloads + typed metadata.

Pattern (the part that must be right at 100 TB): media lives as a
`binary` column beside typed metadata; decode / feature-extract runs as an
Arrow-batched `mapInPandas` stage so bytes cross the JVM<->Python boundary
once per batch, never per row; downstream everything is columnar again.

`real=True` runs REAL header-level decoding (media/headers.py: pure-stdlib
PNG/JPEG/WAV/MP4 parsers — dimensions, duration, format sniffing), which
covers the metadata a training-data pipeline filters on.

SAMPLE-level decode (media_sample_stats) is real for the uncompressed
containers — BMP/PPM pixel values, WAV-PCM sample values — computing the
per-item aggregates (count/sum/peak) an image- or audio-quality filter
runs on. Pixel/sample decode of COMPRESSED containers (JPEG scan data,
MP4 tracks, non-PCM audio) needs PIL/soundfile/ffmpeg, out of scope in
this container, and raises NotImplementedError; the default deterministic
fake (metadata from md5(payload)) remains for oracle-reproducible
plumbing tests.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("media_type", StringType()),
        StructField("n_bytes", LongType()),
        StructField("payload_md5", StringType()),
        StructField("width", LongType()),
        StructField("height", LongType()),
        StructField("duration_ms", LongType()),
    ]
)

_MEDIA_TYPES = ["image", "audio", "video"]


def media_from_documents(docs: DataFrame) -> DataFrame:
    """Derive a deterministic media table from the documents fixture:
    (doc_id, media_type, payload binary). Payload = utf-8 text bytes —
    an opaque blob as far as the decode stage is concerned."""
    return docs.select(
        "doc_id",
        F.element_at(
            F.array(*[F.lit(t) for t in _MEDIA_TYPES]),
            (F.col("doc_id") % 3 + 1).cast("int"),
        ).alias("media_type"),
        F.encode("text", "UTF-8").alias("payload"),
    )


def synthetic_real_media(docs: DataFrame) -> DataFrame:
    """(doc_id, media_type, payload) with REAL container bytes: valid PNG /
    WAV / MP4 files built deterministically from doc_id (media/headers.py
    builders). The planted dimensions/durations are pure doc_id arithmetic,
    so an oracle can state the expected parse declaratively while the
    Spark side must actually construct and then parse real bytes."""
    from codebased_spark.media.headers import make_mp4, make_png, make_wav

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for did in pdf["doc_id"]:
                did = int(did)
                w, h = 1 + did % 640, 1 + (did // 3) % 480
                if did % 3 == 0:
                    rows.append((did, "image", make_png(w, h)))
                elif did % 3 == 1:
                    rows.append((did, "audio", make_wav(8000, 1 + did % 5000)))
                else:
                    rows.append((did, "video", make_mp4(w, h, 1 + did % 600000)))
            yield pd.DataFrame(rows, columns=["doc_id", "media_type", "payload"])

    return docs.select("doc_id").mapInPandas(
        build, schema="doc_id long, media_type string, payload binary"
    )


SAMPLE_STATS_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("media_type", StringType()),
        StructField("width", LongType()),
        StructField("height", LongType()),
        StructField("n_samples", LongType()),
        StructField("sample_sum", LongType()),
        StructField("sample_peak", LongType()),
    ]
)


def synthetic_sample_media(docs: DataFrame) -> DataFrame:
    """(doc_id, media_type, payload) with REAL uncompressed container
    bytes: BMP (doc_id%3==0) / PPM (==1) with a vertical 0/255 stripe
    pattern, WAV 16-bit PCM (==2) with an alternating +-A square wave.
    Dimensions, amplitudes and therefore all pixel/sample aggregates are
    pure doc_id arithmetic, so an oracle states the expected stats
    declaratively while the Spark side builds then REALLY decodes the
    bytes."""
    from codebased_spark.media.headers import make_bmp, make_ppm, make_wav_pcm

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for did in pdf["doc_id"]:
                did = int(did)
                if did % 3 == 2:
                    n = 1 + did % 2000
                    amp = 1 + did % 30000
                    samples = [amp if i % 2 == 0 else -amp for i in range(n)]
                    rows.append((did, "wav", make_wav_pcm(samples)))
                else:
                    w, h = 2 + did % 64, 1 + did % 48
                    gray = bytes(
                        255 if x % 2 == 1 else 0
                        for _y in range(h) for x in range(w)
                    )
                    mk = make_bmp if did % 3 == 0 else make_ppm
                    rows.append((did, "bmp" if did % 3 == 0 else "ppm",
                                 mk(gray, w, h)))
            yield pd.DataFrame(rows, columns=["doc_id", "media_type", "payload"])

    return docs.select("doc_id").mapInPandas(
        build, schema="doc_id long, media_type string, payload binary"
    )


def media_sample_stats(media: DataFrame) -> DataFrame:
    """REAL pixel/sample decode of uncompressed containers -> per-item
    aggregates (SAMPLE_STATS_SCHEMA): pixel gray values for BMP/PPM,
    PCM sample values for WAV; sample_sum/sample_peak are over absolute
    values. Same Arrow-batched mapInPandas shape as media_metadata."""
    from codebased_spark.media.headers import (
        parse_bmp,
        parse_ppm,
        parse_wav_samples,
        sniff_media_format,
    )

    def stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for did, mt, pl in zip(
                pdf["doc_id"], pdf["media_type"], pdf["payload"]
            ):
                b = bytes(pl)
                fmt = sniff_media_format(b)
                if fmt == "bmp":
                    w, h, gray = parse_bmp(b)
                    vals = list(gray)
                elif fmt == "ppm":
                    w, h, gray = parse_ppm(b)
                    vals = list(gray)
                elif fmt == "wav":
                    w = h = 0
                    vals = [abs(s) for s in parse_wav_samples(b)]
                else:
                    raise NotImplementedError(
                        f"sample decode of compressed container {fmt!r} "
                        "needs PIL/soundfile/ffmpeg"
                    )
                rows.append(
                    (int(did), mt, w, h, len(vals), sum(vals),
                     max(vals) if vals else 0)
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "media_type", "width", "height",
                    "n_samples", "sample_sum", "sample_peak",
                ],
            )

    return media.mapInPandas(stats, schema=SAMPLE_STATS_SCHEMA)


def _decode_image(payload: bytes, real: bool) -> tuple[int, int, int]:
    if real:
        from codebased_spark.media.headers import (
            parse_jpeg,
            parse_png,
            sniff_media_format,
        )

        fmt = sniff_media_format(payload)
        if fmt == "png":
            w, h = parse_png(payload)
        elif fmt == "jpeg":
            w, h = parse_jpeg(payload)
        else:  # pragma: no cover - pixel decode of other formats
            raise NotImplementedError(f"unsupported image container: {fmt}")
        return w, h, 0
    h = hashlib.md5(payload).hexdigest()
    return 1 + int(h[:4], 16) % 4096, 1 + int(h[4:8], 16) % 4096, 0


def _decode_audio(payload: bytes, real: bool) -> tuple[int, int, int]:
    if real:
        from codebased_spark.media.headers import parse_wav, sniff_media_format

        if sniff_media_format(payload) != "wav":  # pragma: no cover
            raise NotImplementedError("real audio decode beyond WAV needs soundfile/ffmpeg")
        _rate, dur_ms = parse_wav(payload)
        return 0, 0, dur_ms
    h = hashlib.md5(payload).hexdigest()
    return 0, 0, 1 + int(h[8:14], 16) % 600000


def _decode_video(payload: bytes, real: bool) -> tuple[int, int, int]:
    if real:
        from codebased_spark.media.headers import parse_mp4, sniff_media_format

        if sniff_media_format(payload) != "mp4":  # pragma: no cover
            raise NotImplementedError("real video decode beyond MP4 headers needs ffmpeg")
        return parse_mp4(payload)
    h = hashlib.md5(payload).hexdigest()
    return 1 + int(h[:4], 16) % 4096, 1 + int(h[4:8], 16) % 4096, 1 + int(h[8:14], 16) % 600000


_DECODERS = {"image": _decode_image, "audio": _decode_audio, "video": _decode_video}


def media_metadata(media: DataFrame, real: bool = False) -> DataFrame:
    """Decode/probe each payload -> typed metadata rows (MEDIA_SCHEMA).

    mapInPandas: one Arrow batch in, one pandas frame out — the per-blob
    Python work is amortized over ~4k-row batches; at cluster scale this
    stage scales linearly with executors and holds only a batch in memory.
    """

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            metas = [
                _DECODERS[mt](bytes(pl), real)
                for mt, pl in zip(pdf["media_type"], pdf["payload"])
            ]
            w, h, d = zip(*metas) if metas else ((), (), ())
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": [len(bytes(p)) for p in pdf["payload"]],
                    "payload_md5": [
                        hashlib.md5(bytes(p)).hexdigest() for p in pdf["payload"]
                    ],
                    "width": pd.Series(w, dtype="int64"),
                    "height": pd.Series(h, dtype="int64"),
                    "duration_ms": pd.Series(d, dtype="int64"),
                }
            )

    return media.mapInPandas(decode_batches, schema=MEDIA_SCHEMA)


EXIF_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("camera_make", StringType()),
        StructField("orientation", LongType()),
        StructField("byte_order", StringType()),
        StructField("width", LongType()),
        StructField("height", LongType()),
    ]
)


def synthetic_exif_media(docs: DataFrame) -> DataFrame:
    """(doc_id, payload) with REAL JPEG+EXIF bytes: APP1 TIFF block whose
    camera make / orientation / byte order are pure doc_id arithmetic
    (half the corpus II, half MM — the parser must honor both), so an
    oracle states the expected parse declaratively while Spark must build
    and then walk real marker/IFD structures."""
    from codebased_spark.media.headers import make_jpeg_exif

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for did in pdf["doc_id"]:
                did = int(did)
                rows.append(
                    (
                        did,
                        make_jpeg_exif(
                            1 + did % 640,
                            1 + (did // 3) % 480,
                            f"cam{did % 5}",
                            1 + did % 8,
                            big_endian=did % 2 == 1,
                        ),
                    )
                )
            yield pd.DataFrame(rows, columns=["doc_id", "payload"])

    return docs.select("doc_id").mapInPandas(
        build, schema="doc_id long, payload binary"
    )


def exif_metadata(media: DataFrame) -> DataFrame:
    """REAL EXIF decode -> (EXIF_SCHEMA): camera make, orientation, TIFF
    byte order from the APP1 walk plus frame dimensions from the SOF walk
    — the camera metadata an image-curation pipeline groups/filters on
    (and must strip before release: EXIF can carry GPS). Same
    Arrow-batched mapInPandas shape as media_metadata: bytes cross the
    boundary once per ~4k-row batch, downstream is columnar again."""
    from codebased_spark.media.headers import parse_exif, parse_jpeg

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for did, pl in zip(pdf["doc_id"], pdf["payload"]):
                b = bytes(pl)
                make, orient, order = parse_exif(b)
                w, h = parse_jpeg(b)
                rows.append((int(did), make, orient, order, w, h))
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "camera_make", "orientation",
                    "byte_order", "width", "height",
                ],
            )

    return media.mapInPandas(decode, schema=EXIF_SCHEMA)


ID3_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("title", StringType()),
        StructField("artist", StringType()),
        StructField("genre", LongType()),
    ]
)


def synthetic_id3_media(docs: DataFrame) -> DataFrame:
    """(doc_id, payload) with REAL MP3+ID3v1 bytes whose tag fields are
    pure doc_id arithmetic — same planted-derivation contract as
    synthetic_exif_media."""
    from codebased_spark.media.headers import make_mp3_id3v1

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [
                (
                    int(did),
                    make_mp3_id3v1(
                        f"song title {int(did) % 23}",
                        f"artist {int(did) % 11}",
                        int(did) % 80,
                    ),
                )
                for did in pdf["doc_id"]
            ]
            yield pd.DataFrame(rows, columns=["doc_id", "payload"])

    return docs.select("doc_id").mapInPandas(
        build, schema="doc_id long, payload binary"
    )


def id3_metadata(media: DataFrame) -> DataFrame:
    """REAL ID3v1 decode -> (ID3_SCHEMA): title/artist/genre from the
    fixed-layout 128-byte trailer. Arrow-batched mapInPandas like the
    other decode stages."""
    from codebased_spark.media.headers import parse_id3v1

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for did, pl in zip(pdf["doc_id"], pdf["payload"]):
                title, artist, genre = parse_id3v1(bytes(pl))
                rows.append((int(did), title, artist, genre))
            yield pd.DataFrame(
                rows, columns=["doc_id", "title", "artist", "genre"]
            )

    return media.mapInPandas(decode, schema=ID3_SCHEMA)


QUARANTINE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("media_type", StringType()),
        StructField("status", StringType()),
        StructField("error", StringType()),
        StructField("width", LongType()),
        StructField("height", LongType()),
        StructField("duration_ms", LongType()),
    ]
)


def media_metadata_quarantine(media: DataFrame, real: bool = True) -> DataFrame:
    """Fault-TOLERANT decode: like media_metadata(real=True) but a
    malformed payload yields a quarantine row (status='error' + the
    exception class) instead of failing the task. At 10^12 items corrupt
    blobs are a certainty, and one poison payload must never kill an
    hours-long job; the quarantine table is the re-fetch worklist and
    the corruption-rate metric. Same Arrow-batched mapInPandas shape —
    the try/except is per item, the batch still flows."""

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for did, mt, pl in zip(
                pdf["doc_id"], pdf["media_type"], pdf["payload"]
            ):
                try:
                    w, h, d = _DECODERS[mt](bytes(pl), real)
                    rows.append((int(did), mt, "ok", "", w, h, d))
                except Exception as e:  # noqa: BLE001 — quarantine ANY decode fault
                    rows.append(
                        (int(did), mt, "error", type(e).__name__, 0, 0, 0)
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "media_type", "status", "error",
                    "width", "height", "duration_ms",
                ],
            )

    return media.mapInPandas(decode, schema=QUARANTINE_SCHEMA)
