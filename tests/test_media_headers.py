"""Real media header codecs: build -> sniff -> parse round trips, and the
end-to-end real-decode mapInPandas path over constructed container bytes."""

from __future__ import annotations

import pytest

from codebased_spark.media.headers import (
    make_jpeg,
    make_mp4,
    make_png,
    make_wav,
    parse_jpeg,
    parse_mp4,
    parse_png,
    parse_wav,
    sniff_media_format,
)


@pytest.mark.parametrize("w,h", [(1, 1), (640, 480), (4096, 1)])
def test_png_roundtrip(w, h):
    b = make_png(w, h)
    assert sniff_media_format(b) == "png"
    assert parse_png(b) == (w, h)


@pytest.mark.parametrize("w,h", [(1, 1), (1920, 1080)])
def test_jpeg_roundtrip(w, h):
    b = make_jpeg(w, h)
    assert sniff_media_format(b) == "jpeg"
    assert parse_jpeg(b) == (w, h)


@pytest.mark.parametrize("rate,dur", [(8000, 1), (8000, 4999), (16000, 2500)])
def test_wav_roundtrip(rate, dur):
    b = make_wav(rate, dur)
    assert sniff_media_format(b) == "wav"
    assert parse_wav(b) == (rate, dur)


@pytest.mark.parametrize("w,h,dur", [(0, 0, 1), (1280, 720, 599999)])
def test_mp4_roundtrip(w, h, dur):
    b = make_mp4(w, h, dur)
    assert sniff_media_format(b) == "mp4"
    assert parse_mp4(b) == (w, h, dur)


def test_sniff_rejects_garbage():
    assert sniff_media_format(b"") is None
    assert sniff_media_format(b"hello world " * 4) is None
    with pytest.raises(ValueError):
        parse_png(b"nope")
    with pytest.raises(ValueError):
        parse_wav(b"RIFFxxxxNOPE")


def test_real_decode_end_to_end(spark):
    """mapInPandas builds real PNG/WAV/MP4 bytes and the REAL decoders
    recover the planted metadata exactly."""
    from codebased_spark.media.decode import media_metadata, synthetic_real_media

    docs = spark.range(30).withColumnRenamed("id", "doc_id")
    out = media_metadata(synthetic_real_media(docs), real=True).toPandas()
    assert len(out) == 30
    for r in out.itertuples():
        did = r.doc_id
        if did % 3 == 0:
            assert r.media_type == "image"
            assert (r.width, r.height) == (1 + did % 640, 1 + (did // 3) % 480)
            assert r.duration_ms == 0
        elif did % 3 == 1:
            assert r.media_type == "audio"
            assert (r.width, r.height) == (0, 0)
            assert r.duration_ms == 1 + did % 5000
        else:
            assert r.media_type == "video"
            assert (r.width, r.height) == (1 + did % 640, 1 + (did // 3) % 480)
            assert r.duration_ms == 1 + did % 600000
