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


def test_bmp_roundtrip_row_order_and_padding():
    """Pixel decode must honor BMP's bottom-up row storage and 4-byte row
    padding — a y-VARYING pattern catches both (the oracle's stripe
    pattern is y-invariant and cannot)."""
    from codebased_spark.media.headers import make_bmp, parse_bmp

    w, h = 3, 4  # 3*3=9-byte rows -> 3 pad bytes each
    gray = bytes((10 * y + x) for y in range(h) for x in range(w))
    ww, hh, back = parse_bmp(make_bmp(gray, w, h))
    assert (ww, hh) == (w, h)
    assert back == gray


def test_ppm_roundtrip_and_comment_header():
    from codebased_spark.media.headers import make_ppm, parse_ppm

    w, h = 5, 2
    gray = bytes((7 * y + x) for y in range(h) for x in range(w))
    ww, hh, back = parse_ppm(make_ppm(gray, w, h))
    assert (ww, hh, back) == (w, h, gray)
    # spec allows '#' comments inside the header
    commented = b"P6\n# a comment\n5 2\n255\n" + bytes(
        v for g in gray for v in (g, g, g)
    )
    assert parse_ppm(commented) == (w, h, gray)


def test_wav_pcm_sample_roundtrip():
    from codebased_spark.media.headers import make_wav_pcm, parse_wav_samples

    samples = [0, 100, -100, 32767, -32768, 5]
    assert parse_wav_samples(make_wav_pcm(samples)) == samples


def test_sample_stats_end_to_end(spark):
    """mapInPandas builds real BMP/PPM/WAV bytes and the REAL pixel/sample
    decoders recover the planted aggregates exactly."""
    from codebased_spark.media.decode import media_sample_stats, synthetic_sample_media

    docs = spark.range(30).withColumnRenamed("id", "doc_id")
    out = media_sample_stats(synthetic_sample_media(docs)).toPandas()
    assert len(out) == 30
    for r in out.itertuples():
        did = r.doc_id
        if did % 3 == 2:
            n, amp = 1 + did % 2000, 1 + did % 30000
            assert r.media_type == "wav"
            assert (r.width, r.height) == (0, 0)
            assert (r.n_samples, r.sample_sum, r.sample_peak) == (n, amp * n, amp)
        else:
            w, h = 2 + did % 64, 1 + did % 48
            assert r.media_type == ("bmp" if did % 3 == 0 else "ppm")
            assert (r.width, r.height) == (w, h)
            assert (r.n_samples, r.sample_sum, r.sample_peak) == (
                w * h, 255 * h * (w // 2), 255
            )


def test_gif_roundtrip_and_sniff():
    from codebased_spark.media.headers import (
        make_gif,
        parse_gif,
        sniff_media_format,
    )

    b = make_gif(320, 200)
    assert sniff_media_format(b) == "gif"
    assert parse_gif(b) == (320, 200, False)
    assert parse_gif(make_gif(16, 16, animated=True)) == (16, 16, True)
    import pytest

    with pytest.raises(ValueError):
        parse_gif(b"NOTAGIF")
