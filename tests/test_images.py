"""LAION-style image-alt pair mining (extract/images.py)."""

from __future__ import annotations

from codebased_spark.extract.images import image_alt_pairs


def test_pairs_resolution_quality_and_markup_tolerance(spark):
    html = (
        "<html><head><base href='/assets/'></head><body>"
        '<img src="pics/1.png" alt="a mountain lake at dawn">'
        "<IMG ALT='city skyline at night' CLASS='y' SRC='/top.jpg'>"
        '<img src="https://cdn.example.net/2.jpg" alt="red bicycle photo">'
        '<img src="/spacer.gif" alt="">'
        '<img src="short.png" alt="tiny">'
        '<img alt="no source here at all">'
        "<img src='javascript:bad()' alt='evil scheme image'>"
        "</body></html>"
    ).encode()
    pages = spark.createDataFrame(
        [("https://s.org/en/doc/1", html)], ["url", "html"]
    )
    got = {
        (r.image_url, r.alt) for r in image_alt_pairs(pages).collect()
    }
    assert got == {
        # relative src resolves against the <base href>
        ("https://s.org/assets/pics/1.png", "a mountain lake at dawn"),
        # uppercase tag, alt before src, root-relative
        ("https://s.org/top.jpg", "city skyline at night"),
        ("https://cdn.example.net/2.jpg", "red bicycle photo"),
        # alt="" (decorative), alt too short, missing src, and non-http
        # scheme are all dropped
    }


def test_media_src_pairs_type_resolution(spark):
    from codebased_spark.extract.images import media_src_pairs

    html = (
        "<html><body>"
        '<video src="/v/a.mp4" type="video/mp4"></video>'
        "<AUDIO SRC='snd/b.wav'></AUDIO>"          # inferred from extension
        '<source src="c.webm">'                     # inferred video/webm
        '<source src="/d.bin">'                     # unknown -> ""
        '<video controls></video>'                  # srcless: dropped
        "</body></html>"
    ).encode()
    pages = spark.createDataFrame(
        [("https://s.org/en/doc/1", html)], ["url", "html"]
    )
    got = {
        (r.media_url, r.media_type)
        for r in media_src_pairs(pages).collect()
    }
    assert got == {
        ("https://s.org/v/a.mp4", "video/mp4"),
        ("https://s.org/en/doc/snd/b.wav", "audio/wav"),
        ("https://s.org/en/doc/c.webm", "video/webm"),
        ("https://s.org/d.bin", ""),
    }
