"""Article dating cascade (extract/dates.py)."""

from __future__ import annotations

import datetime

from codebased_spark.extract.dates import article_dates


def _pages(spark, rows):
    return spark.createDataFrame(
        [(u, h.encode()) for u, h in rows], ["url", "html"]
    )


def test_cascade_priority_and_garbage_tolerance(spark):
    pages = _pages(spark, [
        # time beats og
        ("u1", '<time datetime="2025-02-03">x</time>'
               '<meta property="article:published_time" content="2025-03-03"/>'),
        # og only, adversarial content-before-property uppercase
        ("u2", "<META CONTENT='2025-03-04T10:30:00' "
               "PROPERTY='article:published_time'/>"),
        # unparseable time falls through to og
        ("u3", '<time datetime="not a date">x</time>'
               '<meta property="article:published_time" content="2025-03-05"/>'),
        # nothing declared
        ("u4", "<p>plain</p>"),
    ])
    got = {
        r.url: (r.published_at, r.date_source)
        for r in article_dates(pages).collect()
    }
    assert got["u1"] == (datetime.datetime(2025, 2, 3), "time")
    assert got["u2"] == (datetime.datetime(2025, 3, 4, 10, 30), "og")
    assert got["u3"] == (datetime.datetime(2025, 3, 5), "og")
    assert got["u4"] == (None, "none")
