"""WARC connector: write -> read round trip (plain + per-record gzip),
record-type/status filtering, damage tolerance, and crawl -> KG flow."""

from __future__ import annotations

import pytest

from codebased_spark.sources.warc import (
    iter_warc_records,
    read_warc,
    warc_to_pages,
    write_warc,
)

HTML_A = b"<html><head></head><body><p>Acme Corporation acquired Globex Systems.</p></body></html>"
HTML_B = b"<html><body><p>plain page</p></body></html>"

RECORDS = [
    {"url": "https://a.example.org/1", "date": "2025-01-01T00:00:00Z", "body": HTML_A},
    {"url": "https://a.example.org/req", "date": "2025-01-01T00:00:01Z",
     "body": b"GET / HTTP/1.1", "type": "request"},          # skipped: not response
    {"url": "https://a.example.org/404", "date": "2025-01-01T00:00:02Z",
     "body": b"gone", "status": 404},                         # skipped: non-2xx
    {"url": "https://b.example.org/2", "date": "2025-01-01T00:00:03Z", "body": HTML_B},
]


@pytest.mark.parametrize("gz", [False, True])
def test_warc_roundtrip(spark, tmp_path, gz):
    p = str(tmp_path / ("a.warc.gz" if gz else "a.warc"))
    write_warc(p, RECORDS, gzip_records=gz)
    got = read_warc(spark, p).toPandas().sort_values("url").reset_index(drop=True)
    assert list(got.url) == ["https://a.example.org/1", "https://b.example.org/2"]
    assert bytes(got.html[0]) == HTML_A and bytes(got.html[1]) == HTML_B
    assert list(got.http_status) == [200, 200]
    assert str(got.warc_ts[0]) == "2025-01-01 00:00:00"


def test_warc_damage_tolerance(tmp_path):
    p = tmp_path / "dmg.warc"
    write_warc(str(p), RECORDS[:1])
    raw = p.read_bytes()
    damaged = b"garbage bytes\r\n\r\n" + raw + b"WARC/1.0\r\nbroken"
    recs = list(iter_warc_records(damaged))
    assert len(recs) == 1  # the valid record survives, damage skipped


def test_warc_gz_truncated_member_drops_tail(tmp_path):
    """ADVICE r2: a corrupt/truncated gzip member must degrade to 'records
    decompressed so far', not raise zlib.error and fail the task."""
    p = tmp_path / "t.warc.gz"
    write_warc(str(p), RECORDS, gzip_records=True)
    raw = p.read_bytes()
    # locate the second member's gzip magic and truncate mid-member
    second = raw.find(b"\x1f\x8b", 2)
    assert second > 0
    truncated = raw[: second + 10]
    recs = list(iter_warc_records(truncated))
    assert len(recs) == 1  # first member's record survives
    corrupted = raw[:second] + b"\x1f\x8b" + b"\x00" * 30
    recs2 = list(iter_warc_records(corrupted))
    assert len(recs2) == 1


def test_warc_to_kg_pipeline(spark, tmp_path):
    """Crawl archive straight into the KG pipeline."""
    import pandas as pd

    from codebased_spark.graph.pipeline import extract_triples

    p = str(tmp_path / "crawl.warc.gz")
    write_warc(p, RECORDS, gzip_records=True)
    pages = warc_to_pages(read_warc(spark, p))
    gaz = spark.createDataFrame(
        pd.DataFrame(
            {
                "surface_form": ["Acme Corporation", "Globex Systems"],
                "canonical_id": ["ent:a", "ent:g"],
                "entity_type": ["Org", "Org"],
                "weight": [1.0, 1.0],
            }
        )
    )
    res = extract_triples(spark, pages, gaz)
    triples = {(r.subj, r.pred, r.obj) for r in res.triples.collect()}
    assert ("ent:a", "ACQUIRED", "ent:g") in triples
    assert ("page:https://a.example.org/1", "MENTIONS", "ent:a") in triples
