"""WARC source: Common-Crawl-style crawl archives -> the pages table.

The pipeline's canonical input is an Iceberg/parquet pages table, but the
upstream artifact a crawl actually produces is WARC (ISO 28500): a
concatenation of records, each a small header block plus a raw HTTP
exchange, usually gzip-compressed per record so the file is splittable at
record boundaries. This module is the ingestion connector:

- `read_warc(spark, path)`: binaryFile scan -> one Arrow-batched
  mapInPandas parse per file -> rows (url, warc_ts, http_status, html).
  Only `response` records with a 2xx status become pages; request/
  metadata/revisit records are skipped (the reference's file-type routing,
  S4/S5, applied to record types). Malformed records are dropped, not
  fatal — crawl archives always contain damage.
- `warc_to_pages(df, lang)`: project onto the pages schema
  (url, warc_ts, html, text, lang) feeding extract_triples (which
  computes `text` itself).
- `write_warc(path, records, gzip_records)`: a spec-correct writer used
  by tests and fixtures — round-trips through the reader byte-identically.

Scale note: binaryFile holds one whole WARC file (~1 GB by convention) per
task — the standard Spark approach without a custom InputFormat. Per-record
gzip members mean a production deployment can split INSIDE files with a
custom data source; the per-file parallelism here (100k+ files for a real
crawl) is already far wider than any cluster.
"""

from __future__ import annotations

import gzip
import io
import zlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

PAGES_SCHEMA = "url string, warc_ts timestamp, http_status int, html binary"


def _gunzip_members(data: bytes) -> bytes:
    """Decompress concatenated gzip members (per-record gzip WARC).

    A truncated or corrupt member degrades to "keep what decompressed so
    far" instead of raising — real crawl archives always contain damage,
    and one bad tail must not fail the task (the module contract is
    malformed records are DROPPED, not fatal)."""
    out = []
    pos = 0
    while pos < len(data):
        d = zlib.decompressobj(wbits=31)
        try:
            out.append(d.decompress(data[pos:]))
        except zlib.error:
            break
        consumed = len(data) - pos - len(d.unused_data)
        if consumed <= 0:
            break
        pos += consumed
    return b"".join(out)


def iter_warc_records(data: bytes) -> Iterator[tuple[dict, bytes]]:
    """Yield (warc_headers, block) per record; skips damaged regions."""
    if data[:2] == b"\x1f\x8b":
        data = _gunzip_members(data)
    pos = 0
    n = len(data)
    while pos < n:
        start = data.find(b"WARC/", pos)
        if start < 0:
            return
        head_end = data.find(b"\r\n\r\n", start)
        if head_end < 0:
            return
        headers: dict[str, str] = {}
        for line in data[start:head_end].split(b"\r\n")[1:]:
            k, _, v = line.partition(b":")
            if _:
                headers[k.strip().decode("ascii", "ignore").lower()] = (
                    v.strip().decode("utf-8", "ignore")
                )
        try:
            length = int(headers.get("content-length", ""))
        except ValueError:
            pos = head_end + 4
            continue
        block_start = head_end + 4
        yield headers, data[block_start : block_start + length]
        pos = block_start + length


def _http_body(block: bytes) -> tuple[int, bytes]:
    """(status, body) from a raw HTTP response block."""
    sep = block.find(b"\r\n\r\n")
    if sep < 0 or not block.startswith(b"HTTP/"):
        return 0, b""
    try:
        status = int(block.split(b" ", 2)[1])
    except (IndexError, ValueError):
        return 0, b""
    return status, block[sep + 4 :]


def _parse_file(content: bytes) -> list[tuple]:
    rows = []
    for headers, block in iter_warc_records(content):
        if headers.get("warc-type") != "response":
            continue
        url = headers.get("warc-target-uri")
        ts = headers.get("warc-date")
        if not url or not ts:
            continue
        status, body = _http_body(block)
        if 200 <= status < 300:
            t = pd.Timestamp(ts)
            if t.tz is not None:
                t = t.tz_convert("UTC").tz_localize(None)
            rows.append((url, t, status, body))
    return rows


def read_warc(spark: SparkSession, path: str) -> DataFrame:
    """DataFrame(url, warc_ts, http_status, html) from *.warc / *.warc.gz."""
    files = spark.read.format("binaryFile").load(path).select("content")

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: list[tuple] = []
            for content in pdf["content"]:
                rows.extend(_parse_file(bytes(content)))
            yield pd.DataFrame(
                rows, columns=["url", "warc_ts", "http_status", "html"]
            )

    return files.mapInPandas(parse, schema=PAGES_SCHEMA)


def warc_to_pages(warc_df: DataFrame, lang: str = "en") -> DataFrame:
    """Project onto the pipeline's pages shape (text computed downstream
    by extract_triples; lang from the caller or a lang-id pass)."""
    return warc_df.select(
        "url",
        "warc_ts",
        "html",
        F.lit(None).cast("string").alias("text"),
        F.lit(lang).alias("lang"),
    )


def write_warc(path: str, records: list[dict], gzip_records: bool = False) -> None:
    """Spec-correct WARC writer (tests/fixtures). Each record dict:
    {url, date (ISO-8601 Z), body (bytes), type?, status?}."""
    out = io.BytesIO()
    for r in records:
        body = r["body"]
        status = r.get("status", 200)
        http = (
            f"HTTP/1.1 {status} OK\r\nContent-Type: text/html\r\n"
            f"Content-Length: {len(body)}\r\n\r\n"
        ).encode() + body
        head = (
            "WARC/1.0\r\n"
            f"WARC-Type: {r.get('type', 'response')}\r\n"
            f"WARC-Target-URI: {r['url']}\r\n"
            f"WARC-Date: {r['date']}\r\n"
            "Content-Type: application/http;msgtype=response\r\n"
            f"Content-Length: {len(http)}\r\n\r\n"
        ).encode()
        rec = head + http + b"\r\n\r\n"
        out.write(gzip.compress(rec) if gzip_records else rec)
    with open(path, "wb") as f:
        f.write(out.getvalue())
