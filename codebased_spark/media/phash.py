"""Perceptual-hash image near-duplicate detection (aHash over real pixels).

The multimodal twin of MinHash dedup: a training-data pipeline that keeps
one copy of each logo / thumbnail / re-encoded image computes a perceptual
hash per image and clusters on it. The 100-TB shape is exactly exact-dedup's
— a 64-bit key per item, one narrow (hash, min_id, count) shuffle — so the
expensive part (pixel decode + downsample) is a map-only Arrow stage and
the shuffle never carries pixels.

Hash = average hash (aHash): decode to grayscale, average-pool to an 8x8
grid, threshold each cell against the global mean, pack 64 bits row-major
(row 0 = most significant byte), hex-encode. Near-duplicates that differ
by noise below the pooling resolution collide; the planted fixture
(synthetic_phash_media) makes every collision a pure doc_id-arithmetic
fact the DuckDB oracle states declaratively, while the Spark side must
really build BMP bytes, really parse them back (media/headers.py), and
really pool/threshold/pack the pixels — any defect anywhere in that chain
changes a hash and breaks the value gate.

Reference analog: the keep-one content-hash dedup before insert
(extractor.py:702-710, base.py:193-209), extended to the image modality
per the LLM-pipeline mandate — the hash is perceptual instead of exact.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def synthetic_phash_media(docs: DataFrame) -> DataFrame:
    """(doc_id, payload) with REAL 16x16 BMP bytes whose 8x8 aHash is pure
    doc_id arithmetic: row-stripe pattern from byte
    B = ((doc_id // 4) % 64) * 4 | 1 — the 6-bit group key lives in bits
    2..7, bit 0 is forced set and bit 1 forced clear so the image is never
    uniform and the mean threshold is well-defined. Rows 2r and 2r+1 are
    all-255 when bit r of B is set, else all-0 — average-pooling 2x2
    recovers exactly the bit pattern, so docs sharing doc_id // 4 (mod 64)
    are planted near-dup groups of 4 consecutive ids at small N."""
    from codebased_spark.media.headers import make_bmp

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for did in pdf["doc_id"]:
                did = int(did)
                b = ((did // 4) % 64) * 4 | 1
                gray = bytes(
                    255 if (b >> (y // 2)) & 1 else 0
                    for y in range(16)
                    for _x in range(16)
                )
                rows.append((did, make_bmp(gray, 16, 16)))
            yield pd.DataFrame(rows, columns=["doc_id", "payload"])

    return docs.select("doc_id").mapInPandas(
        build, schema="doc_id long, payload binary"
    )


def average_hash_hex(payload: bytes) -> str:
    """aHash of one BMP/PPM blob: parse -> grayscale -> average-pool to
    8x8 -> threshold at the global mean -> 64 bits hex (row-major, bit
    63 = cell (0,0))."""
    from codebased_spark.media.headers import parse_bmp, parse_ppm, sniff_media_format

    fmt = sniff_media_format(payload)
    if fmt == "bmp":
        w, h, gray = parse_bmp(payload)
    elif fmt == "ppm":
        w, h, gray = parse_ppm(payload)
    else:  # pragma: no cover - compressed containers need PIL
        raise NotImplementedError(f"pixel decode of {fmt!r} needs PIL")
    if w < 8 or h < 8:
        raise ValueError("aHash needs at least 8x8 pixels")
    # average-pool to 8x8 (integer cell boundaries, numpy-free stdlib)
    cells = []
    for r in range(8):
        y0, y1 = r * h // 8, (r + 1) * h // 8
        for c in range(8):
            x0, x1 = c * w // 8, (c + 1) * w // 8
            s = sum(
                gray[y * w + x] for y in range(y0, y1) for x in range(x0, x1)
            )
            cells.append(s / ((y1 - y0) * (x1 - x0)))
    mean = sum(cells) / 64.0
    bits = 0
    for i, v in enumerate(cells):
        if v > mean:
            bits |= 1 << (63 - i)
    return f"{bits:016x}"


def phash_clusters(media: DataFrame) -> DataFrame:
    """Decode every payload, aHash it, and cluster identical hashes:
    (doc_id, phash, cluster_id=min doc_id, cluster_size, is_survivor).

    Plan shape: one Arrow mapInPandas stage carries the bytes (map-only),
    then a single narrow shuffle on the 16-char hash — pixels never
    shuffle. At 10^12 images this is the same plan as exact text dedup."""

    def hash_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "phash": [average_hash_hex(bytes(p)) for p in pdf["payload"]],
                }
            )

    hashed = media.mapInPandas(hash_batches, schema="doc_id long, phash string")
    w = Window.partitionBy("phash")
    return (
        hashed.withColumn("cluster_id", F.min("doc_id").over(w))
        .withColumn("cluster_size", F.count(F.lit(1)).over(w))
        .withColumn(
            "is_survivor",
            (F.col("doc_id") == F.col("cluster_id")).cast("int"),
        )
        .select("doc_id", "phash", "cluster_id", "cluster_size", "is_survivor")
    )
