"""Audio fingerprinting over real PCM samples: zero-crossing-rate dedup.

The audio twin of media/phash.py: a multimodal training pipeline dedups
audio clips by a compact signal fingerprint, not by byte hash (the same
tone re-encoded at a different gain or with trailing silence hashes
differently but fingerprints identically is the production motivation;
here the fingerprint is the classic zero-crossing count + peak pair —
the cheapest time-domain features, Rabiner & Schafer 1978, public).

100-TB shape: identical to exact dedup — a map-only Arrow stage decodes
samples and reduces each clip to a tiny fingerprint tuple, then ONE
narrow shuffle on the fingerprint clusters the corpus; samples never
shuffle. The planted square waves (synthetic_tone_media) make every
fingerprint pure doc_id arithmetic so the DuckDB oracle states clusters
declaratively while Spark must really build, parse (media/headers.py),
and scan the PCM bytes.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

N_SAMPLES = 240


def synthetic_tone_media(docs: DataFrame) -> DataFrame:
    """(doc_id, payload) with REAL 16-bit PCM WAV bytes: a square wave of
    half-period p = 1 + doc_id % 8 samples and amplitude
    A = 100 * (1 + doc_id % 5), N_SAMPLES samples long. Zero crossings =
    (N_SAMPLES-1) // p and peak = A are pure doc_id arithmetic, so docs
    sharing (doc_id % 8, doc_id % 5) — i.e. doc_id mod 40 — are planted
    duplicate tones."""
    from codebased_spark.media.headers import make_wav_pcm

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for did in pdf["doc_id"]:
                did = int(did)
                p = 1 + did % 8
                amp = 100 * (1 + did % 5)
                samples = [
                    amp if (i // p) % 2 == 0 else -amp for i in range(N_SAMPLES)
                ]
                rows.append((did, make_wav_pcm(samples)))
            yield pd.DataFrame(rows, columns=["doc_id", "payload"])

    return docs.select("doc_id").mapInPandas(
        build, schema="doc_id long, payload binary"
    )


def zero_crossing_fingerprint(payload: bytes) -> tuple[int, int]:
    """(zero_crossings, peak) of one WAV-PCM blob: sign changes between
    consecutive samples (zero counts as positive) and max |sample|."""
    from codebased_spark.media.headers import parse_wav_samples, sniff_media_format

    if sniff_media_format(payload) != "wav":  # pragma: no cover
        raise NotImplementedError("fingerprinting beyond WAV-PCM needs soundfile")
    samples = parse_wav_samples(payload)
    zc = sum(
        1
        for a, b in zip(samples, samples[1:])
        if (a >= 0) != (b >= 0)
    )
    peak = max((abs(s) for s in samples), default=0)
    return zc, peak


def audio_fingerprint_clusters(media: DataFrame) -> DataFrame:
    """Decode + fingerprint every clip, cluster identical fingerprints:
    (doc_id, zero_crossings, peak, cluster_id, cluster_size, is_survivor).
    One Arrow map stage + one narrow shuffle on the fingerprint."""

    def fp_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            fps = [zero_crossing_fingerprint(bytes(p)) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "zero_crossings": [z for z, _ in fps],
                    "peak": [pk for _, pk in fps],
                }
            )

    fp = media.mapInPandas(
        fp_batches, schema="doc_id long, zero_crossings long, peak long"
    )
    w = Window.partitionBy("zero_crossings", "peak")
    return (
        fp.withColumn("cluster_id", F.min("doc_id").over(w))
        .withColumn("cluster_size", F.count(F.lit(1)).over(w))
        .withColumn(
            "is_survivor", (F.col("doc_id") == F.col("cluster_id")).cast("int")
        )
        .select(
            "doc_id", "zero_crossings", "peak",
            "cluster_id", "cluster_size", "is_survivor",
        )
    )
