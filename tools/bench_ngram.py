#!/usr/bin/env python3
"""Counting join vs prefix-filtered AllPairs on a boilerplate-heavy corpus.

The counting join's cost is sum over shingles of df^2; a boilerplate
sentence shared by a large fraction of documents (cookie banners, footers)
makes one shingle's df ~ N and the join quadratic. The prefix filter joins
only on each doc's RARE shingles, so boilerplate never generates pairs.
Run: python tools/bench_ngram.py [n_docs] — numbers quoted in BENCH.md.
"""

from __future__ import annotations

import random
import sys
import time

sys.path.insert(0, ".")


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 4000
    from pyspark.sql import functions as F  # noqa: F401

    from codebased_spark.dedup.ngram import (
        ngram_jaccard_pairs,
        ngram_jaccard_pairs_prefix,
    )
    from codebased_spark.session import get_spark

    spark = get_spark("bench-ngram", master="local[16]", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    rng = random.Random(11)
    vocab = [f"w{i}" for i in range(5000)]
    boiler = "this site uses cookies accept all cookies to continue reading the article"
    rows = []
    for i in range(n_docs):
        body = " ".join(rng.choice(vocab) for _ in range(40))
        rows.append((i, f"{boiler} {body} {boiler}"))
    docs = spark.createDataFrame(rows, ["doc_id", "text"]).cache()
    docs.count()

    for name, fn in [
        ("prefix", ngram_jaccard_pairs_prefix),
        ("counting", ngram_jaccard_pairs),
        ("prefix", ngram_jaccard_pairs_prefix),
        ("counting", ngram_jaccard_pairs),
    ]:
        t0 = time.perf_counter()
        n = fn(docs, n=3, threshold=0.6).count()
        print(f"{name}: {time.perf_counter() - t0:.2f}s ({n} pairs)")
    spark.stop()


if __name__ == "__main__":
    main()
