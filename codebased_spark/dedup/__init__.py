"""Deduplication operators for large-scale training-data pipelines.

Five families, all over the `documents` table shape (doc_id, text, ...):

- exact:      content-hash groupBy (sha2) — byte-identical duplicates
- ngram:      exact n-gram Jaccard similarity join (prefix-filtered AllPairs)
- minhash:    MinHash signatures + banded LSH candidate generation
- simhash:    64-bit SimHash + banded candidate generation
- embedding:  cosine near-duplicates over an embedding column
- clusters:   pairs + connected components -> keep-one survivor table

Design rule: candidate generation may be approximate (LSH/SimHash bands),
but every emitted pair is VERIFIED with the exact similarity measure, so the
outputs are exact-equal to a brute-force oracle as long as the candidate
stage has recall 1.0 at the chosen threshold (see module docstrings for the
collision-probability margins backing that).
"""

from codebased_spark.dedup.clusters import dedup_clusters, surviving_docs  # noqa: F401
from codebased_spark.dedup.shingles import shingles_col, tokens_col  # noqa: F401
