"""Similarity search over embedding columns (ANN)."""

from codebased_spark.similarity.ann import ann_bruteforce_topk, ann_ivf_topk  # noqa: F401
