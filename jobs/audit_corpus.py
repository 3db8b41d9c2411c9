#!/usr/bin/env python
"""spark-submit entry point for the corpus-audit report — the read-only
companion of curate_corpus.py (which FILTERS) and maintain_table.py
(which REWRITES): score every document on the release-gating dimensions
and roll the corpus up into one auditable JSON line plus a per-doc table.

Dimensions (all existing registered operators, composed over the same
documents directory so every number is oracle-gated elsewhere):

    quality       length/punct/stopword ratios      (textops/quality.py)
    language      token-vote langid vs declared     (textops/langid.py)
    repetition    Gopher n-gram repetition          (textops/repetition.py)
    readability   Flesch-Kincaid x100 integers      (dataops.tx_readability)
    exact dup     sha2 survivor groups              (dedup/exact.py)
    split leakage cross-split content hashes        (dataops.tx_split_leakage)

Output under --out:
    audit/        one row per doc: all dimension columns joined
    report line   one JSON line on stdout (corpus roll-up)

Usage:
    spark-submit --py-files codebased_spark.zip jobs/audit_corpus.py \\
        --docs /path/dir_with_documents.parquet --out /tmp/audit
"""

from __future__ import annotations

import argparse
import json
import os
import sys


def main(argv: list[str] | None = None) -> None:
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--docs", required=True,
                    help="directory containing documents.parquet")
    ap.add_argument("--out", required=True)
    ap.add_argument("--cpus", type=int, default=8)
    args = ap.parse_args(argv)

    from pyspark.sql import functions as F

    from codebased_spark.dataops import (
        tx_lang_id,
        tx_quality,
        tx_readability,
        tx_repetition,
        tx_split_leakage,
    )
    from codebased_spark.dedup.exact import exact_dedup
    from codebased_spark.session import get_spark

    spark = get_spark("audit-corpus", master=f"local[{args.cpus}]",
                      shuffle_partitions=args.cpus)
    spark.sparkContext.setLogLevel("ERROR")
    sf = args.docs

    docs = spark.read.parquet(f"{sf}/documents.parquet")
    n_docs = docs.count()

    quality = tx_quality(spark, sf)
    langid = tx_lang_id(spark, sf).select(
        "doc_id", F.col("pred_lang").alias("pred_lang")
    )
    rep = tx_repetition(spark, sf)
    read = tx_readability(spark, sf).select("doc_id", "fk_x100")
    survivors = exact_dedup(docs).select(
        "doc_id", F.lit(1).alias("is_dup_survivor"), "group_size"
    )

    audit = (
        docs.select("doc_id", "lang", "source")
        .join(quality.drop("lang", "source"), "doc_id", "left")
        .join(langid, "doc_id", "left")
        .join(rep.drop("lang", "source"), "doc_id", "left")
        .join(read, "doc_id", "left")
        .join(survivors, "doc_id", "left")
        .withColumn(
            "is_dup_survivor", F.coalesce("is_dup_survivor", F.lit(0))
        )
        .withColumn("lang_mismatch",
                    (F.col("pred_lang") != F.col("lang")).cast("int"))
    )
    audit.write.mode("overwrite").parquet(os.path.join(args.out, "audit"))

    leaked = tx_split_leakage(spark, sf).count()
    roll = audit.agg(
        F.sum("lang_mismatch").alias("n_lang_mismatch"),
        F.sum(F.lit(1) - F.col("is_dup_survivor")).alias("n_exact_dups"),
        F.min("fk_x100").alias("fk_min"),
        F.max("fk_x100").alias("fk_max"),
    ).collect()[0]

    report = {
        "n_docs": n_docs,
        "n_lang_mismatch": int(roll.n_lang_mismatch or 0),
        "n_exact_dups": int(roll.n_exact_dups or 0),
        "n_leaked_hashes": leaked,
        "fk_min": int(roll.fk_min), "fk_max": int(roll.fk_max),
    }
    print(json.dumps(report))


if __name__ == "__main__":
    main()
