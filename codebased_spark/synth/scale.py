"""Spark-native synthetic corpus generator for scale benchmarks.

gen_pages() (pages.py) builds the golden-triple fixture in pandas on the
driver — right for correctness tests, wrong for scale. This module
generates an arbitrarily large pages corpus DISTRIBUTEDLY: spark.range(n)
plus deterministic column expressions (xxhash64-indexed template/entity
picks), so a 10^8-row benchmark corpus costs no driver memory and no
shuffle, and the same (seed, n) always yields the same corpus.

Everything stays in whole-stage codegen; the generator's cost is tiny
relative to the extraction it feeds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from codebased_spark.synth.pages import (
    DOMAINS,
    RELATION_PATTERNS,
    gen_gazetteer,
)

SENTENCES_PER_DOC = 8


def _pick(arr_col, *hash_cols):
    """Deterministic element pick: arr[pmod(xxhash64(...), size)+1]."""
    return F.element_at(
        arr_col, (F.pmod(F.xxhash64(*hash_cols), F.size(arr_col)) + 1).cast("int")
    )


def synth_pages_spark(
    spark: SparkSession, n_docs: int, n_entities: int = 120, seed: int = 42
) -> tuple[DataFrame, DataFrame]:
    """(pages, gazetteer) — pages(url, warc_ts, html, text, lang).

    Each doc: SENTENCES_PER_DOC relation sentences over gazetteer entities
    chosen by per-(doc, slot) hashes. The html wraps the text so the
    extraction UDF does real work; surfaces are alphanumeric so no HTML
    escaping is needed and extracted text is byte-identical to `text`.
    """
    gaz_pd = gen_gazetteer(n_entities=n_entities, seed=seed)
    canon = gaz_pd[gaz_pd.weight == 1.0]
    by_type = {
        t: [s for s in canon[canon.entity_type == t].surface_form]
        for t in canon.entity_type.unique()
    }
    type_arrays = {
        t: F.array(*[F.lit(s) for s in surfs]) for t, surfs in by_type.items()
    }
    verbs = {
        pred: tmpl.replace("{a} ", "").replace(" {b}", "")
        for pred, tmpl, _, _ in RELATION_PATTERNS
    }

    # ~8 tasks per core, not 1: spark.range defaults to one partition per
    # core, and 250k-doc tasks make every straggler cost a whole core
    # (a real parquet scan gets this granularity from maxPartitionBytes)
    n_parts = max(8 * spark.sparkContext.defaultParallelism, 8)
    df = spark.range(0, n_docs, 1, n_parts).withColumnRenamed("id", "doc")
    sentences = []
    for slot in range(SENTENCES_PER_DOC):
        pred_idx = F.pmod(F.xxhash64("doc", F.lit(seed), F.lit(slot)), F.lit(len(RELATION_PATTERNS)))
        parts = None
        for i, (pred, _, st, ot) in enumerate(RELATION_PATTERNS):
            subj = _pick(type_arrays[st], F.col("doc"), F.lit(seed + 1), F.lit(slot), F.lit(i))
            obj = _pick(type_arrays[ot], F.col("doc"), F.lit(seed + 2), F.lit(slot), F.lit(i))
            sent = F.concat(subj, F.lit(" " + verbs[pred] + " "), obj, F.lit("."))
            parts = sent if parts is None else F.when(pred_idx == i, sent).otherwise(parts)
        sentences.append(parts)
    text = F.concat_ws(" ", *sentences)

    domains = F.array(*[F.lit(d) for d in DOMAINS])
    url = F.concat(
        F.lit("https://"),
        _pick(domains, F.col("doc"), F.lit(seed + 3)),
        F.lit("/en/article/"),
        F.lpad(F.col("doc").cast("string"), 8, "0"),
    )
    html = F.encode(
        F.concat(
            F.lit("<html><head><title>t</title><script>var x=1;</script></head><body><p>"),
            text,
            F.lit("</p></body></html>"),
        ),
        "UTF-8",
    )
    ts = F.timestamp_seconds(
        F.unix_timestamp(F.lit("2025-01-01 00:00:00")) + F.col("doc") % 86400
    )
    pages = df.select(
        url.alias("url"),
        ts.alias("warc_ts"),
        html.alias("html"),
        text.alias("text"),
        F.lit("en").alias("lang"),
    )
    gazetteer = spark.createDataFrame(gaz_pd)
    return pages, gazetteer


def synth_pages_materialized(
    spark: SparkSession,
    n_docs: int,
    n_entities: int = 120,
    seed: int = 42,
    base_dir: str = "/tmp/spark_graft_synth",
) -> tuple[DataFrame, DataFrame]:
    """Like synth_pages_spark, but the pages are written to parquet once
    and read back.

    Two reasons benchmarks should use this form:
    - Input shape: the production input is a columnar table scan (the
      north rule's Iceberg pages table), not a generator expression; a
      parquet read is the honest stand-in.
    - Codegen: the inline generator is a ~13k-line expression tree
      (element_at over literal arrays per sentence slot). Whole-stage
      codegen fuses it into every downstream stage, and the fused
      hashAgg class exceeds janino's method limit — Spark falls back to
      interpreted execution for exactly the stages being measured. A
      parquet boundary keeps the pipeline's own stages in codegen.

    The corpus is deterministic in (n_docs, n_entities, seed), so the
    parquet dir is keyed by those and reused when already committed.
    """
    import os

    pages, gazetteer = synth_pages_spark(spark, n_docs, n_entities, seed)
    path = f"{base_dir}_{n_docs}_{n_entities}_{seed}"
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        pages.write.mode("overwrite").parquet(path)
    return spark.read.parquet(path), gazetteer
