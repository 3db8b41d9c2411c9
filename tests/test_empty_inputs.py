"""Empty-input robustness: a 100 TB pipeline regularly sees empty
partitions, empty incremental deltas, and filtered-to-zero corpora —
operators must return empty results with the right schema, not throw."""

from __future__ import annotations

import pytest


@pytest.fixture()
def empty_sf(spark, tmp_path):
    spark.createDataFrame(
        [], "doc_id long, text string, lang string, source string, n_chars long"
    ).write.parquet(f"{tmp_path}/documents.parquet")
    spark.createDataFrame(
        [],
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    ).write.parquet(f"{tmp_path}/events.parquet")
    return str(tmp_path)


def test_flagship_pipeline_on_empty_corpus(spark, empty_sf):
    from codebased_spark.graph.pipeline import extract_triples
    from codebased_spark.synth.pages import pages_from_documents_spark

    docs = spark.read.parquet(f"{empty_sf}/documents.parquet")
    pages = pages_from_documents_spark(docs)
    gaz = spark.createDataFrame(
        [("alpha", "E1", "Topic", 1.0)],
        ["surface_form", "canonical_id", "entity_type", "weight"],
    )
    res = extract_triples(spark, pages, gaz)
    assert res.triples.count() == 0
    assert res.nodes.count() == 0 and res.edges.count() == 0


@pytest.mark.parametrize(
    "name",
    [
        "dd_exact", "dd_minhash_lsh", "tx_quality", "tx_lang_id",
        "tx_token_counts", "q_skyline", "kg_zone_maps", "kg_vacuum_plan",
        "tx_word_cooc", "tx_lm_perplexity", "tx_qa_pairs", "mm_exif",
        "tx_term_zipf", "kg_csr_layout", "g_degree_histogram",
        "tx_stratified_sample", "mm_srt_captions", "kg_charset_cascade",
        "g_pagerank", "g_pagerank_dangling", "g_domain_pagerank",
        "g_trustrank", "g_ppr", "kg_negatives", "g_fastrp",
        "kg_heading_outline", "kg_rdf_patch", "mm_decode_quarantine",
    ],
)
def test_registry_ops_tolerate_empty_tables(spark, empty_sf, name):
    import sys

    sys.path.insert(0, "/root/repo")
    import __spark_entry__ as m

    df = m.queries()[name](spark, empty_sf)
    assert df.count() == 0
    assert len(df.columns) > 0  # schema still defined
