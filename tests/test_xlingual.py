"""crosslingual_entity_support + the hreflang-hub fixture wiring."""

from pyspark.sql import functions as F

from codebased_spark.link.xlingual import crosslingual_entity_support


def test_language_attestation(spark):
    members = spark.createDataFrame(
        [
            ("hub1", "u_en", "en"),
            ("hub1", "u_de", "de"),
            ("hub2", "v_en", "en"),
        ],
        ["cluster_id", "url", "lang"],
    )
    mentions = spark.createDataFrame(
        [
            # E1 attested by both languages of hub1 (duplicate obs on u_en)
            ("u_en", "E1"), ("u_en", "E1"), ("u_de", "E1"),
            # E2 only on the en variant
            ("u_en", "E2"),
            # E3 on hub2's only page
            ("v_en", "E3"),
            # mention on a url outside any translation group -> dropped
            ("w_xx", "E1"),
        ],
        ["url", "entity_id"],
    )
    out = {
        (r["cluster_id"], r["entity_id"]): r
        for r in crosslingual_entity_support(members, mentions).collect()
    }
    assert set(out) == {("hub1", "E1"), ("hub1", "E2"), ("hub2", "E3")}
    e1 = out[("hub1", "E1")]
    assert (e1["n_langs"], e1["n_pages"], e1["langs"]) == (2, 2, "de,en")
    e2 = out[("hub1", "E2")]
    assert (e2["n_langs"], e2["n_pages"], e2["langs"]) == (1, 1, "en")


def test_fixture_declares_shared_hub(spark):
    """Both language variants of a doc resolve to the SAME x-default
    hub through real markup extraction (incl. the adversarial de tag)."""
    from codebased_spark.sources.canonical import hreflang_alternates
    from codebased_spark.synth.pages import pages_with_xlingual_spark

    docs = spark.createDataFrame(
        [(7, "src1", "en", "alpha beta", 10)],
        ["doc_id", "source", "lang", "text", "n_chars"],
    )
    pages = pages_with_xlingual_spark(docs)
    assert pages.count() == 2
    hubs = (
        hreflang_alternates(pages.select("url", "html"))
        .where(F.col("hreflang") == "x-default")
        .collect()
    )
    # one x-default declaration per variant, all pointing at the en form
    assert len(hubs) == 2
    assert {r["alt_url"] for r in hubs} == {
        "https://src1.example.org/en/doc/7"
    }
    assert {r["url"] for r in hubs} == {
        "https://src1.example.org/en/doc/7",
        "https://src1.example.org/de/doc/7",
    }
