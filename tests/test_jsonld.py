"""JSON-LD extraction (extract/jsonld.py)."""

from __future__ import annotations

from codebased_spark.extract.jsonld import jsonld_entities


def _pages(spark, html):
    return spark.createDataFrame([("u", html.encode())], ["url", "html"])


def test_parses_multiline_block_and_ignores_unknown_fields(spark):
    html = """<head><script type="application/ld+json">
    {
      "@context": "https://schema.org",
      "@type": "Organization",
      "name": "Acme Corp",
      "logo": "https://a.example.com/l.png",
      "url": "https://acme.example.com"
    }
    </script></head>"""
    r = jsonld_entities(_pages(spark, html)).collect()[0]
    assert (r.entity_type, r.name, r.declared_url, r.date_published) == (
        "Organization", "Acme Corp", "https://acme.example.com", None
    )


def test_malformed_block_yields_null_row_not_failure(spark):
    html = (
        '<script type="application/ld+json">{not json</script>'
        '<script type="application/ld+json">{"@type":"Person","name":"Ada"}</script>'
    )
    rows = {r.block_idx: r for r in jsonld_entities(_pages(spark, html)).collect()}
    assert rows[0].entity_type is None and rows[0].name is None
    assert rows[1].entity_type == "Person" and rows[1].name == "Ada"


def test_page_without_blocks_yields_nothing(spark):
    assert jsonld_entities(_pages(spark, "<p>plain</p>")).count() == 0
