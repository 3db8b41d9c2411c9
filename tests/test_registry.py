"""Second extractor family (E14: typed patterns) + per-kind dispatch (S5)."""

from __future__ import annotations

import pandas as pd

from codebased_spark.extract.patterns import extract_pattern_mentions
from codebased_spark.extract.registry import (
    dispatch,
    make_dictionary_extractor,
    registered_kinds,
)

from pyspark.sql import functions as F


def test_pattern_extraction_types(spark):
    df = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": [0, 1],
                "text": [
                    "Mail ada@lab.example.org by 2025-03-01; budget $1200.50 or $99.",
                    "no entities here",
                ],
            }
        )
    )
    got = extract_pattern_mentions(df).toPandas()
    by_type = got.groupby("entity_type")["surface"].apply(list).to_dict()
    assert by_type["Email"] == ["ada@lab.example.org"]
    assert by_type["Date"] == ["2025-03-01"]
    assert by_type["Money"] == ["$1200.50", "$99"]
    assert (got.doc_id == 0).all()
    # pure JVM: no Python eval in the plan
    plan = extract_pattern_mentions(df)._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan


def test_dispatch_routes_by_kind(spark):
    """Dictionary family for 'article' rows, pattern family for 'contact'
    rows, unregistered kinds skipped (E18 degenerate-parser behavior)."""
    assert "patterns" in registered_kinds()
    df = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": [0, 1, 2],
                "kind": ["article", "contact", "binary_blob"],
                "text": [
                    "Acme Corporation expands.",
                    "reach us: ops@acme.example.com",
                    "Acme Corporation ops@acme.example.com",  # skipped kind
                ],
            }
        )
    )
    dict_fn = make_dictionary_extractor(
        ["Acme Corporation"], {"Acme Corporation": "Org"}
    )
    contact_fn = lambda d, i, t: extract_pattern_mentions(d, id_col=i, text_col=t)
    out = dispatch(
        df,
        kind_col=F.col("kind"),
        extra={"article": dict_fn, "contact": contact_fn},
    )
    rows = {(r.doc_id, r.surface, r.entity_type) for r in out.collect()}
    assert rows == {
        (0, "Acme Corporation", "Org"),
        (1, "ops@acme.example.com", "Email"),
    }


def test_dispatch_single_scan_for_multiple_families(spark):
    """VERDICT r2 #3: dispatch over N registered families must read the
    source corpus ONCE, not once per family. A per-row accumulator on an
    upstream UDF column counts actual source evaluations."""
    from pyspark.sql import types as T

    acc = spark.sparkContext.accumulator(0)

    def _tick(s):
        acc.add(1)
        return s

    tick = F.udf(_tick, T.StringType())
    n_rows = 30
    base = spark.range(n_rows).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 3 == 0, "article")
        .when(F.col("id") % 3 == 1, "contact")
        .otherwise("misc")
        .alias("kind"),
        tick(F.concat(F.lit("Acme Corporation text "), F.col("id"))).alias("text"),
    )
    dict_fn = make_dictionary_extractor(
        ["Acme Corporation"], {"Acme Corporation": "Org"}
    )
    contact_fn = lambda d, i, t: extract_pattern_mentions(d, id_col=i, text_col=t)
    misc_fn = lambda d, i, t: extract_pattern_mentions(d, id_col=i, text_col=t)
    out = dispatch(
        base,
        kind_col=F.col("kind"),
        extra={"article": dict_fn, "contact": contact_fn, "misc": misc_fn},
    )
    out.count()
    # one scan: each source row evaluated exactly once (cache fill), not
    # once per family branch
    assert acc.value == n_rows
