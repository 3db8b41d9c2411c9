"""Training-mix materialization (textops/mix.py)."""

from __future__ import annotations

from codebased_spark.textops.mix import training_mix_copies


def _docs(spark, counts: dict[str, int]):
    rows, i = [], 0
    for lang, n in counts.items():
        for _ in range(n):
            rows.append((i, lang))
            i += 1
    return spark.createDataFrame(rows, ["doc_id", "lang"])


def test_weights_hit_exact_integer_copies(spark):
    # 100 docs: 50 en / 25 de / 25 fr; target en=0.25 -> weight 0.5,
    # de=0.5 -> weight 2.0, fr=0.25 -> weight 1.0
    docs = _docs(spark, {"en": 50, "de": 25, "fr": 25})
    out = training_mix_copies(docs, {"en": 0.25, "de": 0.5, "fr": 0.25})
    by_lang = {
        r.lang: r.total
        for r in out.groupBy("lang").agg({"n_copies": "sum"}).withColumnRenamed(
            "sum(n_copies)", "total"
        ).collect()
    }
    # weight 2.0 -> every de doc twice; weight 1.0 -> every fr doc once;
    # weight 0.5 -> doc_id % 1000 < 500 slice of en (ids 0..49 -> all < 500)
    assert by_lang["de"] == 50
    assert by_lang["fr"] == 25
    assert by_lang["en"] == 50  # ids 0..49 all pass the residue test


def test_missing_target_lang_dropped(spark):
    docs = _docs(spark, {"en": 10, "xx": 10})
    out = training_mix_copies(docs, {"en": 1.0})
    rows = {r.lang: r for r in out.where("n_copies > 0").collect() if r.lang == "xx"}
    assert rows == {}
    got = out.where("lang = 'xx'").agg({"n_copies": "max"}).collect()[0][0]
    assert got == 0


def test_composition_approaches_target(spark):
    # large uniform ids so the %1000 residue slice is representative
    docs = spark.range(10_000).selectExpr(
        "id AS doc_id",
        "CASE WHEN id % 10 < 6 THEN 'en' ELSE 'zh' END AS lang",
    )
    out = training_mix_copies(docs, {"en": 0.5, "zh": 0.5})
    mix = {
        r.lang: r.total
        for r in out.groupBy("lang").agg({"n_copies": "sum"}).withColumnRenamed(
            "sum(n_copies)", "total"
        ).collect()
    }
    total = mix["en"] + mix["zh"]
    assert abs(mix["en"] / total - 0.5) < 0.01
    assert abs(mix["zh"] / total - 0.5) < 0.01
