"""Distributed multinomial Naive Bayes with log2-QUANTIZED integer
likelihoods — a document classifier whose training is one groupBy and
whose scores are EXACT integers on any engine.

Why quantized: classic NB sums ln-probabilities, and natural log is
transcendental — JVM and libm can disagree in the last ulp, which makes a
cross-engine value gate flaky (the kg_entity_pmi determinism lesson).
Here every log is floor(log2(x)) computed as ``length(bin(x))`` — an
exact string op both Spark and DuckDB share — so the per-(doc, class)
score is a bit-identical BIGINT everywhere:

    score(d, c) = sum_w n_w(d) * (BL(cnt(c,w) + 1) - BL(tot_c + V))
                + BL(ndocs_c) - BL(ndocs_train)

with BL(x) = bit_length(x) = floor(log2(x)) + 1, Laplace-smoothed counts,
V = train vocabulary size. That is NB with likelihoods quantized to
powers of two: coarser than float NB (a documented trade, ~1 bit of
resolution per factor) but deterministic, overflow-free, and monotone in
the true counts.

Scale shape: training is a single (label, token) groupBy with map-side
combine — model size is vocab x classes, shuffled once. Scoring joins
test (doc, token) counts against the model on (label, token) — a plain
shuffle join AQE can broadcast when the model is small — after a
class-list crossJoin that is bounded by the number of labels (single
digits for lang-ID-style tasks). Argmax is one groupBy with a struct-min
(no window, no second shuffle family).

Reference analog: the per-entity heuristic type scorer (the reference
picks an entity type by weighted pattern votes, endpoints.py:210-240) —
same argmax-over-evidence shape, here with learned token evidence.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _bl(c: Column) -> Column:
    """bit_length(x) for x >= 1 — floor(log2 x) + 1, exact in codegen."""
    return F.length(F.bin(c))


def _tokens(docs: DataFrame, text_col: str) -> DataFrame:
    return docs.select(
        "doc_id", F.explode(F.split(F.col(text_col), " ")).alias("w")
    ).where(F.col("w") != "")


def nb_train(
    docs: DataFrame, label_col: str = "lang", text_col: str = "text"
) -> tuple[DataFrame, DataFrame, int, int]:
    """Sufficient statistics: ((label, w, cnt), (label, n_docs, tot_tokens),
    vocab_size, n_train_docs). Two narrow groupBys + two tiny scalars."""
    toks = docs.select(
        F.col(label_col).alias("label"),
        F.explode(F.split(F.col(text_col), " ")).alias("w"),
    ).where(F.col("w") != "")
    cnt = toks.groupBy("label", "w").agg(F.count(F.lit(1)).alias("cnt"))
    tot = cnt.groupBy("label").agg(F.sum("cnt").alias("tot"))
    ndocs = docs.groupBy(F.col(label_col).alias("label")).agg(
        F.count(F.lit(1)).alias("ndocs")
    )
    classes = tot.join(ndocs, "label")
    vocab = toks.select("w").distinct().count()
    n_train = docs.count()
    return cnt, classes, vocab, n_train


def nb_classify(
    train: DataFrame,
    test: DataFrame,
    label_col: str = "lang",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, pred_label, best_score) for every test doc with >= 1 token.

    Ties break to the lexicographically smallest label (deterministic on
    both engines via min over (negated score, label) structs)."""
    cnt, classes, vocab, _n_train = nb_train(train, label_col, text_col)
    n_train = _n_train
    test_wc = (
        _tokens(test, text_col)
        .groupBy("doc_id", "w")
        .agg(F.count(F.lit(1)).alias("n_w"))
    )
    scored = (
        test_wc.crossJoin(F.broadcast(classes))
        .join(cnt, ["label", "w"], "left")
        .select(
            "doc_id",
            "label",
            "ndocs",
            (
                F.col("n_w")
                * (
                    _bl(F.coalesce(F.col("cnt"), F.lit(0)) + 1)
                    - _bl(F.col("tot") + F.lit(vocab))
                )
            ).alias("term"),
        )
        .groupBy("doc_id", "label")
        .agg(
            (
                F.sum("term")
                + F.first(_bl(F.col("ndocs")))
                - F.lit(len(bin(n_train)) - 2)
            ).alias("score")
        )
    )
    best = scored.groupBy("doc_id").agg(
        F.min(F.struct((-F.col("score")).alias("ns"), F.col("label"))).alias(
            "b"
        )
    )
    return best.select(
        "doc_id",
        F.col("b.label").alias("pred_label"),
        (-F.col("b.ns")).alias("best_score"),
    )
