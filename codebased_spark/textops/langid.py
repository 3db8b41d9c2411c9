"""Language identification via a corpus-trained token-language model.

Two stages, both plain DataFrame ops (train and predict are joins/aggs —
no Python, no external model):

1. train: token -> majority language over a labeled corpus slice
   (groupBy token,lang count; argmax per token, ties broken by lang asc).
2. predict: per document, majority vote of its tokens' predicted
   languages (argmax count, ties by lang asc).

This is the degenerate-but-distributed form of an n-gram Naive Bayes
language identifier; the voting/argmax plumbing is identical when the
features become character n-grams with log-odds weights. At 100 TB the
token-language model is a small dim table (vocabulary-sized) broadcast to
the prediction join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _tokens(docs: DataFrame, id_col: str, text_col: str, lang_col: str | None) -> DataFrame:
    cols = [F.col(id_col).alias("doc")] + (
        [F.col(lang_col).alias("lang")] if lang_col else []
    )
    return (
        docs.select(*cols, F.explode(F.split(F.col(text_col), " ")).alias("tok"))
        .where(F.col("tok") != "")
    )


def train_token_lang(docs: DataFrame, id_col: str = "doc_id",
                     text_col: str = "text", lang_col: str = "lang") -> DataFrame:
    """(tok, pred_lang) — majority language per token, deterministic ties."""
    counts = (
        _tokens(docs, id_col, text_col, lang_col)
        .groupBy("tok", "lang")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    w = Window.partitionBy("tok").orderBy(F.desc("n"), F.asc("lang"))
    return (
        counts.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("tok", F.col("lang").alias("pred_lang"))
    )


def lang_id(docs: DataFrame, model: DataFrame | None = None,
            id_col: str = "doc_id", text_col: str = "text",
            lang_col: str = "lang") -> DataFrame:
    """(doc_id, pred_lang) — per-doc majority vote of token languages.

    If `model` is None the model is trained on `docs` itself (self-training
    closure, used by the correctness gate); in production the model comes
    from a held-out labeled slice and is broadcast.
    """
    model = model if model is not None else train_token_lang(
        docs, id_col=id_col, text_col=text_col, lang_col=lang_col
    )
    votes = (
        _tokens(docs, id_col, text_col, None)
        .join(F.broadcast(model), "tok")
        .groupBy("doc", "pred_lang")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    w = Window.partitionBy("doc").orderBy(F.desc("n"), F.asc("pred_lang"))
    return (
        votes.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select(F.col("doc").alias(id_col), "pred_lang")
    )
