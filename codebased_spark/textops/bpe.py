"""Distributed BPE tokenizer training (Sennrich et al., ACL 2016).

The tokenizer-training pass of an LLM data pipeline: learn merge rules
from corpus statistics. BPE's structure fits Spark unusually well
because the expensive part — pair counting — runs over the WORD
VOCABULARY weighted by frequency, not over the corpus: one corpus-wide
(word -> freq) aggregation (the only corpus-scale shuffle), then every
merge round is an explode + weighted count over the vocabulary table
(tiny next to the corpus; cacheable) and a 1-row driver argmax. The
merge application is a pure-JVM left-to-right fold (F.aggregate) over
each word's symbol array — no Python touches the hot path.

Determinism: argmax ties break lexicographically on the pair, and the
merge applies to non-overlapping occurrences left to right (the
original subword-nmt behavior), so a rerun — or the pytest's pure-
Python executable-spec twin — reproduces the identical merge table.

The registered driver query exposes the round-1 census (top merge
candidates), which a SQL oracle can state exactly; the iterative
trainer's fixpoint is pinned by tests/test_bpe.py against the
reference implementation.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from codebased_spark.dedup.shingles import ngrams_col, tokens_col


def word_vocab(
    docs: DataFrame, text_col: str = "text"
) -> DataFrame:
    """(word, freq) over whitespace tokens — the one corpus-scale pass."""
    return (
        docs.select(F.explode(tokens_col(F.col(text_col))).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )


def pair_census(vocab: DataFrame, syms_col: Column | None = None) -> DataFrame:
    """(pair, cnt): frequency-weighted adjacent-symbol pair counts.
    `syms_col` defaults to the word's characters (round 1)."""
    syms = syms_col if syms_col is not None else F.split(F.col("word"), "")
    return (
        vocab.select(F.col("freq"), F.explode(ngrams_col(syms, 2)).alias("pair"))
        .groupBy("pair")
        .agg(F.sum("freq").alias("cnt"))
    )


def top_merge_candidates(docs: DataFrame, k: int = 20) -> DataFrame:
    """Round-1 census: the k most frequent within-word character pairs,
    ties broken lexicographically — the first merge rule's shortlist."""
    return pair_census(word_vocab(docs)).orderBy(
        F.desc("cnt"), F.asc("pair")
    ).limit(k)


def _apply_merge(syms: Column, a: str, b: str) -> Column:
    """One BPE merge (a, b) -> a+b applied left-to-right, non-overlapping
    — a single JVM fold, no UDF."""
    merged = F.lit(a + b)
    step = F.aggregate(
        syms,
        F.struct(
            F.array().cast("array<string>").alias("out"),
            F.lit("").alias("pend"),
        ),
        lambda acc, s: F.when(
            acc["pend"] == "", F.struct(acc["out"].alias("out"), s.alias("pend"))
        )
        .when(
            (acc["pend"] == a) & (s == b),
            F.struct(
                F.concat(acc["out"], F.array(merged)).alias("out"),
                F.lit("").alias("pend"),
            ),
        )
        .otherwise(
            F.struct(
                F.concat(acc["out"], F.array(acc["pend"])).alias("out"),
                s.alias("pend"),
            )
        ),
    )
    return F.when(
        step["pend"] == "", step["out"]
    ).otherwise(F.concat(step["out"], F.array(step["pend"])))


def bpe_encode(
    docs: DataFrame,
    merges: list[tuple[str, str]] | list[tuple[str, str, int]],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id, tokens array<string>, n_tokens): the corpus-encode pass.

    Applies the learned merge list in training order per word — the rank
    -ordered replay every BPE tokenizer does at inference. This is the
    one Python stage in the module, and it is the APPROVED slow path: an
    Arrow-batched pandas UDF with the (tiny) merge table closed over as
    a broadcast-sized literal — applying 8+ merges as composed JVM folds
    hangs Catalyst's expression expansion (bpe_train's lesson), and a
    per-word WORD CACHE inside the batch makes the Python cost
    proportional to distinct words, not tokens."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    rules = [(a, b) for a, b, *_ in merges]

    # NOTE: no type hints — `from __future__ import annotations`
    # stringifies them and pandas_udf's signature inspection rejects
    # unresolvable strings; the returnType argument carries the schema.
    @pandas_udf("array<string>")
    def encode(texts):
        cache: dict[str, list[str]] = {}

        def enc_word(w: str) -> list[str]:
            got = cache.get(w)
            if got is None:
                syms = list(w)
                for a, b in rules:
                    out, i = [], 0
                    while i < len(syms):
                        if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                            out.append(a + b)
                            i += 2
                        else:
                            out.append(syms[i])
                            i += 1
                    syms = out
                got = cache[w] = syms
            return got

        return texts.map(
            lambda t: [s for w in (t or "").split() if w for s in enc_word(w)]
        )

    return docs.select(
        F.col(id_col),
        encode(F.col(text_col)).alias("tokens"),
    ).withColumn("n_tokens", F.size("tokens"))


def bpe_train(
    docs: DataFrame, n_merges: int, text_col: str = "text"
) -> list[tuple[str, str, int]]:
    """Learn `n_merges` BPE rules; returns [(left, right, count), ...] in
    merge order. Each round: vocabulary-sized census shuffle + a 1-row
    collect, then ONE fold rewrites the symbol table, which is
    re-materialized (localCheckpoint) — composing the folds lazily
    instead nests each round's when/struct branches inside the previous
    round's, and Catalyst's expression expansion goes super-linear (it
    hung at 8 merges in testing). The vocabulary is tiny next to the
    corpus, so per-round materialization is noise."""
    vocab = (
        word_vocab(docs, text_col=text_col)
        .withColumn("syms", F.split(F.col("word"), ""))
        .localCheckpoint()
    )
    merges: list[tuple[str, str, int]] = []
    for _ in range(n_merges):
        top = (
            pair_census(vocab, syms_col=F.col("syms"))
            .orderBy(F.desc("cnt"), F.asc("pair"))
            .limit(1)
            .collect()
        )
        if not top or top[0]["cnt"] < 2:
            break
        a, b = top[0]["pair"].split(" ", 1)
        merges.append((a, b, top[0]["cnt"]))
        vocab = vocab.withColumn(
            "syms", _apply_merge(F.col("syms"), a, b)
        ).localCheckpoint()
    return merges
