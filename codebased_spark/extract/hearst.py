"""Hearst-pattern hypernym (IS_A) extraction — taxonomy induction.

The classic web-scale KG-construction step the gazetteer/open-triple
families don't cover: lexico-syntactic patterns ("Y such as X1, X2 and
X3", "X and other Y", "Y including X") emit (hyponym, IS_A, hypernym)
triples that induce the type taxonomy from raw text (Hearst 1992; used
at scale by WebIsA/KnowItAll-style systems). Reference analog: the
open-triple gap patterns (SURVEY.md E9, reference extractors emit typed
relationships from surface syntax); this is the same mechanism aimed at
the subsumption relation.

Scale shape: pure JVM — one `regexp_extract_all` pass per pattern over
the text column, per-match group extraction and hyponym-list splitting
via `transform`/`split` array expressions, so the whole stage is
map-only inside codegen; the only shuffle is the final (hyponym,
hypernym) aggregate, which is vocabulary-sized, not corpus-sized.
Connector words match case-insensitively ((?i) — real-web "Such as" /
"SUCH AS" forms); captured tokens are lowercased for a canonical node id.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# token: word chars + hyphen, so "x-y" names survive as one node id
_T = r"[\w-]+"
# hyponym list: "a, b, c and d" / "a or b" / bare "a"
_LIST = rf"(?:{_T}, )*{_T}(?: (?:and|or) {_T})?"

# name -> (regex, hypernym_group, hyponym_group, hyponym_group_is_list)
HEARST_PATTERNS: dict[str, tuple[str, int, int, bool]] = {
    "such_as": (rf"(?i)\b({_T}) such as ({_LIST})", 1, 2, True),
    "including": (rf"(?i)\b({_T}) including ({_LIST})", 1, 2, True),
    "and_other": (rf"(?i)\b({_T}) and other ({_T})", 2, 1, False),
}

# splits a captured hyponym list back into tokens (case-insensitive
# connectors, same as the capture regex)
_LIST_SEP = r"(?i),? (?:and|or) |, "


def hearst_pairs_col(text: Column) -> Column:
    """array<struct<hyponym,hypernym,pattern>> of every Hearst match.

    All JVM: regexp_extract_all pulls whole matches, then per-match
    regexp_extract recovers the two groups and split/transform explodes
    the hyponym list — no Python in the pass.
    """
    def make_pairs_of(name, rx, hyper_g, hypo_g, is_list):
        def pairs_of(m):
            hyper = F.lower(F.regexp_extract(m, rx, hyper_g))
            hypo_raw = F.regexp_extract(m, rx, hypo_g)
            hypos = (
                F.split(hypo_raw, _LIST_SEP)
                if is_list
                else F.array(hypo_raw)
            )
            return F.transform(
                hypos,
                lambda h: F.struct(
                    F.lower(h).alias("hyponym"),
                    hyper.alias("hypernym"),
                    F.lit(name).alias("pattern"),
                ),
            )

        return pairs_of

    arrays = []
    for name, (rx, hyper_g, hypo_g, is_list) in HEARST_PATTERNS.items():
        matches = F.regexp_extract_all(text, F.lit(rx), 0)
        arrays.append(
            F.flatten(
                F.transform(
                    matches, make_pairs_of(name, rx, hyper_g, hypo_g, is_list)
                )
            )
        )
    return F.concat(*arrays)


def extract_hypernyms(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(id, hyponym, hypernym, pattern) — one row per IS_A mention."""
    return df.select(
        F.col(id_col),
        F.explode(hearst_pairs_col(F.col(text_col))).alias("m"),
    ).select(
        id_col,
        F.col("m.hyponym").alias("hyponym"),
        F.col("m.hypernym").alias("hypernym"),
        F.col("m.pattern").alias("pattern"),
    )


def hypernym_summary(pairs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """The taxonomy edge table a KG pipeline materializes: (hyponym,
    hypernym) with document support and raw mention counts. One
    vocabulary-sized shuffle; map-side combine does the heavy lifting."""
    return pairs.groupBy("hyponym", "hypernym").agg(
        F.countDistinct(id_col).alias("n_docs"),
        F.count(F.lit(1)).alias("n_mentions"),
    )


def infer_types(pairs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Majority-vote entity typing from the IS_A evidence: each hyponym's
    inferred type is its most-supported hypernym (document support, ties
    broken lexicographically — deterministic), with the support share as
    an exact-division confidence. This is how web-scale taxonomy systems
    (WebIsA-style) collapse noisy per-sentence IS_A votes into one type
    per entity; competing hypernyms (polysemy, bad extractions) lose the
    vote instead of poisoning the type table.

    Scale shape: the input aggregate is vocabulary-sized after the
    hypernym_summary-style groupBy; the argmax window partitions by
    hyponym whose fan-out is the candidate-type count (tiny), never the
    corpus."""
    from pyspark.sql import Window

    per = pairs.groupBy("hyponym", "hypernym").agg(
        F.countDistinct(id_col).alias("n_docs")
    )
    tot = per.groupBy("hyponym").agg(F.sum("n_docs").alias("_total"))
    w = Window.partitionBy("hyponym").orderBy(
        F.desc("n_docs"), F.asc("hypernym")
    )
    ranked = per.withColumn("_rn", F.row_number().over(w)).where(F.col("_rn") == 1)
    share = F.floor(F.col("n_docs") / F.col("_total") * 10000 + F.lit(0.5)) / 10000
    return ranked.join(tot, "hyponym").select(
        "hyponym",
        F.col("hypernym").alias("inferred_type"),
        F.col("n_docs").alias("n_support"),
        share.alias("share"),
    )
