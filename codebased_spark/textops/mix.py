"""Deterministic training-mix materialization — turn per-language target
proportions into per-document repeat counts, the way LLM data recipes
(Pile / LLaMA-style mixture tables) up/down-sample sources to hit a
target composition.

weight(lang) = target_frac / natural_frac; each doc is emitted
floor(weight) times plus one more for the deterministic id-residue
slice `doc_id % 1000 < floor(frac_part * 1000)` — reproducible across
runs, retries and engines (no RNG), so a resumed job regenerates the
IDENTICAL mixed corpus, and expected composition matches the target to
0.1% per stratum.

Scale shape: one combine-enabled groupBy(lang) over the corpus (output
= #langs rows), broadcast join of that tiny weight table back, then a
map-only copies expression. At 10^12 docs the only corpus-sized work is
two scans; nothing shuffles by doc.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def training_mix_copies(
    docs: DataFrame,
    targets: dict[str, float],
    lang_col: str = "lang",
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, lang, weight-derived n_copies) per document. Languages absent
    from `targets` get weight 0 (dropped from the mix, n_copies = 0)."""
    total = docs.count()
    tgt = F.create_map(
        *[F.lit(x) for kv in targets.items() for x in kv]
    )
    natural = docs.groupBy(lang_col).agg(F.count(F.lit(1)).alias("n_lang"))
    weights = natural.select(
        lang_col,
        (
            F.coalesce(tgt[F.col(lang_col)], F.lit(0.0))
            / (F.col("n_lang") / F.lit(float(total)))
        ).alias("w"),
    )
    out = docs.join(F.broadcast(weights), lang_col)
    base = F.floor(F.col("w")).cast("long")
    frac = F.col("w") - F.floor(F.col("w"))
    extra = (
        (F.col(id_col) % 1000) < F.floor(frac * 1000)
    ).cast("long")
    return out.select(
        id_col,
        lang_col,
        (base + extra).alias("n_copies"),
    )
