"""Fixed-length sequence packing for LLM training batches.

Training consumes fixed seq_len windows, not documents; the standard
GPT-style packer concatenates the token stream in a deterministic order
and cuts it every seq_len tokens, letting documents span pack
boundaries. This stage emits the (pack, doc, span) assignment table —
which pack(s) each document's tokens land in and at which offsets — the
exact manifest a downstream tokenizer/writer needs to materialize packed
examples without ever re-scanning text.

Scale shape: packing is embarrassingly parallel per SHARD (real
pipelines pack per output file): one window cumsum of token counts
keyed by shard, then a map-side sequence-explode of each doc into the
packs it overlaps — a doc lands in ceil(n_tokens / seq_len) + 1 packs at
most, so the explode is O(total_tokens / seq_len) rows. No joins, one
shuffle (the per-shard sort window). Everything is integer arithmetic —
the cross-engine hash gate is exact by construction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def pack_sequences(
    docs: DataFrame,
    seq_len: int = 512,
    n_shards: int = 8,
    id_col: str = "doc_id",
    tokens_col: str = "n_tokens",
) -> DataFrame:
    """(shard, pack_id, doc_id, tok_from, n_tok) span assignments.

    `tok_from` is the 0-based offset INSIDE the document of the first
    token that lands in this pack; `n_tok` the span length. Documents are
    ordered by id inside their shard (id mod n_shards), so a resumed or
    re-run job regenerates the identical packing — the determinism rule
    every materializing stage here follows (tx_training_mix, E11 ids).
    """
    shard = (F.col(id_col) % n_shards).alias("shard")
    w = (
        Window.partitionBy("shard")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    with_start = (
        docs.select(F.col(id_col), F.col(tokens_col), shard)
        .withColumn(
            "tok_start", F.coalesce(F.sum(tokens_col).over(w), F.lit(0))
        )
        .where(F.col(tokens_col) > 0)  # empty docs own no span; also keeps
        # F.sequence's bounds ordered (last >= first)
    )
    first = F.floor(F.col("tok_start") / seq_len)
    last = F.floor((F.col("tok_start") + F.col(tokens_col) - 1) / seq_len)
    spans = with_start.withColumn("pack_id", F.explode(F.sequence(first, last)))
    lo = F.greatest(F.col("tok_start"), F.col("pack_id") * seq_len)
    hi = F.least(
        F.col("tok_start") + F.col(tokens_col), (F.col("pack_id") + 1) * seq_len
    )
    return spans.select(
        "shard",
        "pack_id",
        F.col(id_col),
        (lo - F.col("tok_start")).alias("tok_from"),
        (hi - lo).alias("n_tok"),
    )
