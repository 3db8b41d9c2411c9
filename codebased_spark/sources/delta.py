"""Incremental snapshot delta: what changed between two crawl snapshots.

The reference's incremental updater diffs the current scan against the
stored manifest by content hash and reprocesses ONLY new/changed files
(incremental.py:37-38, 159-274: `if stored_hash == current_hash: skip`).
The web-table analog diffs two url-keyed snapshots (e.g. last week's
committed crawl vs this week's) and classifies every url as
added / changed / unchanged / vanished — the worklist driver for
re-extraction, and the core of the north rule's resumability story.

Scale shape: ONE full-outer sort-merge join of two NARROW (url, hash)
tables — one row per url, hashes precomputed at capture time, so at
10^12 captures the join inputs are manifest-sized (distinct urls), not
capture-sized. The expensive Arrow UDF extraction stage then runs only
over `worklist()` (added + changed), which on a weekly recrawl is a few
percent of the corpus — the difference between re-reading 100 TB and
re-reading 2 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def snapshot_delta(
    prev: DataFrame,
    curr: DataFrame,
    url_col: str = "url",
    hash_col: str = "content_sha",
) -> DataFrame:
    """Classify every url across two snapshots by content-hash comparison.

    Inputs are one-row-per-url snapshots (e.g. from
    `recrawl.latest_captures`) carrying at least (url_col, hash_col);
    every other column rides along prefixed `prev_` / `curr_`.

    Output: one row per url in either snapshot with
      status ∈ {'added', 'vanished', 'changed', 'unchanged'}
    where 'changed' means the content hash differs — ids may differ while
    the bytes are identical (mirrored/recrawled-but-stable pages), and
    those are 'unchanged', matching the reference's hash-compare skip.
    """
    carry = [c for c in prev.columns if c != url_col]
    p = prev.select(
        F.col(url_col), *[F.col(c).alias(f"prev_{c}") for c in carry]
    )
    c_ = curr.select(
        F.col(url_col), *[F.col(c).alias(f"curr_{c}") for c in carry]
    )
    j = p.join(c_, url_col, "full_outer")
    prev_sha, curr_sha = F.col(f"prev_{hash_col}"), F.col(f"curr_{hash_col}")
    return j.withColumn(
        "status",
        F.when(prev_sha.isNull(), F.lit("added"))
        .when(curr_sha.isNull(), F.lit("vanished"))
        .when(prev_sha != curr_sha, F.lit("changed"))
        .otherwise(F.lit("unchanged")),
    )


def worklist(delta: DataFrame) -> DataFrame:
    """The re-extraction worklist: urls whose content must be (re)parsed.

    A plain filter — pushed down to the delta's join output, so the
    downstream UDF stage's scan prunes to added+changed rows only.
    """
    return delta.where(F.col("status").isin("added", "changed"))
