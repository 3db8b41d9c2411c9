"""Deterministic Luby-style maximal-independent-set rounds.

MIS is the scheduling/coloring primitive of distributed graph processing
(Luby 1986, public): in each round every still-active node whose priority
beats all active neighbors' priorities joins the set; it and its
neighbors deactivate. With a deterministic priority (a fixed hash of the
node id, tie-broken by the id itself so comparisons are total) the whole
run is reproducible and a SQL oracle can replay the same fixed number of
rounds declaratively.

100-TB shape: each round is ONE join (active edges -> neighbor priority
min per node) + one anti-join (deactivate); the frontier only shrinks, so
round r costs at most the edges incident to still-active nodes. Expected
rounds to full convergence is O(log n) — the registered query runs a
fixed 3 rounds (like the pagerank/HITS fixed-k house style) and reports
the residual, which is exactly what a bounded production pass does before
falling back to a smaller per-partition finish.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# priority must fit int64 and be unique per node: hash * 1e12 + node id
_PRIO = (F.col("node") * 40503 % 104729) * F.lit(1_000_000_000_000) + F.col("node")


def luby_mis(edges: DataFrame, rounds: int = 3) -> DataFrame:
    """Run `rounds` Luby rounds over the symmetrized, loop-free version of
    `edges(src, dst)`. Returns (node, status, mis_round) where status is
    'in_mis' (joined the set in round mis_round), 'dominated' (a neighbor
    joined in mis_round), or 'active' (still undecided, mis_round 0)."""
    und = (
        edges.select("src", "dst")
        .where(F.col("src") != F.col("dst"))
        .unionByName(
            edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
            .where(F.col("src") != F.col("dst"))
        )
        .distinct()
    )
    nodes = und.select(F.col("src").alias("node")).distinct()
    # iterative anti-join lineage grows multiplicatively round over round
    # (the round-3 Catalyst plan embeds two copies of round 2's, four of
    # round 1's — analysis time explodes even though the data is cached),
    # so each round's outputs are localCheckpoint'ed: lineage truncated,
    # blocks released by the ContextCleaner (same rationale as
    # pagerank.py:164-171).
    active = nodes.withColumn("prio", _PRIO).localCheckpoint(eager=True)
    per_round = []
    for r in range(1, rounds + 1):
        # neighbor-priority min over ACTIVE neighbors only
        act_e = und.join(active.select(F.col("node").alias("src")), "src").join(
            active.select(F.col("node").alias("dst"), F.col("prio").alias("nprio")),
            "dst",
        )
        nmin = act_e.groupBy(F.col("src").alias("node")).agg(
            F.min("nprio").alias("min_nprio")
        )
        judged = active.join(nmin, "node", "left")
        selected = judged.where(
            F.col("min_nprio").isNull() | (F.col("prio") < F.col("min_nprio"))
        ).select("node")
        dominated = (
            und.join(selected.select(F.col("node").alias("src")), "src")
            .select(F.col("dst").alias("node"))
            .distinct()
            .join(active.select("node"), "node")  # only still-active ones
            .join(selected, "node", "left_anti")
        )
        round_rows = (
            selected.select(
                "node", F.lit("in_mis").alias("status"), F.lit(r).alias("mis_round")
            )
            .unionByName(
                dominated.select(
                    "node",
                    F.lit("dominated").alias("status"),
                    F.lit(r).alias("mis_round"),
                )
            )
            .localCheckpoint(eager=True)
        )
        per_round.append(round_rows)
        active = active.join(
            round_rows.select("node"), "node", "left_anti"
        ).localCheckpoint(eager=True)
    decided = per_round[0]
    for rr in per_round[1:]:
        decided = decided.unionByName(rr)
    residual = active.select(
        "node", F.lit("active").alias("status"), F.lit(0).alias("mis_round")
    )
    return decided.unionByName(residual)
