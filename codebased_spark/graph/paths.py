"""Bounded variable-length path operators (SURVEY.md §2.6 Q4).

The reference's query surface leans on Kuzu's `CALLS*1..3` / `IMPORTS*2..10`
variable-length patterns (endpoints.py:393-438). Spark has no built-in
transitive closure, so bounded-depth paths are an iterative frontier loop:

- each hop is one equi-join frontier.node == edges.src
- the frontier is anti-joined against everything already reached, which
  both deduplicates AND terminates cycles (a node is expanded once per
  origin), giving first-arrival = min-depth semantics
- per-hop localCheckpoint() (optional) cuts the lineage for large k —
  the same discipline as link/cc.py's fixpoint loop

Cost model at scale: reach explodes as out-degree^k; the anti-join caps it
at O(origins x reachable set). For unbounded closure use
connected_components (undirected) or GraphFrames BFS; for the reference's
k <= 10 patterns this loop is the right tool.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def k_hop_reach(
    edges: DataFrame,
    k: int,
    src_col: str = "src",
    dst_col: str = "dst",
    checkpoint_every: int = 0,
) -> DataFrame:
    """(origin, node, depth) for every node first reached within k hops.

    depth = minimum number of hops (1-based). A node reachable by several
    paths appears once, at its first-arrival depth.
    """
    e = edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
    reach = e.select(
        F.col("src").alias("origin"),
        F.col("dst").alias("node"),
        F.lit(1).alias("depth"),
    ).distinct()
    frontier = reach
    for d in range(2, k + 1):
        frontier = (
            frontier.join(e, frontier.node == e.src)
            .select("origin", F.col("dst").alias("node"), F.lit(d).alias("depth"))
            .distinct()
            .join(reach.select("origin", "node"), ["origin", "node"], "left_anti")
        )
        if checkpoint_every and (d - 1) % checkpoint_every == 0:
            frontier = frontier.localCheckpoint(eager=False)
        reach = reach.unionByName(frontier)
    return reach


def cycle_members(
    edges: DataFrame, max_len: int, src_col: str = "src", dst_col: str = "dst"
) -> DataFrame:
    """(node,) for every node on a directed cycle of length <= max_len.

    Q3/Q4 circular-dependency analog (QUERY_LIBRARY.md:217-225): a node is
    on a short cycle iff it reaches itself within max_len hops.
    """
    reach = k_hop_reach(edges, max_len, src_col=src_col, dst_col=dst_col)
    return (
        reach.where(F.col("node") == F.col("origin"))
        .select(F.col("origin").alias("node"))
        .distinct()
    )
