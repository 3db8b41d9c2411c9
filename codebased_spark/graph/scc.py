"""Strongly connected components over the directed link graph.

KG use: mutually-reachable URL/entity clusters (redirect rings, mirror
loops, citation cycles) — the directed counterpart of the undirected
alias-edge connected components (link/cc.py) the canonicalizer uses.
Reference analog: circular-dependency detection (SURVEY Q4 /
endpoints.py:433-438) generalized from "is this node on a cycle" to the
full cycle-cluster partition.

Algorithm: u and v share an SCC iff u reaches v AND v reaches u, so the
SCC id of u is min over (mutual-reach set of u) ∪ {u}. The mutual-reach
relation is the closure intersected with its own transpose — one
shuffle-distinct intersect over the (origin, node) closure produced by
`transitive_closure` (path doubling, ceil(log2 D) rounds, frontier
budget).

Scale honesty: the closure is O(sum of reachable-set sizes) — correct
but quadratic on one giant SCC. That is acceptable here because the
production caller runs it on CANDIDATE subgraphs (nodes with in- and
out-degree >= 1, the same origin prune cycle_members uses — on web
graphs this drops the tree-shaped majority), and the budget fail-fasts
instead of letting a runaway closure eat the cluster. A pivot-based
FW-BW decomposition is the documented upgrade path if whole-crawl SCC
is ever needed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from codebased_spark.graph.paths import transitive_closure


def strongly_connected_components(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    max_rounds: int = 30,
    max_rows: int = 0,
    prune_degree: bool = True,
) -> DataFrame:
    """(node, scc_id): scc_id = min node id of the member's SCC.

    Every node appearing in `edges` gets a row; nodes on no cycle are
    singleton SCCs (scc_id = node). With `prune_degree` (default) the
    closure only runs over nodes with both in- and out-degree >= 1 —
    nodes failing that test cannot be on any cycle, so they are emitted
    as singletons without paying for their reach sets.
    """
    e = edges.select(
        F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
    ).distinct()
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    if prune_degree:
        candidates = e.select(F.col("src").alias("node")).distinct().join(
            e.select(F.col("dst").alias("node")).distinct(), "node"
        )
        core = (
            e.join(candidates.withColumnRenamed("node", "src"), "src")
            .join(candidates.withColumnRenamed("node", "dst"), "dst")
            .select("src", "dst")
        )
    else:
        core = e
    reach = transitive_closure(
        core, max_rounds=max_rounds, max_rows=max_rows, checkpoint=True
    )
    transpose = reach.select(
        F.col("node").alias("origin"), F.col("origin").alias("node")
    )
    mutual = reach.intersect(transpose)
    pairs = mutual.unionByName(
        nodes.select(F.col("node").alias("origin"), F.col("node").alias("node"))
    )
    return (
        pairs.groupBy("origin")
        .agg(F.min("node").alias("scc_id"))
        .withColumnRenamed("origin", "node")
    )


def condensation_depth(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    max_rounds: int = 30,
    depth_rounds: int = 8,
    driver_threshold: int = 200_000,
) -> DataFrame:
    """(scc_id, n_members, depth): the condensation DAG of the directed
    graph — each SCC contracted to one node — with its longest-path layer
    depth (0 = source component, k = k hops of condensed edges from some
    source). This is the DAG layering a pipeline uses to schedule
    dependency-ordered processing of a cyclic link graph: SCCs at equal
    depth are independent.

    depth is computed by `depth_rounds` max-plus relaxation rounds (one
    condensed-edge join + max aggregation each): exact for any DAG whose
    longest path is <= depth_rounds, and the identical bounded recursion
    is what the oracle runs — the same fixed-k discipline as pagerank /
    k_hop_reach. Condensed edges are vocabulary-sized (distinct SCC
    pairs), so every round's join is far smaller than the page graph —
    and under `driver_threshold` condensed edges the relaxation runs
    driver-side in one collect instead of 8 tiny jobs (the adaptive
    discipline of link/cc.py and graph/pagerank.py; identical results,
    tested both ways).
    """
    scc = strongly_connected_components(
        edges, src_col=src_col, dst_col=dst_col, max_rounds=max_rounds
    )
    e = edges.select(
        F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
    ).distinct()
    a = scc.select(F.col("node").alias("src"), F.col("scc_id").alias("ca"))
    b = scc.select(F.col("node").alias("dst"), F.col("scc_id").alias("cb"))
    # materialize once: every relaxation round joins `cond`, and without
    # this the final plan replays the whole SCC closure 8 times (the
    # per-round persist discipline of graph/pagerank.py); both tables
    # are vocabulary-sized (distinct SCC pairs / SCC ids)
    cond = (
        e.join(a, "src")
        .join(b, "dst")
        .where(F.col("ca") != F.col("cb"))
        .select(F.col("ca").alias("csrc"), F.col("cb").alias("cdst"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    sizes = (
        scc.groupBy("scc_id")
        .agg(F.count(F.lit(1)).alias("n_members"))
        .localCheckpoint(eager=True)
    )
    if driver_threshold:
        probe = cond.limit(driver_threshold + 1).collect()
        if len(probe) <= driver_threshold:
            # same bounded max-plus relaxation, driver-side
            d: dict = {}
            for _ in range(depth_rounds):
                upd: dict = {}
                for r in probe:
                    nd = d.get(r.csrc, 0) + 1
                    if nd > upd.get(r.cdst, 0):
                        upd[r.cdst] = nd
                changed = False
                for k, v in upd.items():
                    if v > d.get(k, 0):
                        d[k] = v
                        changed = True
                if not changed:
                    break
            spark = edges.sparkSession
            if d:
                ddf = spark.createDataFrame(
                    [(k, v) for k, v in d.items()], "scc_id long, depth int"
                )
                return (
                    sizes.join(F.broadcast(ddf), "scc_id", "left")
                    .select(
                        "scc_id",
                        "n_members",
                        F.coalesce("depth", F.lit(0)).alias("depth"),
                    )
                )
            return sizes.select(
                "scc_id", "n_members", F.lit(0).alias("depth")
            )
    depth = sizes.select("scc_id", F.lit(0).alias("depth"))
    for _ in range(depth_rounds):
        upd = (
            cond.join(
                depth.select(F.col("scc_id").alias("csrc"), "depth"), "csrc"
            )
            .groupBy(F.col("cdst").alias("scc_id"))
            .agg((F.max("depth") + 1).alias("d_in"))
        )
        depth = (
            depth.join(upd, "scc_id", "left")
            .select(
                "scc_id",
                F.greatest(F.col("depth"), F.coalesce("d_in", F.lit(0))).alias(
                    "depth"
                ),
            )
        )
    return sizes.join(depth, "scc_id")
