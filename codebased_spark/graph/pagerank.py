"""PageRank over the page/entity graph — fixed-iteration power method.

The canonical web-graph centrality (Brin & Page '98) as DataFrame ops:
per iteration ONE join (ranks onto out-edges, contribution = pr/outdeg)
and ONE groupBy-sum per destination, then the damping blend; nodes without
in-edges keep the teleport mass via a left join from the node set. Each
iteration is a single shuffle keyed by dst — at web scale the join is the
textbook skew case (hub pages), which AQE skew-split plus the salting
tools in link/skew.py handle.

A FIXED iteration count (default 5) keeps the operator SQL-expressible:
the DuckDB oracle unrolls the same five iterations as chained CTEs with
the identical formula, so the driver gate checks real values, not just
shapes. Convergence-to-tolerance is a trivial driver loop over the same
step (same shape as link/cc.py); fixed-k is what a production scheduled
job runs anyway.

Dangling nodes (outdegree 0 — every real web graph has them on leaf
pages) are handled with the standard redistributed-mass term: per
iteration their aggregate rank is spread uniformly, pr' = (1-d)/N +
d*(inflow + dm/N). The dangling set is probed ONCE before the loop; a
graph with no sinks (the base doc-graph fixture) takes the zero-extra-job
lazy path unchanged, while sink graphs pay one tiny scalar aggregate per
iteration (the dangling rank sum — vocabulary-sized input, never the
corpus). The oracle CTEs extend with the identical dm_i term.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from codebased_spark.util import round_stable


def _pagerank_driver_side(
    node_rows, edge_rows, n_iter, damping, out_decimals, spark, node_col, id_type
):
    """Power iterations on the driver for vocabulary-sized graphs —
    identical formula, float64 arithmetic; the distributed loop costs
    ~4 jobs per iteration, which dwarfs the work below ~10^5 edges
    (the link/cc.py adaptive rationale applied to the iterative ops)."""
    vs = [r[0] for r in node_rows]
    n = len(vs)
    if n == 0:  # empty graph (an empty incremental delta is routine input)
        from pyspark.sql import types as T

        return spark.createDataFrame(
            [], T.StructType([T.StructField(node_col, id_type),
                              T.StructField("pr", T.DoubleType())])
        )
    deg: dict = {}
    for a, _ in edge_rows:
        deg[a] = deg.get(a, 0) + 1
    pr = {v: 1.0 / n for v in vs}
    teleport = (1.0 - damping) / n
    for _ in range(n_iter):
        dm = sum(p for v, p in pr.items() if v not in deg)
        inflow = {v: 0.0 for v in vs}
        for a, b in edge_rows:
            # edges whose src is outside the node table carry no rank —
            # the distributed path drops them via the rank join; links
            # from uncrawled pages are routine input (ADVICE r3)
            if b in inflow and a in pr:
                inflow[b] += pr[a] / deg[a]
        dm_over_n = dm / n
        pr = {v: teleport + damping * (inflow[v] + dm_over_n) for v in vs}
    scale = 10 ** out_decimals
    import math

    from pyspark.sql import types as T

    schema = T.StructType(
        [T.StructField(node_col, id_type), T.StructField("pr", T.DoubleType())]
    )
    rows = [(v, math.floor(p * scale + 0.5) / scale) for v, p in pr.items()]
    return spark.createDataFrame(rows, schema)


def pagerank(
    nodes: DataFrame,
    edges: DataFrame,
    n_iter: int = 5,
    damping: float = 0.85,
    node_col: str = "node",
    src: str = "src",
    dst: str = "dst",
    out_decimals: int = 7,
    driver_threshold: int = 200_000,
) -> DataFrame:
    """(node, pr) after `n_iter` power iterations from the uniform vector.

    Adaptive like link/cc.py: graphs under `driver_threshold` nodes+edges
    solve driver-side (two probe collects, zero iteration jobs — the
    distributed loop's ~4 jobs/round dwarf the work at vocabulary scale);
    larger graphs run the distributed loop below. Same formula, same
    float64 arithmetic, same rounding on both paths.
    """
    if driver_threshold:
        # ONE probe collect per side; if both fit, the rows ARE the input
        np_ = nodes.select(node_col).limit(driver_threshold + 1).collect()
        if len(np_) <= driver_threshold:
            ep = (
                edges.select(src, dst)
                .where(F.col(src).isNotNull() & F.col(dst).isNotNull())
                .limit(driver_threshold + 1)
                .collect()
            )
            if len(ep) <= driver_threshold:
                return _pagerank_driver_side(
                    np_, [tuple(r) for r in ep], n_iter, damping, out_decimals,
                    nodes.sparkSession, node_col,
                    nodes.schema[node_col].dataType,
                )
    n = nodes.count()
    if n == 0:  # distributed path reached with driver_threshold=0 in tests
        from pyspark.sql import types as T

        return nodes.sparkSession.createDataFrame(
            [], T.StructType([
                T.StructField(node_col, nodes.schema[node_col].dataType),
                T.StructField("pr", T.DoubleType()),
            ])
        )
    deg = edges.groupBy(src).agg(F.count(F.lit(1)).alias("_deg"))
    e = edges.join(deg, src)
    # dangling set probed once; empty on sink-free graphs -> lazy fast path
    dangling = nodes.select(F.col(node_col).alias("v")).join(
        deg.select(F.col(src).alias("v")), "v", "left_anti"
    )
    has_dangling = not dangling.isEmpty()
    ranks = nodes.select(
        F.col(node_col).alias("v"), (F.lit(1.0) / n).alias("pr")
    )
    teleport = (1.0 - damping) / n
    prev_cached = None
    for _ in range(n_iter):
        if has_dangling:
            # scalar dangling mass for THIS iteration: one tiny aggregate
            # over the (vocabulary-sized) rank vector, redistributed
            # uniformly. Collected to the driver so the iteration plan
            # keeps exactly one reference to the previous ranks (a lazy
            # cross-joined aggregate would duplicate the whole lineage
            # subtree 2^n_iter times). The rank vector is cached per
            # round — the dm collect materializes it, the contrib join
            # reuses it, and without the cache every round's collect
            # recomputes the full lineage (quadratic total work).
            ranks = ranks.persist()
            dm = (
                ranks.join(dangling, "v", "left_semi")
                .agg(F.coalesce(F.sum("pr"), F.lit(0.0)).alias("m"))
                .collect()[0].m
            )
            dm_over_n = dm / n
            if prev_cached is not None:
                prev_cached.unpersist()
            prev_cached = ranks
        else:
            dm_over_n = 0.0
        contrib = (
            e.join(ranks, e[src] == ranks.v)
            .groupBy(F.col(dst).alias("v2"))
            .agg(F.sum(F.col("pr") / F.col("_deg")).alias("inflow"))
        )
        inflow_term = F.coalesce("inflow", F.lit(0.0))
        if has_dangling:
            inflow_term = inflow_term + F.lit(dm_over_n)
        ranks = (
            nodes.select(F.col(node_col).alias("v"))
            .join(contrib, F.col("v") == F.col("v2"), "left")
            .select(
                "v",
                (F.lit(teleport) + F.lit(damping) * inflow_term).alias("pr"),
            )
        )
    out = ranks.select(
        F.col("v").alias(node_col), round_stable(F.col("pr"), out_decimals).alias("pr")
    )
    if prev_cached is not None:
        # the final ranks' lineage still reads the last persisted vector —
        # materialize the (N-row, 2-col) result once via localCheckpoint,
        # then drop the SQL cache entry. Unlike DataFrame.persist (held by
        # the CacheManager until an unpersist nobody downstream can issue),
        # checkpoint blocks are released by the ContextCleaner when the
        # returned plan is GC'd, so repeated pagerank calls don't leak one
        # cached rank vector per call (benchmark loops, scheduled jobs).
        out = out.localCheckpoint(eager=True)
        prev_cached.unpersist()
    return out


def _ppr_driver_side(
    node_rows, edge_rows, seed_set, n_iter, damping, out_decimals, spark,
    node_col, id_type
):
    """Driver-side PPR twin — identical formula/arithmetic to the
    distributed loop (the _pagerank_driver_side adaptive rationale)."""
    vs = [r[0] for r in node_rows]
    if not vs:  # empty graph: empty result, not a seed-config error
        from pyspark.sql import types as T

        return spark.createDataFrame(
            [], T.StructType([T.StructField(node_col, id_type),
                              T.StructField("ppr", T.DoubleType())])
        )
    seeds = [v for v in vs if v in seed_set]
    ns = len(seeds)
    if ns == 0:
        raise ValueError("personalized_pagerank: no seed overlaps the node set")
    s = {v: (1.0 / ns if v in seed_set else 0.0) for v in vs}
    deg: dict = {}
    for a, _ in edge_rows:
        deg[a] = deg.get(a, 0) + 1
    pr = dict(s)
    one_minus_d = 1.0 - damping
    for _ in range(n_iter):
        # dangling mass teleports BACK TO THE SEEDS (standard PPR: the
        # restart distribution is s, not uniform)
        dm = sum(p for v, p in pr.items() if v not in deg)
        inflow = {v: 0.0 for v in vs}
        for a, b in edge_rows:
            if b in inflow and a in pr:
                inflow[b] += pr[a] / deg[a]
        pr = {
            v: one_minus_d * s[v] + damping * (inflow[v] + dm * s[v])
            for v in vs
        }
    import math

    from pyspark.sql import types as T

    scale = 10 ** out_decimals
    schema = T.StructType(
        [T.StructField(node_col, id_type), T.StructField("ppr", T.DoubleType())]
    )
    rows = [(v, math.floor(p * scale + 0.5) / scale) for v, p in pr.items()]
    return spark.createDataFrame(rows, schema)


def personalized_pagerank(
    nodes: DataFrame,
    edges: DataFrame,
    seeds: DataFrame,
    n_iter: int = 5,
    damping: float = 0.85,
    node_col: str = "node",
    src: str = "src",
    dst: str = "dst",
    out_decimals: int = 7,
    driver_threshold: int = 200_000,
) -> DataFrame:
    """Personalized PageRank: restart distribution concentrated on `seeds`
    (one-column DataFrame of node ids) instead of uniform — the topic- /
    entity-conditioned relevance ranking a KG serves for "related pages
    to this seed set" (Haveliwala 2002). Same fixed-k power method,
    adaptive driver-side twin, and rounding contract as ``pagerank``;
    dangling mass teleports back to the seeds (the PPR restart vector),
    so rank mass stays in the seeds' neighborhood.

    Scale shape: the seed vector is node-keyed but sparse; it rides the
    same per-iteration dst-keyed shuffle as the uniform variant — the
    only extra cost is the one-time seed-flag left join (broadcast-sized
    for any realistic seed set).
    """
    if driver_threshold:
        np_ = nodes.select(node_col).limit(driver_threshold + 1).collect()
        if len(np_) <= driver_threshold:
            ep = (
                edges.select(src, dst)
                .where(F.col(src).isNotNull() & F.col(dst).isNotNull())
                .limit(driver_threshold + 1)
                .collect()
            )
            if len(ep) <= driver_threshold:
                seed_set = {r[0] for r in seeds.collect()}
                return _ppr_driver_side(
                    np_, [tuple(r) for r in ep], seed_set, n_iter, damping,
                    out_decimals, nodes.sparkSession, node_col,
                    nodes.schema[node_col].dataType,
                )
    sd = seeds.select(F.col(seeds.columns[0]).alias("v")).distinct()
    if nodes.isEmpty():  # empty graph: empty result, not a config error
        from pyspark.sql import types as T

        return nodes.sparkSession.createDataFrame(
            [], T.StructType([
                T.StructField(node_col, nodes.schema[node_col].dataType),
                T.StructField("ppr", T.DoubleType()),
            ])
        )
    ns = nodes.select(F.col(node_col).alias("v")).join(sd, "v", "left_semi").count()
    if ns == 0:
        raise ValueError("personalized_pagerank: no seed overlaps the node set")
    # per-node restart mass: 1/|S| on seeds, 0 elsewhere (cached — reused
    # as both the init vector and every iteration's teleport term)
    sv = (
        nodes.select(F.col(node_col).alias("v"))
        .join(sd.withColumn("_is_seed", F.lit(True)), "v", "left")
        .select(
            "v",
            F.when(F.col("_is_seed"), F.lit(1.0) / ns)
            .otherwise(F.lit(0.0))
            .alias("s"),
        )
        .persist()
    )
    deg = edges.groupBy(src).agg(F.count(F.lit(1)).alias("_deg"))
    e = edges.join(deg, src)
    dangling = nodes.select(F.col(node_col).alias("v")).join(
        deg.select(F.col(src).alias("v")), "v", "left_anti"
    )
    has_dangling = not dangling.isEmpty()
    one_minus_d = 1.0 - damping
    ranks = sv.select("v", F.col("s").alias("pr"))
    prev_cached = None
    for _ in range(n_iter):
        if has_dangling:
            ranks = ranks.persist()
            dm = (
                ranks.join(dangling, "v", "left_semi")
                .agg(F.coalesce(F.sum("pr"), F.lit(0.0)).alias("m"))
                .collect()[0].m
            )
            if prev_cached is not None:
                prev_cached.unpersist()
            prev_cached = ranks
        else:
            dm = 0.0
        contrib = (
            e.join(ranks, e[src] == ranks.v)
            .groupBy(F.col(dst).alias("v2"))
            .agg(F.sum(F.col("pr") / F.col("_deg")).alias("inflow"))
        )
        inflow_term = F.coalesce("inflow", F.lit(0.0))
        if has_dangling:
            inflow_term = inflow_term + F.lit(dm) * F.col("s")
        ranks = (
            sv.join(contrib, F.col("v") == F.col("v2"), "left")
            .select(
                "v",
                (
                    F.lit(one_minus_d) * F.col("s")
                    + F.lit(damping) * inflow_term
                ).alias("pr"),
            )
        )
    out = ranks.select(
        F.col("v").alias(node_col),
        round_stable(F.col("pr"), out_decimals).alias("ppr"),
    )
    out = out.localCheckpoint(eager=True)
    if prev_cached is not None:
        prev_cached.unpersist()
    sv.unpersist()
    return out


def trustrank_spam_mass(
    nodes: DataFrame,
    edges: DataFrame,
    trusted: DataFrame,
    n_iter: int = 5,
    damping: float = 0.85,
    node_col: str = "node",
    src: str = "src",
    dst: str = "dst",
    out_decimals: int = 6,
    driver_threshold: int = 200_000,
) -> DataFrame:
    """TrustRank + relative spam mass (Gyongyi, Garcia-Molina, Pedersen,
    VLDB 2004): trust flows from a hand-vetted seed set via personalized
    PageRank; a page whose PageRank far exceeds its TrustRank earned that
    rank from untrusted (spam-like) neighborhoods.

    Returns (node, pr, tr, spam_mass) with spam_mass = (pr - tr) / pr.
    The ratio is derived from the ALREADY-ROUNDED pr/tr columns so both
    engines divide identical doubles (the kg_entity_pmi determinism
    lesson: never round a transcendental/accumulated float on two engines
    independently when the inputs can be pinned first); trusted pages can
    legitimately go negative (tr > pr) — kept as-is, it is the standard
    relative-mass definition.

    Scale shape: two independent fixed-k power loops over the SAME edge
    partitioning plus one node-keyed join — no new shuffle family beyond
    what pagerank/personalized_pagerank already pay.
    """
    pr = pagerank(
        nodes, edges, n_iter=n_iter, damping=damping, node_col=node_col,
        src=src, dst=dst, out_decimals=out_decimals,
        driver_threshold=driver_threshold,
    )
    tr = personalized_pagerank(
        nodes, edges, trusted, n_iter=n_iter, damping=damping,
        node_col=node_col, src=src, dst=dst, out_decimals=out_decimals,
        driver_threshold=driver_threshold,
    ).withColumnRenamed("ppr", "tr")
    return pr.join(tr, node_col).select(
        node_col,
        "pr",
        "tr",
        F.when(
            F.col("pr") > 0,
            round_stable((F.col("pr") - F.col("tr")) / F.col("pr"), 4),
        ).alias("spam_mass"),
    )
