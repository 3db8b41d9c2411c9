"""ANF / HyperBall: per-node neighborhood-function sketch.

The Approximate Neighborhood Function — |B_k(v)|, the number of nodes
reachable from v within k hops — is THE statistic web-graph analysis
wants per node (effective diameter, centrality screening, spam-farm
radius), and the one you cannot compute exactly at web scale: exact
per-node reach is an all-sources BFS whose state is O(sum of reach
sets) — the k-closure blowup graph/paths.py's budget guard exists to
catch. Palmer/Gibbons/Faloutsos (ANF, KDD'02) and Boldi/Vigna
(HyperBall, 2013) replace each node's reach SET with a fixed-size
HyperLogLog sketch: the ball of radius k is the HLL union of the node's
own sketch with its successors' balls of radius k-1, and HLL union is
register-wise max — an operation that distributes over ANY partitioning
of the edge set.

Spark shape (one narrow shuffle per round, rows <= m*N at all times):

    regs_0  = one (node, register, rank) row per node (its own hash)
    regs_k  = regs_{k-1}  UNION  edges JOIN regs_{k-1} ON dst = node
              -> groupBy(node, register).max(rank)

The per-round groupBy is map-side combinable (max), keys are two
integers, and the working set never exceeds m rows per node — at 100 TB
this is m*|V| longs, NOT the O(|V| * reach) of exact closure. Rounds
localCheckpoint like link/cc.py so round r's plan does not replay
rounds 0..r-1.

Determinism contract (sketches.py): the hash is md5_hash60 over the
node id's decimal string, so a DuckDB oracle recomputes the identical
registers from the exact bounded closure — HLL-merge-over-paths equals
HLL-over-reach-set because register max is idempotent, commutative,
and associative; the cross-engine gate checks exactly that identity.
The emitted summary is exact-integer state: n_filled registers and the
harmonic numerator sum(2^(RMAX - M_j)) with empty registers counting
2^RMAX (RMAX = 60 - p + 1, so the sum fits BIGINT for m <= 16).
Turning state into the float cardinality estimate (alpha_m * m^2 /
(harm_num * 2^-RMAX)) is driver-side arithmetic, intentionally ungated.

Reference analog: the reference's graph stats pass (SURVEY A2/A3,
S12) reports global counts in one scan; ANF is the per-node radius
statistic the same dashboard needs once the graph is web-sized.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from codebased_spark.dedup.simhash import md5_hash60

ANF_P = 4  # 2^4 = 16 registers per node: RMAX = 57, 16*2^57 < 2^63


def _node_register(node_col) -> tuple:
    """(register, rank) for a node's own hash — same bin-length rank
    rule as sketches.hll_registers, p = ANF_P."""
    m = 1 << ANF_P
    rem_bits = 60 - ANF_P
    h = md5_hash60(node_col.cast("string"))
    w = F.shiftright(h, ANF_P)
    rank = F.when(w == 0, F.lit(rem_bits + 1)).otherwise(
        F.lit(rem_bits) - F.length(F.bin(w)) + 1
    )
    return (h % m).alias("register"), rank.alias("r")


def anf_registers(
    nodes: DataFrame,
    edges: DataFrame,
    k: int = 4,
    node_col: str = "node",
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """(node, register, max_rank) — HLL state of each node's k-hop
    out-ball (self included). Rows <= 16 * |V| after every round."""
    reg, rank = _node_register(F.col(node_col))
    regs = (
        nodes.select(F.col(node_col).alias("node"), reg, rank)
        .groupBy("node", "register")
        .agg(F.max("r").alias("r"))
        .localCheckpoint(eager=True)
    )
    e = edges.select(F.col(src).alias("_src"), F.col(dst).alias("_dst")).distinct()
    for _ in range(k):
        pulled = e.join(regs, e["_dst"] == regs["node"]).select(
            F.col("_src").alias("node"), "register", "r"
        )
        regs = (
            regs.unionByName(pulled)
            .groupBy("node", "register")
            .agg(F.max("r").alias("r"))
            # each round references regs twice (carry + pull); without
            # materialization the lazy plan doubles per round, the
            # redirects.py 2^rounds trap. State is <= 16|V| rows.
            .localCheckpoint(eager=True)
        )
    return regs.select("node", "register", F.col("r").alias("max_rank"))


def anf_curve(
    nodes: DataFrame,
    edges: DataFrame,
    k: int = 4,
    node_col: str = "node",
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Global neighborhood-function curve: (k, sum_filled, sum_harm).

    NF(k) = sum over v of |B_k(v)| is the curve whose 90% crossing is
    the effective diameter (ANF's headline output). Per round this
    emits the exact-integer totals of every node's sketch state — sum
    of filled registers, and the sum of harmonic numerators carried as
    a (high, low) pair split at 2^30 because the plain sum (N * up to
    2^61) overflows int64 while the gate's value canon is exact only
    for int64: total = harm_hi * 2^30 + harm_lo, both components exact
    in both engines. k+1 rows; the float NF estimate derives
    driver-side.
    """
    reg, rank = _node_register(F.col(node_col))
    regs = (
        nodes.select(F.col(node_col).alias("node"), reg, rank)
        .groupBy("node", "register")
        .agg(F.max("r").alias("r"))
        .localCheckpoint(eager=True)
    )
    e = edges.select(F.col(src).alias("_src"), F.col(dst).alias("_dst")).distinct()

    def _totals(r_df, kk):
        s = anf_summary(r_df.select("node", "register", F.col("r").alias("max_rank")))
        return s.agg(
            F.lit(kk).alias("k"),
            F.sum("n_filled").alias("sum_filled"),
            F.sum(F.shiftright("harm_num", 30)).alias("harm_hi"),
            F.sum(F.col("harm_num").bitwiseAND(F.lit((1 << 30) - 1))).alias(
                "harm_lo"
            ),
        )

    out = _totals(regs, 0)
    for kk in range(1, k + 1):
        pulled = e.join(regs, e["_dst"] == regs["node"]).select(
            F.col("_src").alias("node"), "register", "r"
        )
        regs = (
            regs.unionByName(pulled)
            .groupBy("node", "register")
            .agg(F.max("r").alias("r"))
            .localCheckpoint(eager=True)
        )
        out = out.unionByName(_totals(regs, kk))
    return out


def anf_summary(regs: DataFrame) -> DataFrame:
    """(node, n_filled, harm_num) exact-integer sketch summary.

    harm_num = sum over all m registers of 2^(RMAX - M_j), M_j = 0 for
    empty registers — the integer numerator of the HLL harmonic mean
    (the float estimate is alpha_m * m^2 * 2^RMAX / harm_num, left to
    the caller per the sketches.py determinism contract).
    """
    m = 1 << ANF_P
    rmax = 60 - ANF_P + 1
    filled = regs.groupBy("node").agg(
        F.count(F.lit(1)).alias("n_filled"),
        # shiftleft with a COLUMN bit count needs the SQL form — the
        # pyspark function only accepts a literal int numBits
        F.sum(
            F.expr(f"shiftleft(CAST(1 AS BIGINT), {rmax} - max_rank)")
        ).alias("_filled_sum"),
    )
    empty = (F.lit(m) - F.col("n_filled")).cast("long") * F.shiftleft(
        F.lit(1).cast("long"), rmax
    )
    return filled.select(
        "node",
        "n_filled",
        (F.col("_filled_sum") + empty).alias("harm_num"),
    )
