"""Distributed probabilistic sketches with DETERMINISTIC portable hashes.

Three classic fixed-memory summaries a 100-TB pipeline leans on when an
exact join/group would shuffle the corpus:

- **Bloom filter** (``bloom_build`` / ``bloom_prefilter``): membership
  prefilter. Build an m-bit filter over a (small) blocklist, broadcast the
  packed bitmap as a LITERAL (no join, no shuffle), and test every corpus
  row map-side in whole-stage codegen. Only the handful of bloom survivors
  pay the exact verification join — the pattern that replaces a
  corpus × blocklist shuffle with a map-only scan + tiny semi-join.
  Reference analog: the glob-exclusion prefilter applied before any parse
  work (base.py:158-191) — cheap reject-first, exact check after.
- **HyperLogLog registers** (``hll_registers``): distinct-count sketch.
  Per-item (register, rank) is map-side arithmetic; the sketch IS
  ``groupBy(register).max(rank)`` — Spark's map-side combine makes the
  merge step the aggregation itself, so the shuffle is at most
  2^p rows per partition regardless of corpus size. Flajolet et al. 2007.
- **Count-Min counters** (``countmin_counters`` / ``countmin_estimate``):
  heavy-hitter frequency sketch. d×w integer counters built with one
  groupBy over (row, bucket); estimates = min over d hashed buckets.
  Cormode & Muthukrishnan 2005.

Determinism contract: every hash is ``md5_hash60`` (top-60-bit md5,
dedup/simhash.py:43) so a DuckDB oracle recomputes the identical sketch —
registers, counters, and bloom bits are EXACT integers on both engines.
Estimation-formula floats (HLL's harmonic mean, etc.) are intentionally
not emitted: the gate checks the sketch state, which is the distributed
part; turning state into a scalar estimate is driver-side arithmetic.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from codebased_spark.dedup.simhash import md5_hash60

# ---------------------------------------------------------------------------
# Bloom filter
# ---------------------------------------------------------------------------

BLOOM_M = 8192  # bits (128 packed 64-bit words — a few KB broadcast)
BLOOM_K = 4  # hash functions


def _bloom_pos(col: Column, j: int, m: int) -> Column:
    """Bit position j for an item: portable md5 of "item:bloomj" mod m.
    md5_hash60 is non-negative, so % m is already in [0, m)."""
    return md5_hash60(F.concat(col, F.lit(f":bloom{j}"))) % m


def bloom_build(
    items: DataFrame,
    item_col: str = "item",
    m: int = BLOOM_M,
    k: int = BLOOM_K,
) -> list[int]:
    """Build the packed bloom bitmap (m/64 signed longs) over a blocklist.

    The per-item k positions are computed distributed (map-side, codegen);
    only the <= m distinct SET positions come back to the driver — the
    filter is blocklist-size-independent by construction, which is what
    makes it broadcastable. Word packing uses Python ints then wraps to
    signed 64-bit so the literal array round-trips as Spark LongType.
    """
    pos = (
        items.select(
            F.explode(
                F.array(*[_bloom_pos(F.col(item_col), j, m) for j in range(k)])
            ).alias("pos")
        )
        .distinct()
        .collect()
    )
    words = [0] * (m // 64)
    for r in pos:
        p = int(r.pos)
        words[p >> 6] |= 1 << (p & 63)
    # wrap to signed 64-bit for LongType literals
    return [w - (1 << 64) if w >= (1 << 63) else w for w in words]


def bloom_hit_col(col: Column, words: list[int], k: int = BLOOM_K) -> Column:
    """True iff ALL k bloom bits for `col` are set in the packed bitmap.

    Pure codegen: the bitmap rides along as a literal array column —
    no join, no broadcast exchange, no Python. shiftrightunsigned keeps
    the test correct for bits 63 of each signed word.
    """
    m = len(words) * 64
    lit = F.array(*[F.lit(w).cast("long") for w in words])
    checks = []
    for j in range(k):
        p = _bloom_pos(col, j, m)
        word = F.element_at(lit, (p / F.lit(64)).cast("int") + 1)
        # call_function: the Python wrapper only takes an int shift, but
        # the SQL builtin accepts a column — needed since the bit index
        # is data-dependent.
        checks.append(
            F.call_function(
                "shiftrightunsigned", word, (p % 64).cast("int")
            ).bitwiseAND(F.lit(1))
            == 1
        )
    out = checks[0]
    for c in checks[1:]:
        out = out & c
    return out


def bloom_prefilter(
    corpus: DataFrame,
    blocklist: DataFrame,
    key_col: str = "key",
    m: int = BLOOM_M,
    k: int = BLOOM_K,
) -> DataFrame:
    """Bloom-gated membership check: corpus rows whose key MIGHT be in the
    blocklist (bloom hit), each exactly verified with a left-semi join that
    only the survivors pay. Returns (key, is_true_positive) per surviving
    corpus row — false positives surface with is_true_positive = false,
    which is the sketch's documented behavior, not an error.
    """
    words = bloom_build(blocklist, item_col=key_col, m=m, k=k)
    hits = corpus.where(bloom_hit_col(F.col(key_col), words, k=k))
    exact = (
        blocklist.select(F.col(key_col).alias("_bk"))
        .distinct()
        .withColumn("_in", F.lit(True))
    )
    return (
        hits.join(exact, hits[key_col] == exact["_bk"], "left")
        .select(
            key_col,
            F.coalesce(F.col("_in"), F.lit(False)).alias("is_true_positive"),
        )
    )


# ---------------------------------------------------------------------------
# HyperLogLog registers
# ---------------------------------------------------------------------------

HLL_P = 8  # 2^8 = 256 registers


def hll_registers(
    items: DataFrame,
    item_col: str = "item",
    p: int = HLL_P,
) -> DataFrame:
    """HLL register table (register, max_rank) over a distributed stream.

    register = h mod 2^p; rank = 1 + leading zeros of the remaining
    (60 - p) hash bits = (60 - p) - bit_length(w) + 1, computed with
    ``length(bin(w))`` — an exact string op both engines share (no log2,
    no float). w = 0 (all remaining bits zero) ranks (60 - p) + 1.

    Scale shape: one narrow groupBy(register).max — map-side combine
    collapses every partition to <= 2^p rows before the shuffle, so the
    exchange is O(partitions * 2^p) no matter the corpus size. Registers
    from disjoint corpus splits merge with the same max() — the property
    that makes HLL unions free.
    """
    m = 1 << p
    rem_bits = 60 - p
    h = md5_hash60(F.col(item_col))
    # h // m via shiftright: exact integer floor. `h / m` would route
    # through DOUBLE and a 60-bit hash exceeds the 53-bit mantissa.
    w = F.shiftright(h, p)
    rank = F.when(w == 0, F.lit(rem_bits + 1)).otherwise(
        F.lit(rem_bits) - F.length(F.bin(w)) + 1
    )
    return (
        items.select((h % m).alias("register"), rank.alias("r"))
        .groupBy("register")
        .agg(F.max("r").alias("max_rank"))
    )


# ---------------------------------------------------------------------------
# Count-Min
# ---------------------------------------------------------------------------

CM_D = 4  # hash rows
CM_W = 1024  # counters per row


def countmin_counters(
    items: DataFrame,
    item_col: str = "item",
    d: int = CM_D,
    w: int = CM_W,
) -> DataFrame:
    """d×w Count-Min counter table (row, bucket, cnt) over an item stream.

    Each item increments one bucket per row: bucket = portable md5 of
    "item:cmROW" mod w. One explode (d rows per item) + one narrow
    groupBy — the counter table is at most d*w rows total, so the shuffle
    output is fixed-size regardless of stream length.
    """
    buckets = F.array(
        *[
            F.struct(
                F.lit(j).alias("cm_row"),
                (md5_hash60(F.concat(F.col(item_col), F.lit(f":cm{j}"))) % w)
                .alias("bucket"),
            )
            for j in range(d)
        ]
    )
    return (
        items.select(F.explode(buckets).alias("rb"))
        .select("rb.cm_row", "rb.bucket")
        .groupBy("cm_row", "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def countmin_estimate(
    counters: DataFrame,
    probes: DataFrame,
    item_col: str = "item",
    d: int = CM_D,
    w: int = CM_W,
) -> DataFrame:
    """Point-query the sketch for each probe item: est = min over the d
    hashed buckets (always >= true count; exact integers). The probe set
    joins the counter table on (row, bucket) — counters are d*w rows, so
    Spark broadcasts them and the probe never shuffles.
    """
    pb = probes.select(
        item_col,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("cm_row"),
                        (
                            md5_hash60(
                                F.concat(F.col(item_col), F.lit(f":cm{j}"))
                            )
                            % w
                        ).alias("bucket"),
                    )
                    for j in range(d)
                ]
            )
        ).alias("rb"),
    ).select(item_col, "rb.cm_row", "rb.bucket")
    return (
        pb.join(F.broadcast(counters), ["cm_row", "bucket"], "left")
        .groupBy(item_col)
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("est_count"))
    )
