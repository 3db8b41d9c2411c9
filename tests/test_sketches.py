"""Probabilistic sketch tests: each sketch's distributed state must match
a pure-Python recomputation from the same portable md5 hash, and the
bloom prefilter must be exact-after-verify (no false negatives ever; the
rare false positive is flagged, not emitted as a member)."""

from __future__ import annotations

import hashlib

import pytest

from codebased_spark.sketches import (
    BLOOM_K,
    BLOOM_M,
    CM_D,
    CM_W,
    HLL_P,
    bloom_build,
    bloom_prefilter,
    countmin_counters,
    countmin_estimate,
    hll_registers,
)


def _md5_60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


@pytest.fixture(scope="module")
def items(spark):
    # word stream with a known frequency profile: word i appears i+1 times
    rows = [(f"w{i}",) for i in range(40) for _ in range(i + 1)]
    return spark.createDataFrame(rows, "item string")


def test_bloom_no_false_negatives(spark, items):
    block = spark.createDataFrame(
        [(f"w{i}",) for i in range(0, 40, 7)], "item string"
    )
    out = bloom_prefilter(
        items.distinct(), block, key_col="item"
    ).collect()
    got_true = {r.item for r in out if r.is_true_positive}
    assert got_true == {f"w{i}" for i in range(0, 40, 7)}
    # bloom survivors that are NOT in the blocklist are labelled false
    for r in out:
        assert r.is_true_positive == (int(r.item[1:]) % 7 == 0)


def test_bloom_bitmap_matches_python(spark):
    block = spark.createDataFrame([("a",), ("b",), ("c",)], "item string")
    words = bloom_build(block, item_col="item")
    got_bits = {
        w_i * 64 + b
        for w_i, w in enumerate(words)
        for b in range(64)
        if (w % (1 << 64)) >> b & 1
    }
    want_bits = {
        _md5_60(f"{it}:bloom{j}") % BLOOM_M
        for it in ("a", "b", "c")
        for j in range(BLOOM_K)
    }
    assert got_bits == want_bits


def test_hll_registers_match_python(spark, items):
    got = {
        r.register: r.max_rank
        for r in hll_registers(items, item_col="item").collect()
    }
    m = 1 << HLL_P
    rem = 60 - HLL_P
    want: dict[int, int] = {}
    for i in range(40):
        h = _md5_60(f"w{i}")
        reg, w = h % m, h >> HLL_P
        rank = rem + 1 if w == 0 else rem - w.bit_length() + 1
        want[reg] = max(want.get(reg, 0), rank)
    assert got == want


def test_countmin_overestimates_exactly(spark, items):
    counters = countmin_counters(items, item_col="item")
    probes = spark.createDataFrame(
        [("w0",), ("w39",), ("absent",)], "item string"
    )
    got = {
        r.item: r.est_count
        for r in countmin_estimate(counters, probes, item_col="item").collect()
    }
    # recompute the full counter table in python
    table: dict[tuple[int, int], int] = {}
    for i in range(40):
        for j in range(CM_D):
            key = (j, _md5_60(f"w{i}:cm{j}") % CM_W)
            table[key] = table.get(key, 0) + (i + 1)
    for probe, true_count in (("w0", 1), ("w39", 40), ("absent", 0)):
        est = min(
            table.get((j, _md5_60(f"{probe}:cm{j}") % CM_W), 0)
            for j in range(CM_D)
        )
        assert got[probe] == est
        assert got[probe] >= true_count  # one-sided error, always
