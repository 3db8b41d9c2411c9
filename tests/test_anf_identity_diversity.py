"""graph/anf.py, graph/identity.py, corpus_stats.trigram_diversity.

The ANF and diversity expectations are recomputed in pure Python from
the same portable md5 hash, so the tests pin the sketch arithmetic
(register split, bin-length rank, harmonic numerator) independently of
the SQL oracles.
"""

import hashlib

from pyspark.sql import functions as F

from codebased_spark.graph.anf import ANF_P, anf_registers, anf_summary
from codebased_spark.graph.identity import identity_closure
from codebased_spark.textops.corpus_stats import trigram_diversity


def _h60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _hll_state(items, p):
    """(n_filled, harm_num) of the md5-portable HLL over `items`."""
    m = 1 << p
    rem = 60 - p
    regs = {}
    for it in items:
        h = _h60(it)
        w = h >> p
        rank = rem + 1 if w == 0 else rem - w.bit_length() + 1
        r = h % m
        regs[r] = max(regs.get(r, 0), rank)
    rmax = rem + 1
    harm = sum(1 << (rmax - v) for v in regs.values())
    harm += (m - len(regs)) * (1 << rmax)
    return len(regs), harm


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, ["src", "dst"])


def test_anf_ball_equals_reach_set_sketch(spark):
    # path 1 -> 2 -> 3 -> 4 plus a back edge 4 -> 1: B_2(1) = {1,2,3}
    nodes = spark.createDataFrame([(i,) for i in range(1, 5)], ["node"])
    e = _edges(spark, [(1, 2), (2, 3), (3, 4), (4, 1)])
    out = {
        r["node"]: (r["n_filled"], r["harm_num"])
        for r in anf_summary(anf_registers(nodes, e, k=2)).collect()
    }
    balls = {1: {1, 2, 3}, 2: {2, 3, 4}, 3: {3, 4, 1}, 4: {4, 1, 2}}
    for v, ball in balls.items():
        assert out[v] == _hll_state([str(u) for u in ball], ANF_P), v


def test_anf_state_is_bounded(spark):
    # register rows never exceed m * |V| even after many rounds
    n = 40
    nodes = spark.createDataFrame([(i,) for i in range(n)], ["node"])
    e = _edges(spark, [(i, (i + 1) % n) for i in range(n)])
    regs = anf_registers(nodes, e, k=6)
    assert regs.count() <= (1 << ANF_P) * n
    # self is always in the ball: every node has >= 1 register
    assert regs.select("node").distinct().count() == n


def test_anf_isolated_node_sketches_itself(spark):
    nodes = spark.createDataFrame([(7,), (8,)], ["node"])
    e = _edges(spark, [(7, 8)])
    out = {
        r["node"]: (r["n_filled"], r["harm_num"])
        for r in anf_summary(anf_registers(nodes, e, k=3)).collect()
    }
    assert out[8] == _hll_state(["8"], ANF_P)  # no out-edges: ball = {8}
    assert out[7] == _hll_state(["7", "8"], ANF_P)


def _fam_edges(spark, rows):
    return spark.createDataFrame(rows, ["src", "dst", "family"])


def test_identity_closure_fuses_families(spark):
    edges = _fam_edges(
        spark,
        [
            ("u/old", "u/new", "redirect"),
            ("u/new", "hub", "canonical"),
            ("x/a", "x/b", "redirect"),  # separate redirect-only pair
        ],
    )
    out = {r["url"]: r for r in identity_closure(edges).collect()}
    assert set(out) == {"u/old", "u/new", "hub", "x/a", "x/b"}
    # cross-family closure: u/old reaches hub only through both edges
    assert out["u/old"]["identity_id"] == "hub"
    assert out["u/new"]["identity_id"] == "hub"
    assert (out["hub"]["n_urls"], out["hub"]["n_redirect"],
            out["hub"]["n_canonical"]) == (3, 1, 1)
    # redirect-only cluster: canonical count must be zero, id = min url
    assert out["x/b"]["identity_id"] == "x/a"
    assert (out["x/a"]["n_urls"], out["x/a"]["n_redirect"],
            out["x/a"]["n_canonical"]) == (2, 1, 0)


def test_identity_closure_matches_distributed_path(spark):
    # same result when the CC driver short-circuit is disabled
    from codebased_spark.link import cc as cc_mod

    edges = _fam_edges(
        spark,
        [("a", "b", "redirect"), ("b", "c", "canonical"), ("d", "e", "redirect")],
    )
    expected = {
        ("a", "a", 3), ("b", "a", 3), ("c", "a", 3), ("d", "d", 2), ("e", "d", 2),
    }
    got = {
        (r["url"], r["identity_id"], r["n_urls"])
        for r in identity_closure(edges).collect()
    }
    assert got == expected
    orig = cc_mod.connected_components.__defaults__
    try:
        cc_mod.connected_components.__defaults__ = ("src", "dst", 50, 0)
        got_dist = {
            (r["url"], r["identity_id"], r["n_urls"])
            for r in identity_closure(edges).collect()
        }
    finally:
        cc_mod.connected_components.__defaults__ = orig
    assert got_dist == expected


def test_trigram_diversity_exact_and_sketch(spark):
    docs = spark.createDataFrame(
        [
            ("s1", "a b c d"),        # trigrams: 'a b c', 'b c d'
            ("s1", "a b c"),          # 'a b c' again (duplicate)
            ("s2", "x y"),            # too short: no trigrams
        ],
        ["source", "text"],
    )
    out = {r["source"]: r for r in trigram_diversity(docs).collect()}
    assert (out["s1"]["n_docs"], out["s1"]["n_tokens"],
            out["s1"]["n_trigrams"]) == (2, 7, 3)
    assert (out["s1"]["n_filled"], out["s1"]["harm_num"]) == _hll_state(
        ["a b c", "b c d", "a b c"], 8
    )
    # empty sketch: all 256 registers empty
    assert (out["s2"]["n_trigrams"], out["s2"]["n_filled"]) == (0, 0)
    assert out["s2"]["harm_num"] == 256 * (1 << 53)


def test_anf_curve_monotone_and_k0_is_self(spark):
    from codebased_spark.graph.anf import anf_curve

    n = 12
    nodes = spark.createDataFrame([(i,) for i in range(n)], ["node"])
    e = _edges(spark, [(i, (i + 1) % n) for i in range(n)])
    rows = {r["k"]: r for r in anf_curve(nodes, e, k=3).collect()}
    assert set(rows) == {0, 1, 2, 3}
    # k=0: each node sketches exactly itself -> 1 filled register each
    assert rows[0]["sum_filled"] == n
    exp0 = sum(_hll_state([str(i)], ANF_P)[1] for i in range(n))
    assert rows[0]["harm_hi"] * (1 << 30) + rows[0]["harm_lo"] == exp0
    # filled registers never decrease with k (balls only grow)
    assert (rows[0]["sum_filled"] <= rows[1]["sum_filled"]
            <= rows[2]["sum_filled"] <= rows[3]["sum_filled"])
    # k=3 on a ring: ball = 4 consecutive nodes, checked exactly
    exp3 = [
        _hll_state([str((i + d) % n) for d in range(4)], ANF_P)
        for i in range(n)
    ]
    assert rows[3]["sum_filled"] == sum(f for f, _ in exp3)
    assert (rows[3]["harm_hi"] * (1 << 30) + rows[3]["harm_lo"]
            == sum(h for _, h in exp3))


def _recs(spark, rows):
    return spark.createDataFrame(rows, ["rec_id", "name"])


def test_blocked_er_best_match_and_threshold(spark):
    from codebased_spark.link.er import blocked_er

    a = _recs(spark, [(1, "zeta widgets corp"), (2, "omega gadgets corp"),
                      (3, "nothing shared here")])
    b = _recs(spark, [
        (10, "zeta widgets llc"),      # vs 1: inter 2, union 4 -> 0.5 match
        (11, "zeta holdings"),         # vs 1: inter 1, union 4 -> 0.25
        (20, "omega supplies"),        # vs 2: inter 1, union 4 -> 0.25
    ])
    out = {r["a_id"]: r for r in blocked_er(a, b).collect()}
    assert out[1]["b_id"] == 10 and out[1]["is_match"] == 1
    assert (out[1]["inter"], out[1]["union_sz"]) == (2, 4)
    assert out[2]["b_id"] == 20 and out[2]["is_match"] == 0
    assert 3 not in out  # no shared blocking token -> no candidates


def test_blocked_er_df_cap_prunes_frequent_tokens(spark):
    from codebased_spark.link.er import blocked_er

    # 'inc' appears in every B record; with df_cap=2 it cannot block,
    # so only the rare token 'kappa' generates candidates
    a = _recs(spark, [(1, "kappa inc"), (2, "lambda inc")])
    b = _recs(spark, [(10, "kappa inc"), (11, "mu inc"), (12, "nu inc")])
    out = {r["a_id"]: r for r in blocked_er(a, b, df_cap=2).collect()}
    assert set(out) == {1}
    assert out[1]["b_id"] == 10 and out[1]["is_match"] == 1


def test_blocked_er_tie_breaks_by_b_id(spark):
    from codebased_spark.link.er import blocked_er

    a = _recs(spark, [(1, "rho sigma")])
    b = _recs(spark, [(21, "rho sigma"), (20, "sigma rho")])  # same Jaccard
    out = blocked_er(a, b).collect()
    assert len(out) == 1 and out[0]["b_id"] == 20
