"""Blocking eval: high-similarity pairs must always be candidates
(banding catches s>=0.97 w.p. ~0.9998 — and the md5 family is fixed, so
it is deterministic here), labels must be internally consistent, and the
candidate set must match a pure-Python recompute of the banding."""

from __future__ import annotations

import hashlib

import pytest

from codebased_spark.dedup.lsh_eval import (
    EVAL_BANDS,
    EVAL_K,
    lsh_blocking_eval,
    portable_minhash_candidates,
)

BASE = (
    "alpha beta gamma delta epsilon zeta eta theta iota kappa lamda mu nu "
    "xi omicron pi rho sigma tau upsilon phi chi psi omega one two three"
)


@pytest.fixture(scope="module")
def eval_docs(spark):
    words = BASE.split()
    rows = []
    for i in range(8):
        rot = words[3 * i:] + words[: 3 * i]
        rows.append((i, " ".join(rot)))
    rows.append((100, " ".join(words)))          # identical to doc 0
    rows.append((101, " ".join(words[:-1] + ["CHANGED"])))  # near-dupe of 0
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_high_sim_pairs_are_candidates_and_true(eval_docs):
    out = {(r.doc_a, r.doc_b): r for r in lsh_blocking_eval(
        eval_docs, threshold=0.6
    ).collect()}
    assert (0, 100) in out
    assert out[(0, 100)].is_candidate and out[(0, 100)].is_true_pair
    assert out[(0, 100)].jaccard == 1.0
    assert (0, 101) in out and out[(0, 101)].is_true_pair
    # every emitted row's truth label is consistent with its jaccard
    for r in out.values():
        assert r.is_true_pair == (r.jaccard >= 0.6)
        assert r.is_candidate or r.is_true_pair  # emitted only if either


def test_candidates_match_python_banding(spark, eval_docs):
    got = {
        (r.doc_a, r.doc_b)
        for r in portable_minhash_candidates(eval_docs).collect()
    }

    def h60(s: str) -> int:
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

    def shingles(text: str) -> set[str]:
        toks = [w for w in text.split(" ") if w]
        return {" ".join(toks[i:i + 3]) for i in range(len(toks) - 2)}

    docs = {r.doc_id: r.text for r in eval_docs.collect()}
    r = EVAL_K // EVAL_BANDS
    bands: dict[int, dict[int, int]] = {}
    for d, text in docs.items():
        sh = shingles(text)
        if not sh:
            continue
        mins = [
            min(h60(f"{s}:mh{i}") for s in sh) for i in range(EVAL_K)
        ]
        bands[d] = {
            j: h60(",".join(str(mins[j * r + t]) for t in range(r)))
            for j in range(EVAL_BANDS)
        }
    want = set()
    ids = sorted(bands)
    for ai, a in enumerate(ids):
        for b in ids[ai + 1:]:
            if any(bands[a][j] == bands[b][j] for j in range(EVAL_BANDS)):
                want.add((a, b))
    assert got == want
