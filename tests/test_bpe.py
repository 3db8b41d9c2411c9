"""BPE training (textops/bpe.py) vs a pure-Python executable spec."""

from __future__ import annotations

from collections import Counter

from codebased_spark.textops.bpe import bpe_train, top_merge_candidates


def _ref_bpe(texts: list[str], n_merges: int) -> list[tuple[str, str, int]]:
    """Reference BPE (Sennrich et al.): vocabulary-weighted pair counts,
    lexicographic tie-break, left-to-right non-overlapping merge."""
    vocab = Counter()
    for t in texts:
        for w in t.split():
            if w:
                vocab[w] += 1
    words = {w: list(w) for w in vocab}
    merges = []
    for _ in range(n_merges):
        pairs: Counter = Counter()
        for w, syms in words.items():
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += vocab[w]
        if not pairs:
            break
        (a, b), cnt = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        if cnt < 2:
            break
        merges.append((a, b, cnt))
        for w, syms in words.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            words[w] = out
    return merges


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], ["doc_id", "text"]
    )


def test_trainer_matches_reference(spark):
    texts = [
        "low lower lowest low low",
        "new newer newest new newer",
        "widest wide wider new low",
    ]
    got = bpe_train(_docs(spark, texts), n_merges=8)
    assert got == _ref_bpe(texts, 8)
    assert len(got) == 8  # corpus is rich enough to yield all 8


def test_overlapping_occurrences_merge_left_to_right(spark):
    texts = ["aaa aaa aaa"]
    got = bpe_train(_docs(spark, texts), n_merges=2)
    assert got == _ref_bpe(texts, 2)
    # first merge (a,a) cnt=6 (two non-overlapping? no: pair count is
    # positional: 'aaa' has 2 (a,a) positions x 3 occurrences = 6)
    assert got[0] == ("a", "a", 6)
    # after merging left-to-right 'aaa' -> ['aa','a']: next pair (aa, a)
    assert got[1] == ("aa", "a", 3)


def test_census_is_merge_zero(spark):
    texts = ["ab ab cd"]
    rows = top_merge_candidates(_docs(spark, texts), k=2).collect()
    assert [(r.pair, r.cnt) for r in rows] == [("a b", 2), ("c d", 1)]


def test_encode_roundtrip_matches_reference(spark):
    from codebased_spark.textops.bpe import bpe_encode

    texts = ["low lower lowest low low", "new newer newest new newer"]
    merges = _ref_bpe(texts, 5)
    got = {
        r.doc_id: (r.tokens, r.n_tokens)
        for r in bpe_encode(_docs(spark, texts), merges).collect()
    }
    # reference encode: replay merges per word in rank order
    def ref_enc(t):
        out = []
        for w in t.split():
            syms = list(w)
            for a, b, _ in merges:
                nxt, i = [], 0
                while i < len(syms):
                    if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                        nxt.append(a + b); i += 2
                    else:
                        nxt.append(syms[i]); i += 1
                syms = nxt
            out.extend(syms)
        return out

    for i, t in enumerate(texts):
        exp = ref_enc(t)
        assert got[i] == (exp, len(exp))
