"""Product quantization (similarity/pq.py) and sequence packing
(textops/pack.py)."""

from __future__ import annotations

from codebased_spark.similarity.pq import ann_pq_topk, pq_encode, pq_fit
from codebased_spark.textops.pack import pack_sequences


def _two_cluster_emb(spark):
    # ids 0-9 hug the origin, ids 10-19 hug [10.0]*8 — well separated,
    # deterministic jitter so within-cluster vectors are near-identical
    rows = [
        (i, [i * 0.01 + (0.0 if i < 10 else 10.0)] * 8) for i in range(20)
    ]
    return spark.createDataFrame(rows, ["vec_id", "embedding"])


def test_pq_encode_groups_clusters(spark):
    emb = _two_cluster_emb(spark)
    books = pq_fit(emb, m=2, k=2, dim=8, n_iter=3)
    codes = pq_encode(emb, books, dim=8).collect()
    by_id = {r.vec_id: (r.code_0, r.code_1) for r in codes}
    near = {by_id[i] for i in range(10)}
    far = {by_id[i] for i in range(10, 20)}
    assert len(near) == 1 and len(far) == 1 and near != far
    assert all(0 <= c < 2 for pair in by_id.values() for c in pair)


def test_ann_pq_ranks_own_cluster_first(spark):
    emb = _two_cluster_emb(spark)
    out = ann_pq_topk(emb, query_id=0, topk=12, m=2, k=2, dim=8, n_iter=3).collect()
    ids = [r.vec_id for r in out]
    # the 9 same-cluster vectors (identical codes -> minimal ADC, id
    # tie-break) come first, then the far cluster at strictly larger ADC
    assert ids[:9] == list(range(1, 10))
    assert out[0].adc_dist < out[9].adc_dist
    assert all(r.vec_id >= 10 for r in out[9:])


def test_ann_pq_retrieves_planted_twin(spark):
    # 64 deterministic pseudo-random 64-dim vectors plus one planted
    # near-copy of the query: ADC must rank the twin #1. This is the
    # practically relevant property at 100 TB (near-dup retrieval);
    # top-k ORDER on isotropic noise is measured in BENCH.md instead.
    def vec(i):
        return [(((i * 37 + j * 11 + (i * j) % 7) % 13) - 6) / 6.0 for j in range(64)]

    rows = [(i, vec(i)) for i in range(64)]
    rows.append((999, [x + 0.001 for x in vec(0)]))
    emb = spark.createDataFrame(rows, ["vec_id", "embedding"])
    out = ann_pq_topk(emb, query_id=0, topk=5, m=4, k=16, dim=64, n_iter=3).collect()
    assert out[0].vec_id == 999


def test_pack_sequences_span_arithmetic(spark):
    docs = spark.createDataFrame(
        [(1, 5), (2, 3), (3, 10), (4, 0)], ["doc_id", "n_tokens"]
    )
    rows = pack_sequences(docs, seq_len=8, n_shards=1).collect()
    got = {(r.doc_id, r.pack_id): (r.tok_from, r.n_tok) for r in rows}
    # stream: d1 tokens [0,5), d2 [5,8), d3 [8,18); d4 empty -> no span
    assert got == {
        (1, 0): (0, 5),
        (2, 0): (0, 3),
        (3, 1): (0, 8),  # fills pack 1 exactly
        (3, 2): (8, 2),  # spills 2 tokens into pack 2
    }
    assert all(r.shard == 0 for r in rows)


def test_pack_sequences_shards_are_independent(spark):
    docs = spark.createDataFrame(
        [(i, 4) for i in range(10)], ["doc_id", "n_tokens"]
    )
    rows = pack_sequences(docs, seq_len=8, n_shards=2).collect()
    # each shard holds 5 docs x 4 tokens = 20 tokens -> packs 0,1,2
    for s in (0, 1):
        spans = sorted(
            (r.doc_id, r.pack_id, r.tok_from, r.n_tok)
            for r in rows
            if r.shard == s
        )
        assert sum(n for *_, n in spans) == 20
        assert {p for _, p, _, _ in spans} == {0, 1, 2}
