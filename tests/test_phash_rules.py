"""Perceptual-hash image dedup (media/phash.py) + horn-rule mining
(graph/rules.py)."""

import pytest
from pyspark.sql import functions as F


def _docs(spark, n=64):
    return spark.createDataFrame(
        [(i, 20 + i % 7) for i in range(n)], ["doc_id", "n_chars"]
    )


def test_average_hash_roundtrip_matches_plant():
    # the aHash of a built image must equal the arithmetic plant
    from codebased_spark.media.headers import make_bmp
    from codebased_spark.media.phash import average_hash_hex

    for did in [0, 1, 5, 37, 200, 255 * 4 + 3]:
        b = ((did // 4) % 64) * 4 | 1
        gray = bytes(
            255 if (b >> (y // 2)) & 1 else 0 for y in range(16) for _x in range(16)
        )
        expected = "".join("ff" if (b >> r) & 1 else "00" for r in range(8))
        assert average_hash_hex(make_bmp(gray, 16, 16)) == expected


def test_average_hash_noise_below_pool_resolution_collides():
    # flip a single pixel: the 2x2 block mean moves 63.75, far from the
    # 0/255 extremes, so the hash is unchanged — that's the "perceptual"
    from codebased_spark.media.headers import make_bmp
    from codebased_spark.media.phash import average_hash_hex

    b = 0x55  # rows alternate
    gray = bytearray(
        255 if (b >> (y // 2)) & 1 else 0 for y in range(16) for _x in range(16)
    )
    base = average_hash_hex(make_bmp(bytes(gray), 16, 16))
    gray[3 * 16 + 7] = 0  # one pixel inside a 255-stripe
    assert average_hash_hex(make_bmp(bytes(gray), 16, 16)) == base


def test_phash_clusters_group_consecutive_ids(spark):
    from codebased_spark.media.phash import phash_clusters, synthetic_phash_media

    out = phash_clusters(synthetic_phash_media(_docs(spark, 16))).collect()
    by_id = {r.doc_id: r for r in out}
    # docs 0-3 share (doc_id//4)=0 -> same pattern -> one cluster of 4
    assert by_id[1].cluster_id == 0 and by_id[1].cluster_size == 4
    assert by_id[0].is_survivor == 1 and by_id[1].is_survivor == 0
    # docs 4-7 form the next cluster
    assert by_id[6].cluster_id == 4


def test_horn_rules_planted_confidences(spark):
    from codebased_spark.graph.rules import mine_horn_rules, typed_doc_triples

    rules = mine_horn_rules(typed_doc_triples(_docs(spark, 60))).collect()
    idx = {(r.body_p, r.body_q, r.head_pred): r for r in rules}
    # follows(x,y) ∧ follows(y,z) ⇒ skip2(x,z): exact rule, conf 10000
    r = idx[("follows", "follows", "skip2")]
    assert r.support == r.body_size == 60 and r.conf_bp == 10000
    # follows ∧ skip2 ⇒ skip3 holds only for even x: conf 5000
    r = idx[("follows", "skip2", "skip3")]
    assert r.body_size == 60 and r.support == 30 and r.conf_bp == 5000


def test_horn_rules_min_support_filters(spark):
    from codebased_spark.graph.rules import mine_horn_rules, typed_doc_triples

    t = typed_doc_triples(_docs(spark, 60))
    all_rules = mine_horn_rules(t, min_support=1)
    strong = mine_horn_rules(t, min_support=31)
    assert strong.count() < all_rules.count()
    assert strong.where(F.col("support") < 31).count() == 0
