"""r4 ninth-continuation operators: skyline, zone maps, vacuum plan,
PII proximity, split leakage, Q/A mining, EXIF decode."""

import pytest


def _write_docs(spark, tmp_path, rows):
    spark.createDataFrame(
        rows, ["doc_id", "text", "lang", "source", "n_chars"]
    ).write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")


# ---------------------------------------------------------------------------
# q_skyline
# ---------------------------------------------------------------------------


def test_skyline_dominance_invariant(spark, tmp_path):
    # user 1: 4 events on 1 day; user 2: 2 events on 2 days;
    # user 3: 1 event 1 day (dominated by both); user 4: 4 events 1 day
    # (ties user 1 -> both skyline: equal points don't dominate)
    import datetime as dt

    def ev(eid, uid, day):
        return (eid, dt.datetime(2024, 1, day), uid, "view", 1.0, "{}")

    rows = [ev(i, 1, 1) for i in range(4)]
    rows += [ev(10, 2, 1), ev(11, 2, 2)]
    rows += [ev(20, 3, 1)]
    rows += [ev(30 + i, 4, 1) for i in range(4)]
    spark.createDataFrame(
        rows, ["event_id", "ts", "user_id", "event_type", "value", "props"]
    ).write.mode("overwrite").parquet(f"{tmp_path}/events.parquet")

    from codebased_spark.dataops import q_skyline

    got = {r.user_id: (r.n_events, r.n_days)
           for r in q_skyline(spark, str(tmp_path)).collect()}
    assert got == {1: (4, 1), 2: (2, 2), 4: (4, 1)}
    # invariant: no returned point strictly dominated by another returned one
    pts = list(got.values())
    for p in pts:
        assert not any(
            q[0] >= p[0] and q[1] >= p[1] and q != p and (q[0] > p[0] or q[1] > p[1])
            for q in pts
        )


# ---------------------------------------------------------------------------
# kg_zone_maps
# ---------------------------------------------------------------------------


def test_zone_maps_never_skip_a_match(spark, tmp_path):
    # 250 docs with n_chars = doc_id: after the length-clustered rewrite
    # files 0-2 hold n_chars < 250 ... only file holding >= 400 matches
    _write_docs(spark, tmp_path,
                [(i, "t", "en", "src0", i + 300) for i in range(250)])

    from codebased_spark.dataops import kg_zone_maps

    rows = {r.file_id: r for r in kg_zone_maps(spark, str(tmp_path)).collect()}
    assert len(rows) == 3  # 100 + 100 + 50
    # zone-map soundness: a skippable file must contain zero matches
    for r in rows.values():
        if r.can_skip:
            assert r.n_match == 0
        if r.n_match > 0:
            assert r.can_skip == 0
    # file 0 spans 300..399 -> skippable; file 1 spans 400..499 -> not
    assert rows[0].can_skip == 1 and rows[0].max_chars == 399
    assert rows[1].can_skip == 0 and rows[1].n_match == 100


# ---------------------------------------------------------------------------
# kg_vacuum_plan
# ---------------------------------------------------------------------------


def test_vacuum_keeps_latest_and_counts_bytes(spark, tmp_path):
    # url group = doc_id % 10; group 0 ids {0, 10, 50}: latest 50 kept,
    # cutoff 50-25=25 -> 0 and 10 deletable, 50 never
    _write_docs(spark, tmp_path,
                [(i, "x" * (i + 1), "en", "src0", i + 1) for i in (0, 10, 50)])

    from codebased_spark.dataops import kg_vacuum_plan

    [r] = kg_vacuum_plan(spark, str(tmp_path)).collect()
    assert r.kept_doc_id == 50 and r.n_captures == 3
    assert r.n_deletable == 2
    assert r.bytes_reclaimed == 1 + 11  # lengths of docs 0 and 10


# ---------------------------------------------------------------------------
# tx_pii_proximity
# ---------------------------------------------------------------------------


def test_pii_proximity_gap_and_flag(spark, tmp_path):
    _write_docs(spark, tmp_path, [
        (5, "t", "en", "src0", 1),    # gap 2*5+1 = 11 -> risky
        (39, "t", "en", "src1", 1),   # gap 79 -> safe
    ])

    from codebased_spark.dataops import tx_pii_proximity

    got = {r.doc_id: (r.gap_chars, r.is_risky)
           for r in tx_pii_proximity(spark, str(tmp_path)).collect()}
    assert got == {5: (11, 1), 39: (79, 0)}


# ---------------------------------------------------------------------------
# tx_split_leakage
# ---------------------------------------------------------------------------


def test_split_leakage_finds_only_cross_split_hashes(spark, tmp_path):
    # doc_id % 5 == 0 docs share template text regardless of host; unique
    # texts never leak. src0/src1 hash to different splits (checked below).
    rows = [(i, f"unique text {i}", "en", f"src{i % 2}", 20) for i in range(40)]
    _write_docs(spark, tmp_path, rows)

    from codebased_spark.dataops import tx_split_leakage

    out = tx_split_leakage(spark, str(tmp_path)).collect()
    import hashlib

    def split(source):
        h = hashlib.md5(f"{source}.example.org:split".encode()).hexdigest()
        return "train" if int(h[:15], 16) % 10 < 8 else "eval"

    splits = {split(f"src{k}") for k in range(2)}
    if len(splits) == 1:
        assert out == []  # both hosts in one split: nothing can leak
    else:
        # templates 0..2 appear on both hosts -> exactly those leak
        assert len(out) == 3
        assert all(r.n_train > 0 and r.n_eval > 0 for r in out)


# ---------------------------------------------------------------------------
# tx_qa_pairs (module path: misalignment handling)
# ---------------------------------------------------------------------------


def test_qa_pairs_keeps_aligned_prefix(spark):
    from codebased_spark.textops.qa import qa_pairs

    docs = spark.createDataFrame(
        [
            (1, "Q: One? A: First. Q: Two? A: Second."),
            (2, "Q: Only? no answer marker here"),  # 1 Q, 0 A -> dropped
            (3, "Q: Has? A: Yes. Q: Tail question, no answer?"),
        ],
        ["doc_id", "text"],
    )
    got = sorted(
        (r.doc_id, r.pair_idx, r.question, r.answer)
        for r in qa_pairs(docs).collect()
    )
    assert got == [
        (1, 1, "One?", "First."),
        (1, 2, "Two?", "Second."),
        (3, 1, "Has?", "Yes."),
    ]


def test_qa_pairs_mid_document_orphan_never_misaligns(spark):
    """ADVICE r4: an unanswered question (or orphan answer) MID-document
    must drop only that cue — positional zipping of independent Q/A lists
    would pair every later answer with the wrong question."""
    from codebased_spark.textops.qa import qa_pairs
    from codebased_spark.udtfs import register_udtfs

    register_udtfs(spark)
    docs = spark.createDataFrame(
        [
            (1, "Q: One? A: First. Q: Orphan, skipped? Q: Three? A: Third."),
            (2, "A: Stray answer first. Q: Real? A: Yes."),
        ],
        ["doc_id", "text"],
    )
    got = sorted(
        (r.doc_id, r.pair_idx, r.question, r.answer)
        for r in qa_pairs(docs).collect()
    )
    assert got == [
        (1, 1, "One?", "First."),
        (1, 2, "Three?", "Third."),
        (2, 1, "Real?", "Yes."),
    ]
    docs.createOrReplaceTempView("qa_orphan_docs")
    via_sql = sorted(
        (r.doc_id, r.pair_idx, r.question, r.answer)
        for r in spark.sql(
            "SELECT d.doc_id, q.* FROM qa_orphan_docs d, LATERAL qa_pairs(d.text) q"
        ).collect()
    )
    assert via_sql == got


# ---------------------------------------------------------------------------
# EXIF
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("big_endian", [False, True])
def test_exif_roundtrip(big_endian):
    from codebased_spark.media.headers import (
        make_jpeg_exif,
        parse_exif,
        parse_jpeg,
    )

    b = make_jpeg_exif(320, 200, "camX", 7, big_endian=big_endian)
    assert parse_exif(b) == ("camX", 7, "MM" if big_endian else "II")
    # APP1 insertion must not break the SOF dimension walk
    assert parse_jpeg(b) == (320, 200)
    # inline (<= 4 byte) ASCII value path
    b2 = make_jpeg_exif(8, 8, "ab", 1, big_endian=big_endian)
    assert parse_exif(b2)[0] == "ab"


def test_exif_missing_app1_raises():
    from codebased_spark.media.headers import make_jpeg, parse_exif

    with pytest.raises(ValueError, match="no Exif"):
        parse_exif(make_jpeg(4, 4))


def test_exif_spark_stage(spark, tmp_path):
    _write_docs(spark, tmp_path,
                [(i, "t", "en", "src0", 1) for i in (0, 1, 7, 12)])

    from codebased_spark.dataops import mm_exif

    got = {r.doc_id: (r.camera_make, r.orientation, r.byte_order)
           for r in mm_exif(spark, str(tmp_path)).collect()}
    assert got[0] == ("cam0", 1, "II")
    assert got[1] == ("cam1", 2, "MM")
    assert got[7] == ("cam2", 8, "MM")
    assert got[12] == ("cam2", 5, "II")


# ---------------------------------------------------------------------------
# property tests: EXIF round-trip over seeded randomized inputs
# ---------------------------------------------------------------------------


def test_exif_roundtrip_property():
    """Seeded sweep: arbitrary ASCII makes (incl. the <=4-byte inline
    encoding boundary at len 3, since count includes the NUL), all 8
    orientations, both byte orders — parse must invert make byte-for-byte."""
    import random

    from codebased_spark.media.headers import make_jpeg_exif, parse_exif

    rng = random.Random(42)
    alphabet = "abcdefghijklmnopqrstuvwxyz0123456789 -_"
    for _ in range(200):
        make = "".join(rng.choice(alphabet) for _ in range(rng.randint(0, 12)))
        orient = rng.randint(0, 65535)
        be = rng.random() < 0.5
        w, h = rng.randint(1, 65535), rng.randint(1, 65535)
        got = parse_exif(make_jpeg_exif(w, h, make, orient, big_endian=be))
        assert got == (make, orient, "MM" if be else "II"), (make, orient, be)


def test_qa_pairs_property(spark):
    """Seeded sweep: random well-formed Q/A sequences rendered to text are
    recovered exactly, in order, by the extraction pass."""
    import random

    from codebased_spark.textops.qa import qa_pairs

    rng = random.Random(7)
    words = ["how", "why", "when", "setup", "install", "the", "tool", "works"]
    docs, expected = [], []
    for did in range(40):
        n = rng.randint(0, 4)
        parts = []
        for i in range(n):
            q = " ".join(rng.sample(words, rng.randint(1, 3))) + "?"
            a = " ".join(rng.sample(words, rng.randint(1, 4))).capitalize() + "."
            parts.append(f"Q: {q} A: {a}")
            expected.append((did, i + 1, q, a))
        docs.append((did, " ".join(parts)))
    got = sorted(
        (r.doc_id, r.pair_idx, r.question, r.answer)
        for r in qa_pairs(spark.createDataFrame(docs, ["doc_id", "text"])).collect()
    )
    assert got == sorted(expected)


# ---------------------------------------------------------------------------
# wave 2: word co-occurrence, quantized bigram LM, charset cascade
# ---------------------------------------------------------------------------


def test_word_cooc_offsets(spark, tmp_path):
    # "a b c" x3 docs -> (a,b,1)x3 (b,c,1)x3 (a,c,2)x3; singleton doc
    # contributes pairs below min-count that must be cut
    rows = [(i, "a b c", "en", "src0", 5) for i in range(3)]
    rows.append((9, "z q", "en", "src0", 3))
    _write_docs(spark, tmp_path, rows)

    from codebased_spark.dataops import tx_word_cooc

    got = {(r.w1, r.w2, r.dist): r.n
           for r in tx_word_cooc(spark, str(tmp_path)).collect()}
    assert got == {("a", "b", 1): 3, ("b", "c", 1): 3, ("a", "c", 2): 3}


def test_bigram_lm_score_exact(spark):
    # corpus: "a b" x4 and "a c" x1 -> U(a)=5, B(a b)=4, B(a c)=1
    # BL(5)=3, BL(4)=3, BL(1)=1 -> "a b" doc: 0; "a c" doc: 2
    from codebased_spark.textops.lmscore import bigram_lm_score

    docs = spark.createDataFrame(
        [(i, "a b") for i in range(4)] + [(9, "a c")], ["doc_id", "text"]
    )
    got = {r.doc_id: (r.n_bigrams, r.nlp_q2, r.avg_nlp_bp)
           for r in bigram_lm_score(docs).collect()}
    assert got[0] == (1, 0, 0)
    assert got[9] == (1, 2, 20000)
    # rarer continuations never score lower (monotone in counts)
    assert got[9][1] > got[0][1]


def test_charset_cascade_precedence(spark):
    from codebased_spark.extract.charset import BOM, charset_cascade

    pages = spark.createDataFrame(
        [
            # BOM beats a conflicting header and meta
            (1, BOM + '<meta charset="koi8-r">', "text/html; charset=latin-1"),
            # header beats meta; conflict flagged
            (2, "<META CHARSET='UTF-8'>", "text/html; CHARSET=Shift_JIS"),
            # meta only — uppercase tag, no quotes
            (3, "<META data-x=1 CHARSET=EUC-KR>", "text/html"),
            # nothing -> default
            (4, "<p>plain</p>", "application/octet-stream"),
        ],
        ["doc_id", "html_text", "content_type"],
    )
    got = {r.doc_id: (r.charset, r.charset_source, r.charset_conflict)
           for r in charset_cascade(pages).collect()}
    assert got[1] == ("utf-8", "bom", 1)
    assert got[2] == ("shift_jis", "header", 1)
    assert got[3] == ("euc-kr", "meta", 0)
    assert got[4] == ("utf-8", "default", 0)


# ---------------------------------------------------------------------------
# wave 3: readability, tech fingerprint, degree histogram
# ---------------------------------------------------------------------------


def test_readability_exact_counts(spark, tmp_path):
    # "the cat sat. the dog ran away!" -> 7 words, 2 sentences,
    # syllable groups: e,a,a,e,o,a,a-ay -> vowel-group count 8
    _write_docs(spark, tmp_path,
                [(1, "the cat sat. the dog ran away!", "en", "src0", 30)])

    from codebased_spark.dataops import tx_readability

    [r] = tx_readability(spark, str(tmp_path)).collect()
    assert (r.n_words, r.n_sentences, r.n_syllables) == (7, 2, 8)
    assert r.fk_x100 == 39 * 7 // 2 + 1180 * 8 // 7 - 1559


def test_tech_patterns_attribute_order_free(spark):
    from codebased_spark.extract.tech import tech_signals

    pages = spark.createDataFrame(
        [
            (1, '<meta name="generator" content="WordPress 6.4">'),
            (2, "<META CONTENT='WordPress' NAME='Generator'>"),  # reversed
            (3, '<script src="/WP-Content/x.js"></script>'),
            (4, "<meta name='generator' content='Drupal 10'>"),
            (5, '<img src="https://cdn.shopify.com/a.png">'),
            (6, "<meta name='description' content='wordpress tips'>"),  # no
            (7, "<p>plain page</p>"),
        ],
        ["doc_id", "html_text"],
    )
    got = {(r.doc_id, r.tech) for r in tech_signals(pages).collect()}
    assert got == {
        (1, "wordpress"), (2, "wordpress"), (3, "wordpress"),
        (4, "drupal"), (5, "shopify"),
    }


def test_degree_histogram_buckets(spark, tmp_path):
    # star graph via the _doc_edges fixture is indirect; check bucket
    # math on the registered query instead: buckets are bit_length(d)
    _write_docs(spark, tmp_path,
                [(i, "t", "en", "src0", 100 + i) for i in range(24)])

    from codebased_spark.dataops import g_degree_histogram

    rows = g_degree_histogram(spark, str(tmp_path)).collect()
    out_total = sum(r.n_nodes for r in rows if r.direction == "out")
    # every doc has >= 1 out-edge (the chord edge is unconditional)
    assert out_total == 24
    assert all(r.bucket >= 1 for r in rows)


def test_csr_layout_invariants(spark, tmp_path):
    _write_docs(spark, tmp_path,
                [(i, "t", "en", "src0", 100 + i) for i in range(30)])

    from codebased_spark.dataops import kg_csr_layout

    rows = sorted(kg_csr_layout(spark, str(tmp_path)).collect(),
                  key=lambda r: r.node)
    # offsets are the exact running sum of degrees in node order
    running = 0
    for r in rows:
        assert r.csr_offset == running
        running += r.degree
        assert len(r.neighbors.split(",")) == r.degree
    # total offset span == edge count
    from codebased_spark.dataops import _doc_edges
    assert running == _doc_edges(spark, str(tmp_path)).count()


# ---------------------------------------------------------------------------
# wave 5: stratified sampling, code fences, SRT captions
# ---------------------------------------------------------------------------


def test_stratified_sample_rates(spark, tmp_path):
    # 400 en + 400 fr: en keeps ~25/256 (~9.8%), fr ~128/256 (50%);
    # exact membership is the hash predicate — check determinism + rough
    # stratum proportions + rate_n metadata
    rows = [(i, "t", "en" if i < 400 else "fr", "src0", 10) for i in range(800)]
    _write_docs(spark, tmp_path, rows)

    from codebased_spark.dataops import tx_stratified_sample

    out = tx_stratified_sample(spark, str(tmp_path)).collect()
    again = tx_stratified_sample(spark, str(tmp_path)).collect()
    assert {r.doc_id for r in out} == {r.doc_id for r in again}  # deterministic
    en = [r for r in out if r.lang == "en"]
    fr = [r for r in out if r.lang == "fr"]
    assert all(r.rate_n == 25 for r in en) and all(r.rate_n == 128 for r in fr)
    assert 15 <= len(en) <= 70        # ~39 expected
    assert 140 <= len(fr) <= 260      # ~200 expected


def test_code_fences_extraction(spark):
    from codebased_spark.textops.codedetect import code_fences

    docs = spark.createDataFrame(
        [
            (1, "intro\n```python\na = 1\nb = 2\n```\nmiddle\n```\nx\n```"),
            (2, "no fences here"),
            (3, "```sql\nSELECT 1\n```"),
        ],
        ["doc_id", "text"],
    )
    got = sorted(
        (r.doc_id, r.fence_idx, r.lang_tag, r.n_lines, r.n_chars)
        for r in code_fences(docs).collect()
    )
    assert got == [
        (1, 1, "python", 2, 12),  # "a = 1\nb = 2\n"
        (1, 2, "plain", 1, 2),    # "x\n"
        (3, 1, "sql", 1, 9),      # "SELECT 1\n"
    ]


def test_srt_parser_drops_malformed_cues(spark):
    from codebased_spark.media.captions import parse_srt

    srt = (
        "1\n00:00:01,000 --> 00:00:02,500\nhello there\n\n"
        "garbage block without timestamps\n\n"
        "2\n01:02:03,250 --> 01:02:04,000\nsecond cue"
    )
    docs = spark.createDataFrame([(7, srt)], ["doc_id", "srt"])
    got = sorted(
        (r.cue_idx, r.start_ms, r.end_ms, r.dur_ms, r.caption)
        for r in parse_srt(docs).collect()
    )
    assert got == [
        (1, 1000, 2500, 1500, "hello there"),
        (2, 3723250, 3724000, 750, "second cue"),
    ]


# ---------------------------------------------------------------------------
# wave 6: Zipf histogram, ID3v1 tags
# ---------------------------------------------------------------------------


def test_term_zipf_buckets(spark, tmp_path):
    # "a" appears 9x (bucket BL(9)=4), "b" 2x (bucket 2), "c" 1x (bucket 1)
    _write_docs(spark, tmp_path, [
        (1, "a a a a a a a a a", "en", "src0", 17),
        (2, "b b c", "en", "src0", 5),
    ])

    from codebased_spark.dataops import tx_term_zipf

    got = {r.bucket: (r.n_terms, r.n_instances)
           for r in tx_term_zipf(spark, str(tmp_path)).collect()}
    assert got == {4: (1, 9), 2: (1, 2), 1: (1, 1)}


def test_id3v1_roundtrip_property():
    import random

    from codebased_spark.media.headers import make_mp3_id3v1, parse_id3v1

    rng = random.Random(11)
    for _ in range(100):
        title = "".join(rng.choice("abc xyz09") for _ in range(rng.randint(0, 30)))
        artist = "".join(rng.choice("qrs tuv") for _ in range(rng.randint(0, 30)))
        genre = rng.randint(0, 255)
        got = parse_id3v1(make_mp3_id3v1(title, artist, genre))
        assert got == (title.rstrip("\x00"), artist.rstrip("\x00"), genre)


def test_id3_spark_stage(spark, tmp_path):
    _write_docs(spark, tmp_path,
                [(i, "t", "en", "src0", 1) for i in (0, 5, 24)])

    from codebased_spark.dataops import mm_id3_tags

    got = {r.doc_id: (r.title, r.artist, r.genre)
           for r in mm_id3_tags(spark, str(tmp_path)).collect()}
    assert got[0] == ("song title 0", "artist 0", 0)
    assert got[5] == ("song title 5", "artist 5", 5)
    assert got[24] == ("song title 1", "artist 2", 24)


def test_skyline_matches_bruteforce_on_random_points(spark, tmp_path):
    """Seeded randomized check: 40 users with random (n_events, n_days)
    profiles; the registered window-based skyline must equal the
    brute-force dominance filter computed in Python."""
    import datetime as dt
    import random

    rng = random.Random(99)
    rows, pts = [], {}
    eid = 0
    for uid in range(40):
        d = rng.randint(1, 6)           # distinct active days
        extra = rng.randint(0, 5)       # events beyond one per day
        days = rng.sample(range(1, 25), d)
        evs = [dt.datetime(2024, 1, day) for day in days]
        evs += [dt.datetime(2024, 1, rng.choice(days)) for _ in range(extra)]
        for ts in evs:
            rows.append((eid, ts, uid, "view", 1.0, "{}"))
            eid += 1
        pts[uid] = (len(evs), d)
    spark.createDataFrame(
        rows, ["event_id", "ts", "user_id", "event_type", "value", "props"]
    ).write.mode("overwrite").parquet(f"{tmp_path}/events.parquet")

    from codebased_spark.dataops import q_skyline

    got = {r.user_id for r in q_skyline(spark, str(tmp_path)).collect()}
    expected = {
        u for u, p in pts.items()
        if not any(
            q[0] >= p[0] and q[1] >= p[1] and (q[0] > p[0] or q[1] > p[1])
            for q in pts.values()
        )
    }
    assert got == expected


# ---------------------------------------------------------------------------
# wave 7: decode quarantine, RDF patch
# ---------------------------------------------------------------------------


def test_quarantine_isolates_poison_payloads(spark, tmp_path):
    _write_docs(spark, tmp_path,
                [(i, "t", "en", "src0", 1) for i in range(20)])

    from codebased_spark.dataops import mm_decode_quarantine

    got = {r.media_type: (r.n_ok, r.n_failed)
           for r in mm_decode_quarantine(spark, str(tmp_path)).collect()}
    # doc 0 (image) and doc 13 (audio) are corrupted in range(20)
    assert got["image"] == (6, 1)
    assert got["audio"] == (6, 1)
    assert got["video"] == (6, 0)


def test_quarantine_rows_carry_error_class(spark, tmp_path):
    from pyspark.sql import functions as F

    from codebased_spark.media.decode import (
        media_metadata_quarantine,
        synthetic_real_media,
    )

    _write_docs(spark, tmp_path, [(0, "t", "en", "src0", 1),
                                  (1, "t", "en", "src0", 1)])
    docs = spark.read.parquet(f"{tmp_path}/documents.parquet")
    media = synthetic_real_media(docs).withColumn(
        "payload",
        F.when(F.col("doc_id") == 0, F.lit(bytes([9, 9]))).otherwise(
            F.col("payload")
        ),
    )
    got = {r.doc_id: r for r in media_metadata_quarantine(media).collect()}
    assert got[0].status == "error" and got[0].error != ""
    assert got[1].status == "ok" and got[1].duration_ms > 0


def test_rdf_patch_changed_url_has_add_and_delete(spark, tmp_path):
    # one url (doc_id % 100 == 1) with captures 1, 101, 201: curr latest
    # is 201; prev excludes %3==0 (201) -> prev latest 101 with different
    # text -> status 'changed' -> exactly one A and one D line
    _write_docs(spark, tmp_path, [
        (1, "body v1", "en", "src0", 7),
        (101, "body v2", "en", "src0", 7),
        (201, "body v3", "en", "src0", 7),
    ])

    from codebased_spark.dataops import kg_rdf_patch

    rows = kg_rdf_patch(spark, str(tmp_path)).collect()
    ops = sorted(r.op for r in rows)
    assert ops == ["A", "D"]
    for r in rows:
        assert r.line.startswith("<urn:kg:https://recrawl.example.org/page/1>")
        assert r.line.endswith('" .')


def test_json_schema_inference(spark, tmp_path):
    _write_docs(spark, tmp_path,
                [(i, "t", "en", "src0", 1) for i in range(12)])

    from codebased_spark.dataops import tx_json_schema

    got = {(r.key, r.vtype): (r.n_rows, r.coverage_bp)
           for r in tx_json_schema(spark, str(tmp_path)).collect()}
    assert got[("id", "number")] == (12, 10000)
    assert got[("name", "string")] == (12, 10000)
    assert got[("tags", "array")] == (4, 3333)   # doc_id % 3 == 0
    assert got[("hot", "boolean")] == (12, 10000)


def test_phonetic_key_groups_spelling_variants(spark):
    from pyspark.sql import functions as F

    from codebased_spark.link.phonetic import phonetic_key

    names = ["Johnson", "Jonson", "Jansen", "Meyer", "Meier", "Mayer",
             "Smith", "Smyth", "Robert", "Rupert", "", "42"]
    df = spark.createDataFrame([(n,) for n in names], ["surface"])
    got = dict(
        (r.surface, r.k)
        for r in df.select("surface", phonetic_key(F.col("surface")).alias("k")).collect()
    )
    assert got["Johnson"] == got["Jonson"] == got["Jansen"] == "J525"
    assert got["Meyer"] == got["Meier"] == got["Mayer"] == "M600"
    assert got["Smith"] == got["Smyth"] == "S530"
    # the classic Soundex demo pair
    assert got["Robert"] == got["Rupert"] == "R163"
    assert got[""] == "" and got["42"] == ""


def test_value_histogram_equiwidth(spark, tmp_path):
    import datetime as dt

    rows = [(i, dt.datetime(2024, 1, 1), 1, "view", float(v), "{}")
            for i, v in enumerate([0.0, 1.0, 2.0, 15.9, 16.0])]
    # lo=0 hi=16: buckets 0,1,2,15,15 (max value clamps into 15)
    spark.createDataFrame(
        rows, ["event_id", "ts", "user_id", "event_type", "value", "props"]
    ).write.mode("overwrite").parquet(f"{tmp_path}/events.parquet")

    from codebased_spark.dataops import q_value_histogram

    got = {r.bucket: r.n_rows
           for r in q_value_histogram(spark, str(tmp_path)).collect()}
    assert got == {0: 1, 1: 1, 2: 1, 15: 2}
    assert sum(got.values()) == 5  # histogram loses no rows


def test_url_canonicalizer_rules(spark):
    from pyspark.sql import functions as F

    from codebased_spark.extract.urlops import canonicalize_url_col

    cases = {
        # param sort + tracking strip + fragment + port + case
        "HTTPS://WWW.Ex.ORG:443/A/b?z=1&utm_campaign=x&a=2#top":
            "https://www.ex.org/A/b?a=2&z=1",
        # all params tracking -> query dropped entirely
        "https://ex.org/p?utm_source=a&gclid=xyz": "https://ex.org/p",
        # already canonical -> identity
        "https://ex.org/p?a=1&b=2": "https://ex.org/p?a=1&b=2",
        # bare host gains the trailing slash; http default port stripped
        "HTTP://EX.ORG:80": "http://ex.org/",
        # non-default port survives
        "https://ex.org:8443/x": "https://ex.org:8443/x",
    }
    df = spark.createDataFrame([(u,) for u in cases], ["url"])
    got = dict(
        (r.url, r.n)
        for r in df.select("url", canonicalize_url_col(F.col("url")).alias("n")).collect()
    )
    for raw, want in cases.items():
        assert got[raw] == want, (raw, got[raw], want)


def test_heading_outline_parent_resolution(spark):
    from codebased_spark.extract.headings import heading_outline

    # h1 -> h3 (skipping h2): parent is still the h1; second h1 resets
    # scope; trailing h2 parents to the SECOND h1
    html = ("<h1>One</h1><h3>Deep</h3><h1>Two</h1><h2>Under Two</h2>"
            "<h6>Deepest</h6>")
    docs = spark.createDataFrame([(1, html)], ["doc_id", "html_text"])
    got = {r.heading_idx: (r.level, r.title, r.parent_idx)
           for r in heading_outline(docs).collect()}
    assert got == {
        1: (1, "One", None),
        2: (3, "Deep", 1),
        3: (1, "Two", None),
        4: (2, "Under Two", 3),
        5: (6, "Deepest", 4),
    }


def test_fastrp_sums_are_exact_neighbor_sums(spark, tmp_path):
    _write_docs(spark, tmp_path,
                [(i, "t", "en", "src0", 100 + i) for i in range(18)])

    from codebased_spark.dataops import _doc_edges, g_fastrp
    from codebased_spark.dedup.simhash import md5_hash60  # noqa: F401
    import hashlib

    def rvec(node, dim):
        h = hashlib.md5(f"{node}:{dim}:rp".encode()).hexdigest()
        return (int(h[:15], 16) % 2) * 2 - 1

    edges = [(r.src, r.dst)
             for r in _doc_edges(spark, str(tmp_path)).collect()]
    adj = {}
    for s, d in edges:
        adj.setdefault(s, []).append(d)

    got = {(r.node, r.dim): (r.e1, r.e2)
           for r in g_fastrp(spark, str(tmp_path)).collect()}
    # spot-verify every node at dim 0 and 5 against the Python replay
    for node, nbrs in adj.items():
        for dim in (0, 5):
            e1 = sum(rvec(u, dim) for u in nbrs)
            e2 = sum(
                sum(rvec(w, dim) for w in adj.get(u, []))
                for u in nbrs if u in adj
            )
            assert got[(node, dim)] == (e1, e2), (node, dim)


def test_url_canonicalizer_fuzz_vs_reference(spark):
    """Seeded 300-case battery: the Spark canonicalizer must agree with
    an independently-written Python reference of the same documented
    rules (normalize scheme/host case, strip default ports + fragments,
    drop tracking params, sort the rest)."""
    import random
    import re

    from pyspark.sql import functions as F

    from codebased_spark.extract.urlops import canonicalize_url_col

    def ref(url):
        url = re.sub(r"#.*$", "", url)
        m = re.match(r"^([a-zA-Z]+://[^/]*)(.*)$", url)
        head, tail = (m.group(1).lower(), m.group(2)) if m else (url, "")
        u = head + tail
        u = re.sub(r"^(https://[^/:]+):443(?=/|$)", r"\1", u)
        u = re.sub(r"^(http://[^/:]+):80(?=/|$)", r"\1", u)
        if re.match(r"^[a-z]+://[^/]+$", u):
            u += "/"
        if "?" in u:
            path, qs = u.split("?", 1)
            kept = sorted(
                p for p in qs.split("&")
                if p and not re.match(
                    r"^(utm_[a-z]+|gclid|fbclid|msclkid|ref)=", p)
            )
            u = path + ("?" + "&".join(kept) if kept else "")
        return u

    rng = random.Random(321)
    schemes = ["http", "HTTP", "https", "HTTPS"]
    hosts = ["ex.org", "EX.ORG", "www.Ex.Org", "a.b.example.com"]
    ports = ["", ":443", ":80", ":8080"]
    paths = ["", "/", "/A/b", "/p/1"]
    params = ["a=1", "b=2", "z=9", "utm_source=x", "gclid=1", "ref=h", ""]
    frags = ["", "#x", "#frag"]
    urls = []
    for _ in range(300):
        q = "&".join(rng.sample(params, rng.randint(0, 4)))
        urls.append(
            rng.choice(schemes) + "://" + rng.choice(hosts)
            + rng.choice(ports) + rng.choice(paths)
            + ("?" + q if q else "") + rng.choice(frags)
        )
    df = spark.createDataFrame([(u,) for u in urls], ["url"])
    got = {r.url: r.n for r in df.select(
        "url", canonicalize_url_col(F.col("url")).alias("n")).collect()}
    for u in urls:
        assert got[u] == ref(u), (u, got[u], ref(u))


def test_capture_edit_distance_churn(spark, tmp_path):
    # url 0: "aaaa" -> "aaab" (distance 1 over len 4 = 2500bp);
    # url 1: identical recrawl -> distance 0
    _write_docs(spark, tmp_path, [
        (0, "aaaa", "en", "src0", 4), (10, "aaab", "en", "src0", 4),
        (1, "same text", "en", "src0", 9), (11, "same text", "en", "src0", 9),
    ])

    from codebased_spark.dataops import kg_capture_edit_distance

    got = {r.url[-1]: (r.edit_distance, r.churn_bp)
           for r in kg_capture_edit_distance(spark, str(tmp_path)).collect()}
    assert got["0"] == (1, 2500)
    assert got["1"] == (0, 0)


def test_fuzzy_name_matching_precision_inside_blocks(spark, tmp_path):
    _write_docs(spark, tmp_path,
                [(i, "t", "en", "src0", 1) for i in range(16)])

    from codebased_spark.dataops import kg_fuzzy_name_matches

    got = {(r.a, r.b): (r.edit_distance, r.is_match)
           for r in kg_fuzzy_name_matches(spark, str(tmp_path)).collect()}
    assert got[("Johnson", "Jonson")] == (1, 1)     # true variant
    assert got[("Jansen", "Johnson")][1] == 0       # same block, no match
    assert got[("Smith", "Smyth")] == (1, 1)
    # cross-block pairs never even become candidates
    assert ("Meyer", "Smith") not in got and ("Smith", "Meyer") not in got


def test_soft404_needs_phrase_and_thinness(spark, tmp_path):
    long_err = ("this article discusses the 404 error in depth " * 10)
    _write_docs(spark, tmp_path, [
        (11, "placeholder", "en", "src0", 11),   # %11 -> planted error page
        (1, "normal article body text here", "en", "src0", 29),
        # long page MENTIONING 404 is NOT a soft-404 (thinness rule)
        (2, long_err, "en", "src0", len(long_err)),
    ])

    from codebased_spark.dataops import kg_soft404

    [r] = kg_soft404(spark, str(tmp_path)).collect()
    assert (r.n_pages, r.n_soft404) == (3, 1)


def test_page_type_rules(spark, tmp_path):
    _write_docs(spark, tmp_path, [
        (11, "x" * 100, "en", "src0", 100),   # 11 anchors * 40 >= 100 -> index
        (1, "y" * 80, "en", "src0", 80),      # 1*40 < 80, < 120 -> stub
        (1201, "z" * 500, "en", "src0", 500), # 1201%12=1 -> 40 < 500 -> article
    ])

    from codebased_spark.dataops import kg_page_type

    got = {r.page_type: r.n_pages
           for r in kg_page_type(spark, str(tmp_path)).collect()}
    assert got == {"index": 1, "stub": 1, "article": 1}


def test_caption_align_covers_each_cue_twice(spark, tmp_path):
    _write_docs(spark, tmp_path,
                [(i, "t", "en", "src0", 1) for i in (0, 3, 7)])

    from codebased_spark.dataops import mm_caption_align

    rows = mm_caption_align(spark, str(tmp_path)).collect()
    # every (doc, cue) pair aligns exactly 2 grid frames, all in-range
    from collections import Counter

    per_cue = Counter((r.doc_id, r.cue_idx) for r in rows)
    assert set(per_cue.values()) == {2} and len(per_cue) == 6
    for r in rows:
        assert r.frame_ms % 250 == 0
        assert r.caption == f"caption {r.doc_id} cue {r.cue_idx}"


def test_paragraph_chunks_never_split_paragraphs(spark, tmp_path):
    # text of 60+ chars so all 6 planted paragraph slices are non-empty
    _write_docs(spark, tmp_path,
                [(1, "one two three four five six seven eight nine ten "
                     "eleven twelve thirteen", "en", "src0", 73)])

    from codebased_spark.dataops import tx_paragraph_chunks

    rows = sorted(tx_paragraph_chunks(spark, str(tmp_path)).collect(),
                  key=lambda r: r.chunk_id)
    # every paragraph is in exactly one chunk: totals add up
    assert sum(r.n_paras for r in rows) == 6
    # chunk ids are contiguous from 0
    ids = [r.chunk_id for r in rows]
    assert ids == list(range(len(ids)))


def test_component_size_histogram_conserves_nodes(spark, tmp_path):
    _write_docs(spark, tmp_path,
                [(i, "t", "en", "src0", 100 + i) for i in range(24)])

    from codebased_spark.dataops import g_component_size_histogram

    rows = g_component_size_histogram(spark, str(tmp_path)).collect()
    # every node is in exactly one component of one bucket
    assert sum(r.n_nodes_total for r in rows) == 24
    assert all(r.bucket >= 1 and r.n_components >= 1 for r in rows)
