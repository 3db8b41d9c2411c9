"""Text-analysis and multimodal operator tests."""

from __future__ import annotations

import hashlib

import pandas as pd
import pytest

from codebased_spark.media.decode import media_from_documents, media_metadata
from codebased_spark.textops.fingerprint import winnow_fingerprints
from codebased_spark.textops.langid import lang_id, train_token_lang
from codebased_spark.textops.quality import doc_quality


@pytest.fixture(scope="module")
def lang_docs(spark):
    rows = [
        (0, "the cat sat on the mat and the dog ran", "en"),
        (1, "the dog and the cat are in the house", "en"),
        (2, "der hund und die katze sind im haus", "de"),
        (3, "die katze sitzt auf der matte und der hund", "de"),
        (4, "le chat et le chien sont dans la maison", "fr"),
    ]
    return spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "text", "lang"]))


def test_lang_id_self_train(lang_docs):
    got = lang_id(lang_docs).toPandas().set_index("doc_id").pred_lang.to_dict()
    assert got == {0: "en", 1: "en", 2: "de", 3: "de", 4: "fr"}


def test_lang_id_with_external_model(spark, lang_docs):
    model = train_token_lang(lang_docs)
    unseen = spark.createDataFrame(
        [(10, "the cat and the dog"), (11, "der hund und die katze")],
        ["doc_id", "text"],
    )
    got = lang_id(unseen, model=model).toPandas().set_index("doc_id").pred_lang.to_dict()
    assert got == {10: "en", 11: "de"}


def test_doc_quality_values(spark):
    df = spark.createDataFrame([(0, "the cat the cat runs")], ["doc_id", "text"])
    row = doc_quality(df).head()
    assert row.n_tokens == 5
    assert row.n_distinct == 3
    assert row.distinct_ratio == 0.6
    assert row.stopword_ratio == 0.4  # 'the' twice / 5
    assert row.mean_tok_len == 3.2  # (3+3+3+3+4)/5
    # score: len 5/100*.25=0.0125 + min(1,0.4*5)*.25=0.25 + 0.6*.25=0.15 + 0.25
    assert row.quality_score == pytest.approx(0.6625)


def test_winnow_shared_substring(spark):
    shared = "one two three four five six seven eight nine ten"
    df = spark.createDataFrame(
        [
            (0, "prefix words here " + shared),
            (1, shared + " totally different ending words"),
            (2, "no overlap with anything else at all whatsoever today"),
        ],
        ["doc_id", "text"],
    )
    fps = winnow_fingerprints(df, k=3, w=4).toPandas()
    by_doc = fps.groupby("doc_id").fingerprint.apply(set)
    # winnowing guarantee: docs sharing a >= w+k-1 token run share a fingerprint
    assert by_doc[0] & by_doc[1]
    assert not (by_doc[0] & by_doc[2])
    assert not (by_doc[1] & by_doc[2])


def test_media_metadata_deterministic(spark):
    docs = spark.createDataFrame(
        [(0, "hello world"), (1, "audio doc"), (2, "video doc"), (3, "x")],
        ["doc_id", "text"],
    )
    out = media_metadata(media_from_documents(docs)).toPandas().set_index("doc_id")
    assert out.loc[0, "media_type"] == "image"
    assert out.loc[1, "media_type"] == "audio"
    assert out.loc[2, "media_type"] == "video"
    h = hashlib.md5(b"hello world").hexdigest()
    assert out.loc[0, "payload_md5"] == h
    assert out.loc[0, "n_bytes"] == 11
    assert out.loc[0, "width"] == 1 + int(h[:4], 16) % 4096
    assert out.loc[0, "height"] == 1 + int(h[4:8], 16) % 4096
    assert out.loc[0, "duration_ms"] == 0
    assert out.loc[1, "width"] == 0 and out.loc[1, "duration_ms"] > 0
    assert out.loc[2, "width"] > 0 and out.loc[2, "duration_ms"] > 0


def test_media_real_decode_is_stubbed(spark):
    docs = spark.createDataFrame([(0, "payload")], ["doc_id", "text"])
    with pytest.raises(Exception, match="NotImplementedError|real image decode"):
        media_metadata(media_from_documents(docs), real=True).collect()


def test_tfidf_top_terms(spark):
    import math

    import pandas as pd

    from codebased_spark.textops.tfidf import tfidf_top_terms

    docs = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": [0, 1, 2],
                "text": [
                    "apple apple banana common",
                    "banana cherry common",
                    "common common common",
                ],
            }
        )
    )
    got = tfidf_top_terms(docs, k=2).toPandas()
    top = {r.doc_id: r.term for r in got[got["rank"] == 1].itertuples()}
    # rare repeated terms beat ubiquitous ones
    assert top[0] == "apple" and top[1] == "cherry" and top[2] == "common"
    row = got[(got.doc_id == 0) & (got.term == "apple")].iloc[0]
    expected = 2 * (math.log(4 / 2) + 1.0)
    assert abs(row.tfidf - round(expected, 4)) < 1e-9


def test_decontaminate_flags_benchmark_overlap(spark):
    """A doc sharing a long substring with a benchmark doc is flagged;
    unrelated docs are clean (winnowing guarantees detection of shared
    substrings >= w+k-1 tokens)."""
    from codebased_spark.textops.decontaminate import decontaminate

    bench_text = "the quick brown fox jumps over the lazy dog every single day"
    rows = [
        (0, bench_text),                                   # the benchmark item
        (1, "prefix words " + bench_text + " suffix tail"),  # contaminated
        (2, "completely different content about spark partitions and shuffles"),
    ]
    docs = spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "text"]))
    bench = docs.where("doc_id = 0")
    got = {r.doc_id: r for r in decontaminate(docs, bench, threshold=0.5).collect()}
    assert got[0].contaminated == 1 and got[0].overlap == 1.0
    assert got[1].contaminated == 1 and got[1].n_hit > 0
    assert got[2].contaminated == 0 and got[2].n_hit == 0


def test_redact_patterns(spark):
    from codebased_spark.extract.patterns import redact_patterns

    rows = [
        (0, "mail a@b.com and c.d@e.org on 2024-12-31 for $5"),
        (1, "no pii here at all"),
    ]
    docs = spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "text"]))
    got = {r.doc_id: r for r in redact_patterns(docs).collect()}
    assert got[0].redacted == "mail [EMAIL] and [EMAIL] on [DATE] for [MONEY]"
    assert (got[0].n_email, got[0].n_iso_date, got[0].n_money) == (2, 1, 1)
    assert got[1].redacted == "no pii here at all"
    assert (got[1].n_email, got[1].n_iso_date, got[1].n_money) == (0, 0, 0)


def test_repetition_metrics_hand_computed(spark):
    from codebased_spark.textops.repetition import repetition_metrics

    rows = [
        # "ha ha ha ha": bigrams = [ha ha]x3 -> top 3/3 = 1.0;
        # 5-grams: none (4 words) -> 0.0; flagged by the bigram rule.
        (0, "ha ha ha ha"),
        # 10 distinct words: every bigram unique -> 1/9; no dup 5-gram.
        (1, "one two three four five six seven eight nine ten"),
        # a 5-word phrase repeated 3x (period-5 string): top bigram
        # "a b" 3/14; all 11 5-grams are cyclic shifts each appearing
        # >=2 times -> dup 11/11 = 1.0; flagged by the 5-gram rule.
        (2, "a b c d e a b c d e a b c d e"),
        (3, "   "),  # whitespace-only: dropped entirely
    ]
    got = {
        r.doc_id: r
        for r in repetition_metrics(
            spark.createDataFrame(rows, ["doc_id", "text"])
        ).collect()
    }
    assert set(got) == {0, 1, 2}
    assert got[0].n_words == 4
    assert got[0].top_bigram_frac == 1.0 and got[0].dup_5gram_frac == 0.0
    assert got[0].is_repetitive == 1
    assert got[1].top_bigram_frac == round(1 / 9, 4)
    assert got[1].dup_5gram_frac == 0.0 and got[1].is_repetitive == 0
    assert got[2].top_bigram_frac == round(3 / 14, 4)
    assert got[2].dup_5gram_frac == 1.0
    assert got[2].is_repetitive == 1


def test_entity_pmi_hand_computed(spark, tmp_path):
    """kg_entity_pmi on a 4-doc corpus with known marginals.

    docs: {spark,join} {spark,join} {spark} {filter}; N=4.
    pair (join,spark): n_docs=2, c(spark)=3, c(join)=2
    -> lift = 2*4/(3*2) = 4/3, pmi = ln(4/3).
    """
    import math

    from codebased_spark.graph.queries import kg_entity_pmi, with_pmi

    rows = [
        (0, "spark join"), (1, "join spark runs"),
        (2, "spark only here"), (3, "filter alone"),
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    sf = str(tmp_path)
    docs.write.parquet(f"{sf}/documents.parquet")
    got = {
        (r.src, r.dst): r
        for r in with_pmi(kg_entity_pmi(spark, sf)).collect()
    }
    key = ("ent:concept:spark", "ent:op:join")  # src < dst lexicographically
    assert set(got) == {key}
    r = got[key]
    assert r.n_docs == 2
    assert r.lift == round(4 / 3, 4)
    # pmi is ln(rounded lift): tolerance-checked, excluded from the exact
    # cross-engine hash gate (transcendental; ADVICE r3)
    assert abs(r.pmi - math.log(round(4 / 3, 4))) < 1e-9


def test_filter_decisions_every_rule(spark):
    from codebased_spark.textops.filters import filter_decisions

    good = ("the good and long document of the day with is for on many fine "
            "words in a row here now then")  # >5 tokens, stopwordy, diverse
    rows = [
        (0, good, "en"),                      # keeps
        (1, good, "de"),                      # r_lang
        (2, "tiny doc", "en"),                # r_short (2 tokens)
        (3, "", "en"),                        # r_short via empty (no q row)
        (4, "zz qq xx ww vv uu tt ss", "en"),  # r_quality: no stopwords
        (5, "ha ha ha ha ha ha ha ha", "en"),  # r_repetitive (+quality)
        (6, good, "en"),                      # r_dup of doc 0
    ]
    got = {
        r.doc_id: r
        for r in filter_decisions(
            spark.createDataFrame(rows, ["doc_id", "text", "lang"])
        ).collect()
    }
    assert got[0].keep == 1 and got[0].r_dup == 0
    assert got[1].r_lang == 1 and got[1].keep == 0
    assert got[2].r_short == 1
    assert got[3].r_short == 1 and got[3].keep == 0
    assert got[4].r_quality == 1
    assert got[5].r_repetitive == 1
    assert got[6].r_dup == 1 and got[6].r_lang == 0
    # every rule fires somewhere; survivor of the dup pair is min doc_id
    for flag in ("r_lang", "r_short", "r_quality", "r_repetitive", "r_dup"):
        assert any(getattr(r, flag) == 1 for r in got.values()), flag


def test_chunk_documents_boundaries(spark):
    from codebased_spark.textops.chunk import chunk_documents

    w65 = " ".join(f"w{i}" for i in range(1, 66))
    rows = [(0, "a b c"), (1, w65), (2, "")]
    got = chunk_documents(
        spark.createDataFrame(rows, ["doc_id", "text"]),
        chunk_tokens=64, overlap=16,
    ).collect()
    by_doc = {}
    for r in got:
        by_doc.setdefault(r.doc_id, []).append(r)
    assert 2 not in by_doc  # empty doc -> no chunks
    (c0,) = by_doc[0]  # short doc -> exactly one whole chunk
    assert (c0.chunk_idx, c0.chunk_start, c0.n_chunk_tokens) == (0, 1, 3)
    assert c0.chunk_text == "a b c"
    c1 = sorted(by_doc[1], key=lambda r: r.chunk_idx)
    assert [(r.chunk_idx, r.chunk_start, r.n_chunk_tokens) for r in c1] == [
        (0, 1, 64), (1, 49, 17),
    ]
    assert c1[0].chunk_text.startswith("w1 w2 ") and c1[0].chunk_text.endswith(" w64")
    assert c1[1].chunk_text == " ".join(f"w{i}" for i in range(49, 66))
    # overlap: last 16 tokens of chunk 0 == first 16 of chunk 1
    assert c1[0].chunk_text.split()[-16:] == c1[1].chunk_text.split()[:16]


def test_triangle_counts_known_graph(spark):
    from codebased_spark.graph.triangles import triangle_counts, triangles

    # K4 on {1,2,3,4} (4 triangles, each node in 3) + pendant edge 4-5,
    # given as DIRECTED edges with duplicates/reversals to exercise
    # canonicalization
    e = [(1, 2), (2, 1), (1, 3), (1, 4), (2, 3), (3, 2), (2, 4), (3, 4), (4, 5), (5, 5)]
    edges = spark.createDataFrame(e, ["src", "dst"])
    assert triangles(edges).count() == 4
    got = {r.node: r.n_triangles for r in triangle_counts(edges).collect()}
    assert got == {1: 3, 2: 3, 3: 3, 4: 3}
    # degree-ordered orientation enumerates the same triangles
    got_deg = {
        r.node: r.n_triangles
        for r in triangle_counts(edges, order_by_degree=True).collect()
    }
    assert got_deg == got


def test_filter_decisions_near_dup_rule(spark):
    from codebased_spark.textops.filters import filter_decisions

    boiler = ("the quick brown fox jumps over the lazy dog and then the "
              "slow red hen walks under a tall green tree every single day")
    rows = [
        (0, boiler, "en"),                              # survivor of cluster
        (1, boiler + " with one extra tail", "en"),     # near-dup, r_neardup
        (2, "a completely different story about spark shuffles and "
            "broadcast joins in the big cluster of many machines", "en"),
    ]
    got = {
        r.doc_id: r
        for r in filter_decisions(
            spark.createDataFrame(rows, ["doc_id", "text", "lang"]),
            near_dup=True, neardup_threshold=0.6,
        ).collect()
    }
    assert "r_neardup" in got[0].asDict()
    assert got[0].r_neardup == 0           # min-id survivor keeps
    assert got[1].r_neardup == 1 and got[1].keep == 0
    assert got[2].r_neardup == 0


def test_filter_decisions_near_dup_with_custom_id_col(spark):
    """Regression: near_dup=True must thread id_col/text_col through to
    the minhash pair emitter (the curation job keys documents by url,
    not doc_id — this path raised UNRESOLVED_COLUMN before the fix)."""
    from codebased_spark.textops.filters import filter_decisions

    body = "the quick brown fox jumps over the lazy dog again and again today"
    docs = spark.createDataFrame(
        [("u1", body, "en"), ("u2", body + " extra", "en"),
         ("u3", "a completely different and unrelated sentence here", "en")],
        ["url", "text", "lang"],
    )
    got = {r.url: (r.r_neardup, r.keep) for r in filter_decisions(
        docs, id_col="url", near_dup=True, neardup_threshold=0.5,
        min_tokens=3, min_quality=0.0,
    ).collect()}
    # u1/u2 are near-dups: min-id survivor u1 kept, u2 dropped
    assert got["u1"] == (0, 1)
    assert got["u2"][0] == 1 and got["u2"][1] == 0
    assert got["u3"] == (0, 1)
