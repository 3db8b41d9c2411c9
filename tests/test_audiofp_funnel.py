"""Audio zero-crossing fingerprint dedup (media/audiofp.py) + ordered
event funnel (dataops.q_event_funnel)."""

import datetime

from pyspark.sql import functions as F


def test_zero_crossing_fingerprint_roundtrip():
    from codebased_spark.media.audiofp import zero_crossing_fingerprint
    from codebased_spark.media.headers import make_wav_pcm

    # half-period 3, amplitude 700, 20 samples -> 19 // 3 = 6 crossings
    samples = [700 if (i // 3) % 2 == 0 else -700 for i in range(20)]
    assert zero_crossing_fingerprint(make_wav_pcm(samples)) == (6, 700)
    # gain change preserves crossings, shifts peak — different cluster key
    half = [s // 2 for s in samples]
    assert zero_crossing_fingerprint(make_wav_pcm(half)) == (6, 350)


def test_audio_clusters_group_by_period_and_gain(spark):
    from codebased_spark.media.audiofp import (
        audio_fingerprint_clusters,
        synthetic_tone_media,
    )

    docs = spark.createDataFrame([(i,) for i in range(80)], ["doc_id"])
    out = audio_fingerprint_clusters(synthetic_tone_media(docs)).collect()
    by_id = {r.doc_id: r for r in out}
    # doc 41 shares (41%8, 41%5) = (1, 1) with doc 1 -> same tone
    assert by_id[41].cluster_id == 1 and by_id[41].is_survivor == 0
    assert by_id[1].is_survivor == 1 and by_id[1].cluster_size == 2
    assert by_id[1].zero_crossings == 239 // 2 and by_id[1].peak == 200


def test_event_funnel_strict_ordering(spark, tmp_path):
    # user 1 completes all 3 steps; user 2's purchase precedes the click
    # (reaches step 2 only); user 3 never views (reaches nothing)
    t0 = datetime.datetime(2024, 1, 1)

    def ev(eid, uid, typ, minutes):
        return (eid, t0 + datetime.timedelta(minutes=minutes), uid, typ, 1.0, "{}")

    rows = [
        ev(1, 1, "view", 0), ev(2, 1, "click", 5), ev(3, 1, "purchase", 9),
        ev(4, 2, "purchase", 1), ev(5, 2, "view", 2), ev(6, 2, "click", 3),
        ev(7, 3, "click", 1), ev(8, 3, "purchase", 2),
    ]
    df = spark.createDataFrame(
        rows, ["event_id", "ts", "user_id", "event_type", "value", "props"]
    )
    df.write.mode("overwrite").parquet(f"{tmp_path}/events.parquet")

    from codebased_spark.dataops import q_event_funnel

    got = {r.step: r.n_users for r in q_event_funnel(spark, str(tmp_path)).collect()}
    assert got == {1: 2, 2: 2, 3: 1}


def test_event_funnel_earliest_step_time_semantics(spark, tmp_path):
    # the SECOND click (after the view) must anchor step 3, not the first
    t0 = datetime.datetime(2024, 1, 1)
    rows = [
        (1, t0 + datetime.timedelta(minutes=2), 9, "view", 1.0, "{}"),
        (2, t0 + datetime.timedelta(minutes=1), 9, "click", 1.0, "{}"),
        (3, t0 + datetime.timedelta(minutes=4), 9, "click", 1.0, "{}"),
        (4, t0 + datetime.timedelta(minutes=3), 9, "purchase", 1.0, "{}"),
        (5, t0 + datetime.timedelta(minutes=5), 9, "purchase", 1.0, "{}"),
    ]
    df = spark.createDataFrame(
        rows, ["event_id", "ts", "user_id", "event_type", "value", "props"]
    )
    df.write.mode("overwrite").parquet(f"{tmp_path}/events.parquet")

    from codebased_spark.dataops import q_event_funnel

    got = {r.step: r.n_users for r in q_event_funnel(spark, str(tmp_path)).collect()}
    # click at minute 4 anchors; purchase at minute 5 qualifies
    assert got == {1: 1, 2: 1, 3: 1}


def test_frame_sampling_fanout_and_cap(spark, tmp_path):
    # doc 2 -> duration 3ms -> 1 frame; doc 302 -> duration 303ms -> 7
    # frames (303//50+1); doc 1202 -> duration 1203ms -> capped at 10
    rows = [(i, "t", "en", "src0", 10) for i in (2, 302, 1202)]

    spark.createDataFrame(
        rows, ["doc_id", "text", "lang", "source", "n_chars"]
    ).write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")

    from codebased_spark.dataops import mm_frame_sampling

    out = mm_frame_sampling(spark, str(tmp_path)).collect()
    per_doc = {}
    for r in out:
        per_doc.setdefault(r.doc_id, []).append(r)
    assert len(per_doc[2]) == 1
    assert len(per_doc[302]) == 7
    assert len(per_doc[1202]) == 10
    f = sorted(per_doc[302], key=lambda r: r.frame_idx)
    assert [r.ts_ms for r in f] == [0, 50, 100, 150, 200, 250, 300]
    assert all(r.duration_ms == 303 for r in f)
