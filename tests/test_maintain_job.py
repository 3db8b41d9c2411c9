"""End-to-end table-maintenance job (jobs/maintain_table.py)."""

from __future__ import annotations

import datetime
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_maintain_job_end_to_end(spark, tmp_path):
    base = datetime.datetime(2025, 6, 1)

    def cap(url_id, day, body):
        return (
            f"https://site.example.org/p/{url_id}",
            base + datetime.timedelta(days=day),
            body,
        )

    rows = []
    for u in range(8):
        # latest capture + one a day older (kept at 2-day retention) +
        # one ten days older (vacuumed)
        rows.append(cap(u, 10, f"latest body of page {u} " + "x" * (u * 40)))
        rows.append(cap(u, 9, f"recent body of page {u}"))
        rows.append(cap(u, 0, f"ancient body of page {u}"))
    pages = spark.createDataFrame(rows, ["url", "warc_ts", "text"])
    pages_path = str(tmp_path / "pages")
    out = str(tmp_path / "out")
    # many tiny input files so compaction has something to do
    pages.repartition(12).write.parquet(pages_path)

    proc = subprocess.run(
        [sys.executable, "jobs/maintain_table.py", "--pages", pages_path,
         "--out", out, "--retention", str(2 * 86400), "--cpus", "4"],
        capture_output=True, text=True, cwd=REPO, timeout=600,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    report = json.loads(
        [l for l in proc.stdout.splitlines() if l.startswith("{")][-1]
    )
    assert report["n_input"] == 24
    assert report["n_retained"] == 16       # latest + day-9 capture per url
    assert report["n_vacuumed"] == 8        # the ancient captures
    assert report["digests_equal"] is True  # layout changed, content didn't
    assert report["files_after"] <= report["files_before"]

    maintained = spark.read.parquet(f"{out}/maintained")
    assert maintained.count() == 16
    # every url still has its latest capture
    kept_latest = {
        r.url for r in maintained.where(
            maintained.warc_ts == base + datetime.timedelta(days=10)
        ).collect()
    }
    assert len(kept_latest) == 8
    # zone-map sidecar covers every output file with sound bounds
    zm = spark.read.parquet(f"{out}/zonemap").collect()
    assert sum(r.n_rows for r in zm) == 16
    assert all(r.min_len <= r.max_len for r in zm)


def test_maintain_job_retention_zero_keeps_only_latest(spark, tmp_path):
    base = datetime.datetime(2025, 6, 1)
    rows = []
    for u in range(3):
        for day in (0, 1, 2):
            rows.append(
                (f"https://s.example.org/{u}",
                 base + datetime.timedelta(days=day), f"body {u} {day}")
            )
    pages = spark.createDataFrame(rows, ["url", "warc_ts", "text"])
    pages_path = str(tmp_path / "p2")
    out = str(tmp_path / "o2")
    pages.write.parquet(pages_path)

    proc = subprocess.run(
        [sys.executable, "jobs/maintain_table.py", "--pages", pages_path,
         "--out", out, "--retention", "0", "--cpus", "4"],
        capture_output=True, text=True, cwd=REPO, timeout=600,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    report = json.loads(
        [l for l in proc.stdout.splitlines() if l.startswith("{")][-1]
    )
    assert report["n_retained"] == 3 and report["n_vacuumed"] == 6


def test_maintain_job_digest_mismatch_never_swaps(spark, tmp_path, monkeypatch):
    """ADVICE r4: the Merkle gate must run BEFORE the swap — on mismatch the
    rewritten data stays in the staging dir and maintained/ is never
    created (a pre-existing generation would stay live untouched)."""
    import importlib

    mt = importlib.import_module("jobs.maintain_table")

    base = datetime.datetime(2025, 6, 1)
    rows = [
        (f"https://s.example.org/{u}", base, f"body {u}") for u in range(4)
    ]
    pages_path = str(tmp_path / "p3")
    out = str(tmp_path / "o3")
    spark.createDataFrame(rows, ["url", "warc_ts", "text"]).write.parquet(
        pages_path
    )

    real = mt._content_digests
    calls = {"n": 0}

    def corrupting(df, text_col, n_buckets=64):
        calls["n"] += 1
        d = real(df, text_col, n_buckets)
        if calls["n"] >= 2:  # the AFTER pass — poison every digest
            from pyspark.sql import functions as F

            d = d.withColumn("digest", F.lit("corrupt"))
        return d

    monkeypatch.setattr(mt, "_content_digests", corrupting)
    try:
        mt.main(["--pages", pages_path, "--out", out, "--retention", "0",
                 "--cpus", "4"])
        raised = False
    except SystemExit as e:
        raised = "aborting swap" in str(e)
    assert raised
    assert not os.path.exists(f"{out}/maintained")
    assert os.path.exists(f"{out}/_compacted")  # staged, inspectable
