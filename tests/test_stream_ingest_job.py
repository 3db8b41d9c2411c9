"""End-to-end streaming ingest job (jobs/stream_ingest.py) in backfill
mode, plus the checkpoint-resume contract."""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(pages, out, ckpt):
    return subprocess.run(
        [sys.executable, "jobs/stream_ingest.py", "--pages", pages,
         "--out", out, "--checkpoint", ckpt, "--backfill", "--cpus", "4"],
        capture_output=True, text=True, cwd=REPO, timeout=600,
    )


def test_stream_ingest_backfill_and_resume(spark, tmp_path):
    from codebased_spark.synth.pages import pages_from_documents_spark

    pages_dir = str(tmp_path / "pages")
    out = str(tmp_path / "triples")
    ckpt = str(tmp_path / "ckpt")
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    pages_from_documents_spark(docs.limit(60)).write.parquet(pages_dir)

    proc = _run(pages_dir, out, ckpt)
    assert proc.returncode == 0, proc.stderr[-2000:]
    rep = json.loads([l for l in proc.stdout.splitlines()
                      if l.startswith("{")][-1])
    assert rep["mode"] == "backfill" and rep["triples_written"] > 0
    n1 = rep["triples_written"]

    # second run with NO new files: checkpoint prevents re-processing
    proc2 = _run(pages_dir, out, ckpt)
    assert proc2.returncode == 0, proc2.stderr[-2000:]
    rep2 = json.loads([l for l in proc2.stdout.splitlines()
                       if l.startswith("{")][-1])
    assert rep2["triples_written"] == n1

    # new files appended -> only the delta is processed, output grows
    pages_from_documents_spark(
        docs.limit(90).subtract(docs.limit(60))
    ).write.mode("append").parquet(pages_dir)
    proc3 = _run(pages_dir, out, ckpt)
    assert proc3.returncode == 0, proc3.stderr[-2000:]
    rep3 = json.loads([l for l in proc3.stdout.splitlines()
                       if l.startswith("{")][-1])
    assert rep3["triples_written"] > n1
