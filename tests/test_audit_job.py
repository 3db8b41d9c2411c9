"""End-to-end corpus-audit job (jobs/audit_corpus.py)."""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_audit_job_end_to_end(spark, tmp_path):
    text_en = ("the market moved and the analysts saw a steady gain "
               "in trading today. prices rose again and the outlook improved.")
    rows = [
        (0, text_en, "en", "src0", len(text_en)),
        (1, text_en, "en", "src1", len(text_en)),      # exact dup of 0
        (2, "der markt bewegte sich heute wieder deutlich nach oben und "
            "die analysten sahen es gelassen.", "de", "src0", 95),
        (3, "prices held steady while the traders watched the market "
            "with patience and care.", "en", "src0", 80),
    ]
    spark.createDataFrame(
        rows, ["doc_id", "text", "lang", "source", "n_chars"]
    ).write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")

    out = str(tmp_path / "out")
    proc = subprocess.run(
        [sys.executable, "jobs/audit_corpus.py", "--docs", str(tmp_path),
         "--out", out, "--cpus", "4"],
        capture_output=True, text=True, cwd=REPO, timeout=600,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    report = json.loads(
        [l for l in proc.stdout.splitlines() if l.startswith("{")][-1]
    )
    assert report["n_docs"] == 4
    assert report["n_exact_dups"] == 1        # doc 1 collapses into doc 0
    assert report["fk_min"] <= report["fk_max"]

    audit = spark.read.parquet(f"{out}/audit")
    assert audit.count() == 4
    got = {r.doc_id: r for r in audit.collect()}
    # survivor flags: docs 0,2,3 survive; doc 1 is the dup
    assert got[0].is_dup_survivor == 1 and got[1].is_dup_survivor == 0
    # every dimension column materialized
    for c in ("quality_score", "pred_lang", "is_repetitive", "fk_x100"):
        assert c in audit.columns
