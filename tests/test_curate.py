"""End-to-end corpus-curation job (jobs/curate_corpus.py)."""

from __future__ import annotations

import datetime
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _html(body, extra_head=""):
    return f"<html><head>{extra_head}</head><body><p>{body}</p></body></html>".encode()


def test_curate_job_end_to_end(spark, tmp_path):
    base = datetime.datetime(2025, 1, 1)
    # varied, stopword-bearing sentences: must PASS quality + repetition
    long_text = " ".join(
        f"the market{i} moved and analysts{i} saw a steady gain{i} in trading."
        for i in range(30)
    )
    rows = [
        # kept english doc
        ("https://a.example.com/keep", base, _html(long_text), "", "en"),
        # stale recrawl of the same url (older ts, different body) — collapsed
        ("https://a.example.com/keep", base - datetime.timedelta(days=9),
         _html("stale body"), "", "en"),
        # canonical variant of the kept doc — collapsed into it
        ("https://m.a.example.com/keep", base + datetime.timedelta(days=1),
         _html("thin copy",
               '<link rel="canonical" href="https://a.example.com/keep"/>'),
         "", "en"),
        # robots-blocked path (distinct text: the dup rule must not see it)
        ("https://a.example.com/private/x", base,
         _html("the private page body that robots exclude from the corpus."),
         "", "en"),
        # wrong language (distinct text: rejected by r_lang alone)
        ("https://a.example.com/de", base,
         _html("der markt bewegte sich und die analysten sahen es."), "", "de"),
        # too short
        ("https://a.example.com/short", base, _html("tiny"), "", "en"),
    ]
    pages = spark.createDataFrame(rows, ["url", "warc_ts", "html", "text", "lang"])
    robots = spark.createDataFrame(
        [("a.example.com", "User-agent: *\nDisallow: /private/")],
        ["host", "robots_txt"],
    )
    pages_path = str(tmp_path / "pages")
    robots_path = str(tmp_path / "robots")
    out = str(tmp_path / "out")
    pages.write.parquet(pages_path)
    robots.write.parquet(robots_path)

    proc = subprocess.run(
        [sys.executable, "jobs/curate_corpus.py", "--pages", pages_path,
         "--robots", robots_path, "--out", out, "--chunk-tokens", "16",
         "--overlap", "4", "--master", "local[4]"],
        capture_output=True, text=True, cwd=REPO, timeout=600,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    report = json.loads(
        [l for l in proc.stdout.splitlines() if l.startswith("{")][-1]
    )
    # 6 input rows; robots drops 1; recrawl+canonical collapse 3 -> 1;
    # decisions over 3 urls: keep doc, de doc (r_lang), short doc (r_short)
    assert report["n_input_rows"] == 6
    assert report["n_urls"] == 3
    assert report["keep"] == 1
    assert report["r_lang"] == 1 and report["r_short"] >= 1
    assert report["n_chunks"] >= 7  # 120 tokens, stride 12

    decisions = spark.read.parquet(f"{out}/decisions")
    kept = [r.url for r in decisions.where("keep = 1").collect()]
    assert kept == ["https://a.example.com/keep"]
    chunks = spark.read.parquet(f"{out}/chunks")
    assert chunks.where("url = 'https://a.example.com/keep'").count() == chunks.count()


def test_curate_job_line_dedup_and_tail_drop(spark, tmp_path):
    base = datetime.datetime(2025, 1, 1)
    boiler = "please subscribe to our newsletter for the daily updates today."

    def body(i, n_sents, with_boiler):
        sents = " ".join(
            f"the market{i}x{j} moved and analysts{i}x{j} saw a steady "
            f"gain{j} in trading."
            for j in range(n_sents)
        )
        return sents + (" " + boiler if with_boiler else "")

    rows = [
        (f"https://a.example.com/k{i}", base,
         _html(body(i, 12 if i < 3 else 5, with_boiler=i < 3)), "", "en")
        for i in range(4)
    ]
    pages = spark.createDataFrame(rows, ["url", "warc_ts", "html", "text", "lang"])
    pages_path = str(tmp_path / "pages")
    out = str(tmp_path / "out")
    pages.write.parquet(pages_path)

    proc = subprocess.run(
        [sys.executable, "jobs/curate_corpus.py", "--pages", pages_path,
         "--out", out, "--chunk-tokens", "16", "--overlap", "4",
         "--line-dedup", "3", "--drop-tail", "--master", "local[4]"],
        capture_output=True, text=True, cwd=REPO, timeout=600,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    report = json.loads(
        [l for l in proc.stdout.splitlines() if l.startswith("{")][-1]
    )
    assert report["keep"] == 4  # the filter table keeps all four

    chunks = spark.read.parquet(f"{out}/chunks")
    urls = {r.url for r in chunks.select("url").distinct().collect()}
    # k3 (short, lowest quality score) fell into the tail bucket
    assert urls == {f"https://a.example.com/k{i}" for i in range(3)}
    # the 3x-repeated boilerplate sentence was removed before chunking
    assert chunks.where(chunks.chunk_text.contains("subscribe")).count() == 0
    # real content survived
    assert chunks.where(chunks.chunk_text.contains("market0x0")).count() >= 1


def test_curate_job_nfc_normalization(spark, tmp_path):
    base = datetime.datetime(2025, 1, 1)
    # decomposed e + combining acute planted in otherwise-keepable text
    text = " ".join(
        f"the cafe\u0301{i} opened and analysts{i} saw a steady gain{i} in trading."
        for i in range(30)
    )
    pages = spark.createDataFrame(
        [("https://a.example.com/k", base, _html(text), "", "en")],
        ["url", "warc_ts", "html", "text", "lang"],
    )
    pages_path, out = str(tmp_path / "p"), str(tmp_path / "o")
    pages.write.parquet(pages_path)
    proc = subprocess.run(
        [sys.executable, "jobs/curate_corpus.py", "--pages", pages_path,
         "--out", out, "--nfc", "--chunk-tokens", "16", "--overlap", "4",
         "--master", "local[4]"],
        capture_output=True, text=True, cwd=REPO, timeout=600,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    chunks = spark.read.parquet(f"{out}/chunks")
    assert chunks.count() > 0
    # every chunk carries the PRECOMPOSED form; no combining marks remain
    assert chunks.where(chunks.chunk_text.contains("caf\u00e9")).count() > 0
    assert chunks.where(chunks.chunk_text.contains("\u0301")).count() == 0
