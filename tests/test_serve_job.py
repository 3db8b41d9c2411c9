"""HTTP serving layer (jobs/serve_graph.py): the §3.3 analog, driven
end-to-end with urllib against a committed graph."""

from __future__ import annotations

import json
import os
import socket
import subprocess
import sys
import time
import urllib.request

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _post(port, path, payload):
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}{path}",
        data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"},
    )
    try:
        with urllib.request.urlopen(req, timeout=30) as r:
            return r.status, json.loads(r.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


def test_serve_graph_end_to_end(spark, tmp_path):
    from codebased_spark.graph.manifest import run_partitioned
    from codebased_spark.graph.queries import DOC_GAZETTEER
    from codebased_spark.synth.pages import pages_from_documents_spark

    graph_dir = str(tmp_path / "graph")
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    pages = pages_from_documents_spark(docs.limit(80))
    gaz = spark.createDataFrame(
        [(w, c, t, 1.0) for w, c, t in DOC_GAZETTEER],
        ["surface_form", "canonical_id", "entity_type", "weight"],
    )
    run_partitioned(spark, pages, gaz, graph_dir, n_buckets=4)

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]

    errlog = open(tmp_path / "server.err", "w")
    proc = subprocess.Popen(
        [sys.executable, "jobs/serve_graph.py", "--graph", graph_dir,
         "--port", str(port), "--once", "4", "--cpus", "4"],
        stdout=subprocess.PIPE, stderr=errlog, text=True, cwd=REPO,
    )
    try:
        # wait for the "serving" line (session startup takes a few seconds)
        deadline = time.time() + 120
        line = ""
        while time.time() < deadline:
            line = proc.stdout.readline()
            if "serving" in line:
                break
        assert "serving" in line, open(tmp_path / "server.err").read()[-2000:]

        # 1: graph stats
        with urllib.request.urlopen(
            f"http://127.0.0.1:{port}/api/graph", timeout=60
        ) as r:
            stats = json.loads(r.read())
        assert stats["nodes_by_type"] and stats["edges_by_type"]

        # 2: ad-hoc SQL through the guard (auto-LIMIT applies)
        code, out = _post(port, "/api/query",
                          {"sql": "SELECT id, name FROM nodes ORDER BY id"})
        assert code == 200 and 0 < len(out["rows"]) <= 100

        # 3: the read-only guard rejects DML as a 400, not a 500
        code, out = _post(port, "/api/query", {"sql": "DROP TABLE nodes"})
        assert code == 400 and "error" in out

        # 4: canned view
        code, out = _post(port, "/api/related", {"entity": "spark"})
        assert code == 200
    finally:
        try:
            proc.wait(timeout=120)
        finally:
            errlog.close()
        assert proc.returncode == 0
