#!/usr/bin/env python
"""Minimal HTTP serving layer over a committed graph — the §3.3 analog.

The reference serves `POST /api/query` (read-only Cypher) and
`GET /api/graph` (whole-graph stats) from its stored graph
(src/codebased/api/server.py per SURVEY.md §3.3). This is the same
surface over the Spark-built graph directory, stdlib-only
(http.server — no web framework in this sandbox):

    GET  /api/graph            -> node/edge counts by type (S12 stats)
    POST /api/query            -> {"sql": "SELECT ..."} run through the
                                  read-only guard + auto-LIMIT
                                  (graph/views.py F5/F6 discipline)
    POST /api/pages_mentioning -> {"entity": "..."} canned view
    POST /api/related          -> {"entity": "...", "rel_type": null}

Serving is driver-side BY DESIGN: the API reads a small, committed,
deduplicated graph table; the heavy lifting happened in the pipeline.
A production deployment would put the same routes behind a thrift/
connect server; the query guard and view layer are the part that
carries over unchanged.

Usage:
    spark-submit --py-files codebased_spark.zip jobs/serve_graph.py \\
        --graph /tmp/graph --port 8799          # --once for single-request test mode
"""

from __future__ import annotations

import argparse
import json
import os
import sys
from http.server import BaseHTTPRequestHandler, HTTPServer


def _rows(df):
    return [r.asDict(recursive=True) for r in df.collect()]


def make_handler(spark):
    from codebased_spark.graph import views

    class Handler(BaseHTTPRequestHandler):
        def _send(self, code: int, payload) -> None:
            body = json.dumps(payload, default=str).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def log_message(self, *a):  # noqa: D102 - quiet test output
            pass

        def do_GET(self):  # noqa: N802
            if self.path != "/api/graph":
                self._send(404, {"error": "unknown route"})
                return
            nodes = spark.sql(
                "SELECT type, count(*) AS n FROM nodes GROUP BY 1"
            )
            edges = spark.sql(
                "SELECT rel_type, count(*) AS n FROM edges GROUP BY 1"
            )
            self._send(200, {"nodes_by_type": _rows(nodes),
                             "edges_by_type": _rows(edges)})

        def do_POST(self):  # noqa: N802
            n = int(self.headers.get("Content-Length", 0))
            try:
                req = json.loads(self.rfile.read(n) or b"{}")
            except json.JSONDecodeError:
                self._send(400, {"error": "bad json"})
                return
            try:
                if self.path == "/api/query":
                    df = views.sql(spark, req["sql"])
                elif self.path == "/api/pages_mentioning":
                    df = views.pages_mentioning(spark, req["entity"])
                elif self.path == "/api/related":
                    df = views.related_entities(
                        spark, req["entity"], req.get("rel_type")
                    )
                else:
                    self._send(404, {"error": "unknown route"})
                    return
            except (ValueError, KeyError) as e:
                # read-only guard rejections and missing params are 400s,
                # never 500s — the guard WORKING is not a server error
                self._send(400, {"error": str(e)})
                return
            self._send(200, {"rows": _rows(df)})

    return Handler


def main(argv: list[str] | None = None) -> None:
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--graph", required=True, help="committed graph dir")
    ap.add_argument("--port", type=int, default=8799)
    ap.add_argument("--once", type=int, default=0, metavar="N",
                    help="serve N requests then exit (test mode)")
    ap.add_argument("--cpus", type=int, default=4)
    args = ap.parse_args(argv)

    from codebased_spark.graph.views import register_views
    from codebased_spark.session import get_spark

    spark = get_spark("serve-graph", master=f"local[{args.cpus}]",
                      shuffle_partitions=args.cpus)
    spark.sparkContext.setLogLevel("ERROR")
    register_views(spark, out_dir=args.graph)

    srv = HTTPServer(("127.0.0.1", args.port), make_handler(spark))
    print(json.dumps({"serving": args.port}), flush=True)
    if args.once:
        for _ in range(args.once):
            srv.handle_request()
        srv.server_close()
        spark.stop()
        # local-mode JVM shutdown can leave non-daemon threads for many
        # seconds; --once is the TEST mode, so end the process decisively
        print(json.dumps({"served": args.once}), flush=True)
        os._exit(0)
    else:  # pragma: no cover - interactive mode
        srv.serve_forever()


if __name__ == "__main__":
    main()
