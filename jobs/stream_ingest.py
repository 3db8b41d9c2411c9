#!/usr/bin/env python
"""spark-submit entry point for STREAMING KG ingest — the continuous face
of jobs/run_pipeline.py: pages land in a directory (the streaming face of
the Iceberg pages table), every micro-batch runs the same extraction
pipeline, triples append to the output with restart-safe checkpointing.

Two modes:
    --backfill     Trigger.AvailableNow: drain everything currently in
                   --pages, then exit — the catch-up/bootstrap run, and
                   what CI drives deterministically.
    (default)      continuous micro-batches until stopped; restart
                   replays unprocessed files from the checkpoint, and
                   content-hash ids keep replays deduplicable downstream
                   (same contract as the batch manifest runner).

Usage:
    spark-submit --py-files codebased_spark.zip jobs/stream_ingest.py \\
        --pages /data/pages_stream --out /data/triples \\
        --checkpoint /data/ckpt --backfill
"""

from __future__ import annotations

import argparse
import json
import os
import sys

PAGES_SCHEMA = (
    "url string, warc_ts timestamp, html binary, text string, lang string"
)


def main(argv: list[str] | None = None) -> None:
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--pages", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--checkpoint", required=True)
    ap.add_argument("--backfill", action="store_true")
    ap.add_argument("--timeout-s", type=int, default=0,
                    help="continuous mode: stop after N seconds (0 = run forever)")
    ap.add_argument("--cpus", type=int, default=8)
    args = ap.parse_args(argv)

    from codebased_spark.graph.queries import DOC_GAZETTEER
    from codebased_spark.session import get_spark
    from codebased_spark.streaming.ingest import stream_pages_to_graph

    spark = get_spark("stream-ingest", master=f"local[{args.cpus}]",
                      shuffle_partitions=args.cpus)
    spark.sparkContext.setLogLevel("ERROR")
    gaz = spark.createDataFrame(
        [(w, c, t, 1.0) for w, c, t in DOC_GAZETTEER],
        ["surface_form", "canonical_id", "entity_type", "weight"],
    )

    q = stream_pages_to_graph(
        spark, args.pages, PAGES_SCHEMA, gaz, args.out, args.checkpoint,
        available_now=args.backfill,
    )
    if args.backfill:
        q.awaitTermination()
    elif args.timeout_s:
        q.awaitTermination(args.timeout_s)
        q.stop()
    else:  # pragma: no cover - interactive continuous mode
        q.awaitTermination()

    n = (
        spark.read.parquet(args.out).count()
        if os.path.exists(args.out) else 0
    )
    print(json.dumps({"triples_written": n, "mode":
                      "backfill" if args.backfill else "continuous"}))


if __name__ == "__main__":
    main()
