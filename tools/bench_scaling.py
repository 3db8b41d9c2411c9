#!/usr/bin/env python
"""Scaling-efficiency benchmark: the same KG job at two parallelism levels.

The north rule requires throughput scaling efficiency >= 0.8 from N to 4N
executors. No multi-node cluster exists in this sandbox, so the evidence is
the same job on the SAME input at local[8] vs local[32] (8 -> 32 worker
threads = N -> 4N executor slots), per-config in a fresh subprocess (a JVM
cannot change master after start).

    python tools/bench_scaling.py [--docs 400000] [--out BENCH.md]

The job: distributed synthetic corpus generation (synth/scale.py, cost ~0)
-> full extract_triples pipeline -> triples.count(). Input size defaults
large enough that extraction compute dominates fixed job overhead, which
is what a 100 TB run looks like; efficiency = thr(4N) / (4 * thr(N)).
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def child(cpus: int, docs: int) -> None:
    sys.path.insert(0, REPO)
    from codebased_spark.graph.pipeline import extract_triples
    from codebased_spark.session import get_spark
    from codebased_spark.synth.scale import synth_pages_spark

    spark = get_spark(
        f"bench-scaling-{cpus}", master=f"local[{cpus}]", shuffle_partitions=cpus
    )
    spark.sparkContext.setLogLevel("ERROR")
    pages, gaz = synth_pages_spark(spark, docs)
    # warm up JVM/codegen/Arrow so we measure steady-state throughput
    extract_triples(spark, pages.limit(2000), gaz).triples.count()
    t0 = time.perf_counter()
    n = extract_triples(spark, pages, gaz).triples.count()
    dt = time.perf_counter() - t0
    print(json.dumps({"cpus": cpus, "seconds": round(dt, 2), "triples": n}))
    spark.stop()


def run_child(cpus: int, docs: int) -> dict:
    out = subprocess.run(
        [sys.executable, __file__, "--child", str(cpus), "--docs", str(docs)],
        capture_output=True, text=True, cwd=REPO, timeout=3600,
    )
    for line in out.stdout.splitlines():
        if line.startswith("{"):
            return json.loads(line)
    raise RuntimeError(f"child[{cpus}] produced no result:\n{out.stdout}\n{out.stderr[-2000:]}")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--child", type=int, default=None)
    ap.add_argument("--docs", type=int, default=1_500_000)
    ap.add_argument("--lo", type=int, default=2, help="N cores")
    ap.add_argument("--hi", type=int, default=8, help="4N cores")
    ap.add_argument("--out", default=None, help="append a markdown report to this file")
    args = ap.parse_args()
    if args.child is not None:
        child(args.child, args.docs)
        return

    lo = run_child(args.lo, args.docs)
    hi = run_child(args.hi, args.docs)
    thr_lo = lo["triples"] / lo["seconds"]
    thr_hi = hi["triples"] / hi["seconds"]
    ratio = args.hi / args.lo
    eff = thr_hi / (ratio * thr_lo)
    report = {
        "docs": args.docs,
        "triples": hi["triples"],
        f"local{args.lo}_sec": lo["seconds"],
        f"local{args.hi}_sec": hi["seconds"],
        f"local{args.lo}_triples_per_sec": round(thr_lo, 1),
        f"local{args.hi}_triples_per_sec": round(thr_hi, 1),
        f"scaling_efficiency_{args.lo}_to_{args.hi}": round(eff, 3),
    }
    print(json.dumps(report))
    if args.out:
        with open(args.out, "a") as f:
            f.write(
                "\n## Scaling efficiency (same job, same input, N vs 4N cores)\n\n"
                f"Input: {args.docs:,} synthetic pages (synth/scale.py, seed 42); "
                "job: full extract_triples -> triples.count().\n\n"
                "| config | seconds | triples/sec |\n|---|---|---|\n"
                f"| local[{args.lo}] (N) | {lo['seconds']} | {thr_lo:,.1f} |\n"
                f"| local[{args.hi}] ({ratio:.0f}N) | {hi['seconds']} | {thr_hi:,.1f} |\n\n"
                f"**Scaling efficiency** = thr({ratio:.0f}N) / ({ratio:.0f} x thr(N)) = "
                f"**{eff:.3f}** (target >= 0.8).\n"
            )


if __name__ == "__main__":
    main()
