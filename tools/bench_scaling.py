#!/usr/bin/env python
"""Scaling-efficiency benchmark: the same KG job at two parallelism levels.

The north rule requires throughput scaling efficiency >= 0.8 from N to 4N
executors. No multi-node cluster exists in this sandbox; two evidence modes:

- thread mode (default): local[N] vs local[4N] worker threads, each in a
  fresh subprocess (a JVM cannot change master after start):
      python tools/bench_scaling.py --docs 2000000 --lo 1 --hi 4
- executor mode (--executor-cores): local-cluster[N,c,mem] — N SEPARATE
  executor JVMs x c cores, package shipped via addPyFile (spark-submit
  --py-files semantics), the closest single-box analog of a real
  N -> 4N executor scale-out:
      python tools/bench_scaling.py --executor-cores 4 --lo 1 --hi 4 --docs 600000

The job: materialized synthetic corpus (synth/scale.py parquet) -> full
extract_triples pipeline -> triples.count(), timed at steady state (two
untimed full-size warmups). Efficiency = thr(4N) / (4 * thr(N)).
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _package_zip() -> str:
    """Zip codebased_spark for executor shipping (spark-submit --py-files
    semantics — local-cluster executors spawn python workers that do not
    share the driver's sys.path)."""
    import zipfile

    zpath = "/tmp/codebased_spark_pyfiles.zip"
    src = os.path.join(REPO, "codebased_spark")
    with zipfile.ZipFile(zpath, "w") as z:
        for root, _, files in os.walk(src):
            for fn in files:
                if fn.endswith(".py"):
                    full = os.path.join(root, fn)
                    z.write(full, os.path.relpath(full, REPO))
    return zpath


def child(cpus: int, docs: int, executors: int = 0, mem_mb: int = 16384) -> None:
    sys.path.insert(0, REPO)
    from codebased_spark.graph.pipeline import extract_triples
    from codebased_spark.session import get_spark
    from codebased_spark.synth.scale import synth_pages_materialized

    if executors:
        # N separate executor JVMs x `cpus` cores each — the in-sandbox
        # emulation of an N-executor cluster (own heap/GC/python workers
        # per executor), scaled by the executor count like a real cluster
        master = f"local-cluster[{executors},{cpus},{mem_mb}]"
        total = executors * cpus
        # local-cluster's third arg is only the WORKER's capacity; the
        # executor itself still launches with spark.executor.memory
        # (default 1g) — set it explicitly or large inputs OOM (exit 52)
        # in the 1-executor config while 4 executors squeak by.
        spark = get_spark(
            f"bench-scaling-{executors}x{cpus}", master=master,
            shuffle_partitions=total,
            extra_conf={"spark.executor.memory": f"{mem_mb}m"},
        )
        spark.sparkContext.addPyFile(_package_zip())
        cpus = total
    else:
        spark = get_spark(
            f"bench-scaling-{cpus}", master=f"local[{cpus}]", shuffle_partitions=cpus
        )
    spark.sparkContext.setLogLevel("ERROR")
    pages, gaz = synth_pages_materialized(spark, docs)
    # steady-state discipline (same as bench.py): two UNTIMED full-size
    # warmups so C2 finishes tiering the generated code — a single small
    # warmup leaves each config at a different point of the JIT curve and
    # the efficiency ratio measures warmup, not scaling
    for _ in range(2):
        w = extract_triples(spark, pages, gaz)
        w.triples.count()
        w.release()
    t0 = time.perf_counter()
    res = extract_triples(spark, pages, gaz)
    n = res.triples.count()
    dt = time.perf_counter() - t0
    res.release()
    print(json.dumps({"cpus": cpus, "seconds": round(dt, 2), "triples": n}))
    spark.stop()


def run_child(cpus: int, docs: int, executors: int = 0, mem_mb: int = 16384,
              envelope: int = 0) -> dict:
    cmd = [sys.executable, __file__, "--child", str(cpus), "--docs", str(docs),
           "--mem-mb", str(mem_mb)]
    if executors:
        cmd += ["--executors", str(executors)]
    if envelope and executors:
        # Pin the whole child process tree (executor JVMs, python UDF
        # workers, GC/netty threads) to `executors * envelope` cpus — the
        # per-node CPU envelope a real cluster node has. Unpinned, the
        # 1-executor config borrows the idle box's spare cores through its
        # python workers and JVM service threads (resources no real 4-core
        # node has), inflating the baseline and deflating measured
        # efficiency; pinning makes both configs see identical per-node
        # hardware, which is exactly the N -> 4N comparison the north rule
        # defines.
        cmd = ["taskset", "-c", f"0-{executors * envelope - 1}"] + cmd
    out = subprocess.run(cmd, capture_output=True, text=True, cwd=REPO, timeout=3600)
    for line in out.stdout.splitlines():
        if line.startswith("{"):
            return json.loads(line)
    errlog = f"/tmp/bench_scaling_child_{cpus}_{executors}.stderr"
    with open(errlog, "w") as f:
        f.write(out.stderr)
    raise RuntimeError(
        f"child[{cpus}] produced no result (full stderr: {errlog}):\n"
        f"{out.stdout}\n{out.stderr[-2000:]}"
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--child", type=int, default=None)
    ap.add_argument("--docs", type=int, default=1_500_000)
    ap.add_argument("--lo", type=int, default=2, help="N cores (or N executors with --executor-cores)")
    ap.add_argument("--hi", type=int, default=8, help="4N cores (or 4N executors)")
    ap.add_argument("--executor-cores", type=int, default=0,
                    help="if set, lo/hi are EXECUTOR counts in local-cluster mode with this many cores each")
    ap.add_argument("--executors", type=int, default=0, help="(child) executor count")
    ap.add_argument("--mem-mb", type=int, default=16384,
                    help="executor memory per local-cluster executor (MB)")
    ap.add_argument("--pin-envelope", type=int, default=0,
                    help="pin each config to executors*THIS cpus via taskset "
                         "(per-node CPU envelope; executor mode only)")
    ap.add_argument("--out", default=None, help="append a markdown report to this file")
    args = ap.parse_args()
    if args.child is not None:
        child(args.child if not args.executors else args.executor_cores or args.child,
              args.docs, executors=args.executors, mem_mb=args.mem_mb)
        return

    if args.executor_cores:
        lo = run_child(args.executor_cores, args.docs, executors=args.lo,
                       mem_mb=args.mem_mb, envelope=args.pin_envelope)
        hi = run_child(args.executor_cores, args.docs, executors=args.hi,
                       mem_mb=args.mem_mb, envelope=args.pin_envelope)
    else:
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
