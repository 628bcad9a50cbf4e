"""Image-path throughput + N->4N parallelism evidence (BENCH.md record).

Runs the full ROI chain (render PNG -> decode -> glare-reduce -> CLAHE ->
bilateral -> adaptive threshold -> projection -> band extraction) over a
synthetic id range at one parallelism level and prints docs/s.  The
orchestrator mode re-execs itself at local[2] and local[8] with a fresh
JVM each (a single process cannot restart a SparkSession with a new
master reliably) and reports scaling efficiency.

    python scripts/image_bench.py            # orchestrate 2 -> 8
    python scripts/image_bench.py --master local[8] --docs 6000   # one point
"""

from __future__ import annotations

import argparse
import json
import subprocess
import sys
import time

sys.path.insert(0, "/root/repo")


def run_point(master: str, docs: int, iters: int) -> dict:
    from apple_ocr_backend_spark.operators.image_extract import (
        extract_rois, render_media)
    from apple_ocr_backend_spark.session import get_spark

    cpus = int(master.split("[")[1].rstrip("]"))
    spark = get_spark(master=master, shuffle_partitions=cpus)
    ids = (spark.range(docs).withColumnRenamed("id", "doc_id")
           .repartition(cpus * 4, "doc_id"))
    times = []
    for _ in range(iters + 1):  # first run is warmup
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        n = extract_rois(render_media(ids, rotate=False)).count()
        times.append(round(time.perf_counter() - t0, 3))
    best = min(times[1:])
    return {"master": master, "docs": docs, "rois": n,
            "iters": times[1:], "docs_per_sec": round(docs / best, 1)}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--master", default=None)
    ap.add_argument("--docs", type=int, default=6000)
    ap.add_argument("--iters", type=int, default=2)
    args = ap.parse_args()
    if args.master:
        print(json.dumps(run_point(args.master, args.docs, args.iters)))
        return
    pts = {}
    for m in (2, 8):
        p = subprocess.run(
            [sys.executable, __file__, "--master", f"local[{m}]",
             "--docs", str(args.docs), "--iters", str(args.iters)],
            capture_output=True, text=True)
        if p.returncode != 0:
            sys.stderr.write(p.stdout + p.stderr)
            raise SystemExit(1)
        pts[m] = json.loads(p.stdout.strip().splitlines()[-1])
    eff = round((pts[8]["docs_per_sec"] / pts[2]["docs_per_sec"]) / 4, 3)
    print(json.dumps({"local2": pts[2], "local8": pts[8], "eff_2to8": eff}))


if __name__ == "__main__":
    main()
