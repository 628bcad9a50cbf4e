#!/usr/bin/env python
"""Benchmark harness (driver contract + scaling-efficiency evidence).

Default mode: run the headline queries at ``$SPARK_GRAFT_SF_DIR`` (default
/root/testdata/sf0.1) on ``local[$SPARK_GRAFT_CPUS]`` (default 32) and print
ONE JSON line::

    {"metric": "end_to_end_bench_sec", "value": <total>, "unit": "sec",
     "queries": {...per-query sec...}, "sf": ..., "docs_per_sec": ...}

``--scaling`` mode (north-rule evidence, BASELINE.json: N->4N executor scaling
efficiency >= 0.8; no real cluster in this sandbox, so two parallelism levels
on one host): re-execs this script once per master (local[8], local[32]) on
the identical replicated corpus, computes throughput-scaling efficiency
``(docs_per_sec_32 / docs_per_sec_8) / 4`` and writes BENCH.md.

The extraction workload is the flagship pipeline (plans.pipeline.extract_docs)
over the interleaved corpus derived JVM-side from the documents table
(sources.derived.docs_from_documents), replicated REPLICATE x with distinct
doc_ids so the corpus is large enough that fixed JVM/session overhead does not
mask UDF-stage scaling.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
REPLICATE = int(os.environ.get("SPARK_GRAFT_REPLICATE", "8"))


def make_spark(master: str):
    from pyspark.sql import SparkSession
    return (SparkSession.builder.master(master)
            .appName("bench")
            .config("spark.sql.shuffle.partitions", str(CPUS))
            .config("spark.sql.adaptive.enabled", "true")
            .config("spark.sql.execution.arrow.pyspark.enabled", "true")
            .config("spark.sql.execution.arrow.maxRecordsPerBatch", "2048")
            .config("spark.driver.memory",
                    os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
            .config("spark.ui.enabled", "false")
            .getOrCreate())


def replicated_docs(spark, sf_dir: str, replicate: int):
    """Interleaved corpus derived from the documents table, replicated
    JVM-side with distinct doc_ids (a map-only datagen, any-scale)."""
    from pyspark.sql import functions as F
    from apple_ocr_backend_spark.sources.derived import docs_from_documents
    docs = docs_from_documents(spark, sf_dir)
    if replicate <= 1:
        return docs
    reps = spark.range(replicate).select(F.col("id").alias("rep"))
    return (docs.crossJoin(reps)
            .select(F.concat_ws("_", "doc_id", "rep").alias("doc_id"), "spans"))


def run_noop(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def bench_queries(spark, sf_dir: str) -> dict[str, float]:
    """Representative catalog queries (relational core + training-data ops)."""
    from apple_ocr_backend_spark.plans.catalog import queries
    q = queries()
    names = ["pricing_summary", "top_customer_per_nation", "event_score_agg",
             "stats_cube", "sliding_windows", "text_stats", "dedup_exact",
             "dedup_minhash_lsh", "dedup_simhash", "ann_bruteforce", "ann_ivf",
             "serial_validate"]
    times = {}
    for name in names:
        t0 = time.time()
        run_noop(q[name](spark, sf_dir))
        times[name] = round(time.time() - t0, 3)
    return times


def bench_extraction(spark, sf_dir: str, replicate: int) -> dict:
    from apple_ocr_backend_spark.plans.pipeline import extract_docs
    docs = replicated_docs(spark, sf_dir, replicate)
    n_docs = docs.count()
    t0 = time.time()
    run_noop(extract_docs(docs, mode="fused"))
    fused = time.time() - t0
    t0 = time.time()
    run_noop(extract_docs(docs, mode="staged"))
    staged = time.time() - t0
    return {"n_docs": n_docs,
            "extract_fused_sec": round(fused, 3),
            "extract_staged_sec": round(staged, 3),
            "docs_per_sec_fused": round(n_docs / fused, 2),
            "docs_per_sec_staged": round(n_docs / staged, 2)}


def single_run(master: str, extraction_only: bool) -> dict:
    sys.path.insert(0, REPO)
    spark = make_spark(master)
    try:
        ext = bench_extraction(spark, SF_DIR, REPLICATE)
        queries = {} if extraction_only else bench_queries(spark, SF_DIR)
    finally:
        spark.stop()
    out = {"master": master, "sf_dir": SF_DIR, **ext, "queries": queries}
    return out


def child(master: str, extraction_only: bool) -> dict:
    """Fresh JVM per master — required for a fair parallelism comparison."""
    env = dict(os.environ, SPARK_GRAFT_BENCH_CHILD=master,
               SPARK_GRAFT_BENCH_EXTRACTION_ONLY=str(int(extraction_only)))
    p = subprocess.run([sys.executable, os.path.abspath(__file__)], env=env,
                       capture_output=True, text=True, cwd=REPO)
    if p.returncode != 0:
        sys.stderr.write(p.stdout + p.stderr)
        raise RuntimeError(f"bench child {master} failed")
    return json.loads(p.stdout.strip().splitlines()[-1])


def scaling_mode() -> None:
    lo = child("local[8]", extraction_only=True)
    hi = child("local[32]", extraction_only=True)
    eff = {}
    for mode in ("fused", "staged"):
        t8 = lo[f"docs_per_sec_{mode}"]
        t32 = hi[f"docs_per_sec_{mode}"]
        eff[mode] = round((t32 / t8) / (32 / 8), 3)
    report = {"n_docs": hi["n_docs"], "sf_dir": SF_DIR,
              "local8": lo, "local32": hi, "scaling_efficiency": eff}
    with open(os.path.join(REPO, "BENCH.md"), "w") as f:
        f.write(render_bench_md(report))
    print(json.dumps(report))


def render_bench_md(r: dict) -> str:
    e = r["scaling_efficiency"]
    lines = [
        "# BENCH — throughput + N→4N scaling efficiency",
        "",
        "North metric (BASELINE.json): documents/sec end-to-end extraction",
        "throughput with N→4N executor scaling efficiency ≥ 0.8. No real",
        "cluster exists in this sandbox, so the same job runs at two",
        "parallelism levels on identical input (`local[8]` vs `local[32]`,",
        "fresh JVM each) — the sanctioned evidence protocol (BASELINE.md).",
        "",
        f"Corpus: {r['n_docs']} interleaved docs (3 spans each: html/pdf/image)",
        f"derived JVM-side from `{r['sf_dir']}/documents.parquet` ×{REPLICATE}.",
        "",
        "| mode | local[8] docs/s | local[32] docs/s | efficiency (≥0.8 target) |",
        "|---|---|---|---|",
        f"| fused | {r['local8']['docs_per_sec_fused']} | "
        f"{r['local32']['docs_per_sec_fused']} | **{e['fused']}** |",
        f"| staged | {r['local8']['docs_per_sec_staged']} | "
        f"{r['local32']['docs_per_sec_staged']} | **{e['staged']}** |",
        "",
        "Efficiency = (docs_per_sec@32 / docs_per_sec@8) / (32/8).",
        "",
        "Raw timings (sec): "
        f"local[8] fused {r['local8']['extract_fused_sec']}, "
        f"staged {r['local8']['extract_staged_sec']}; "
        f"local[32] fused {r['local32']['extract_fused_sec']}, "
        f"staged {r['local32']['extract_staged_sec']}.",
        "",
        "Reference single-node baseline (BASELINE.md): ~0.08–0.23 docs/s per",
        "worker on the serving path; this batch pipeline's per-core throughput",
        f"is {round(r['local32']['docs_per_sec_fused'] / 32, 2)} docs/s/core "
        "(fused mode at local[32]).",
        "",
    ]
    return "\n".join(lines)


def main() -> None:
    child_master = os.environ.get("SPARK_GRAFT_BENCH_CHILD")
    if child_master:
        ext_only = os.environ.get(
            "SPARK_GRAFT_BENCH_EXTRACTION_ONLY", "0") == "1"
        print(json.dumps(single_run(child_master, ext_only)))
        return
    if "--scaling" in sys.argv:
        scaling_mode()
        return
    r = single_run(f"local[{CPUS}]", extraction_only=False)
    qtimes = dict(r["queries"])
    qtimes["extract_fused"] = r["extract_fused_sec"]
    qtimes["extract_staged"] = r["extract_staged_sec"]
    total = round(sum(qtimes.values()), 3)
    sf = SF_DIR.rstrip("/").split("/")[-1].replace("sf", "")
    print(json.dumps({
        "metric": "end_to_end_bench_sec", "value": total, "unit": "sec",
        "queries": qtimes, "sf": float(sf) if sf else None,
        "n_docs": r["n_docs"],
        "docs_per_sec_fused": r["docs_per_sec_fused"],
        "docs_per_sec_staged": r["docs_per_sec_staged"],
    }))


if __name__ == "__main__":
    main()
