"""Evidence audit for the streaming-ingest dedup epoch (BENCH.md section).

Prints (a) the per-epoch Spark job count (job-group counter) and (b) the
ReadSchema of each accepted-store axis scan — proof that parquet column
pruning bounds what an epoch reads from the store: the exact axis scans
``digest`` only, the band axis ``id + sigs`` only, the verify axis
``id + text`` only.  Cheap: a two-epoch run over a synthetic batch.

    python scripts/ingest_audit.py
"""

from __future__ import annotations

import json
import re
import sys
import tempfile

sys.path.insert(0, "/root/repo")


def read_schemas(spark, df) -> list[str]:
    s = df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode
        .fromString("formatted"))
    return re.findall(r"ReadSchema: struct<([^>]*)>", s)


def main() -> None:
    from apple_ocr_backend_spark.session import get_spark
    from apple_ocr_backend_spark.sources.icelite import Table
    from apple_ocr_backend_spark.streaming.ingest_dedup import (
        _band_rows, ingest_dedup_epoch)

    spark = get_spark(master="local[8]", shuffle_partitions=8)
    sc = spark.sparkContext
    with tempfile.TemporaryDirectory() as d:
        t = Table(d + "/tbl")
        b1 = spark.createDataFrame(
            [(i, f"distinct seed doc {i} with words {i * 7}")
             for i in range(50)], ["doc_id", "text"])
        ingest_dedup_epoch(t, b1, 0, run_id="audit")
        rows = [(100, "distinct seed doc 3 with words 21"),
                (101, "distinct seed doc 5 with words 35 tail"),
                (102, "totally novel content qqq zzz"),
                (103, "totally novel content qqq zzz"),
                (104, None)]
        b2 = spark.createDataFrame(rows, "doc_id LONG, text STRING")
        sc.setJobGroup("epoch", "audit-epoch")
        ingest_dedup_epoch(t, b2, 1, run_id="audit")
        jobs = len(sc.statusTracker().getJobIdsForGroup("epoch"))
        # same epoch shape WITH the band-bucket cap: the over-cap counts
        # ride the decision frame and the bucket-sizing aggregations are
        # plain (un-checkpointed) subplans, so the cap must add ZERO jobs
        # relative to the uncapped epoch
        b3 = spark.createDataFrame(
            [(r[0] + 100, r[1]) for r in rows], "doc_id LONG, text STRING")
        sc.setJobGroup("epoch_capped", "audit-epoch-capped")
        ingest_dedup_epoch(t, b3, 2, run_id="audit", max_bucket=100)
        jobs_capped = len(
            sc.statusTracker().getJobIdsForGroup("epoch_capped"))
        axes = {
            "exact (digest anti-join)":
                t.read(spark).select("digest"),
            "near-dup (stored-signature band rows)":
                _band_rows(t.read(spark).select("id", "sigs"), 12, 4),
            "verify (candidate texts)":
                t.read(spark).select("id", "text"),
        }
        schemas = {k: read_schemas(spark, v) for k, v in axes.items()}
        print(json.dumps({"jobs_per_epoch": jobs,
                          "jobs_per_epoch_max_bucket": jobs_capped,
                          "axis_read_schemas": schemas}, indent=1))
    spark.stop()


if __name__ == "__main__":
    main()
