"""Param-sweep orchestration (reference scripts/param_sweep.py:77-240):
grid cells evaluated as distributed jobs, accuracy discriminates configs."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from apple_ocr_backend_spark.sources.derived import (docs_from_documents,
                                                     serial_expr)
from scripts.param_sweep import sweep, save_best_params

SF = "/root/testdata/sf0.001"


def test_sweep_discriminates_and_caches_best(spark, tmp_path):
    n = 30
    docs = docs_from_documents(spark, SF).filter(
        F.col("doc_id") < f"doc_{n:08d}")
    golden = (spark.read.parquet(f"{SF}/documents.parquet")
              .filter(F.col("doc_id") < n)
              .select(F.format_string("doc_%08d", F.col("doc_id"))
                      .alias("doc_id"),
                      serial_expr(F.col("doc_id")).alias("serial")))

    results = sweep(spark, docs, golden, {"min_confidence": [0.30, 0.97]})
    assert len(results) == 2
    by_conf = {r["min_confidence"]: r for r in results}

    # 0.30 admits both passes: every doc emits candidates, and the majority
    # recover the exact serial (docs whose corruption sits at positions 3-4
    # WITH a mappable digit at positions 1-2 can never emit it — the
    # reference's position-rule dict-collision semantics, reproduced exactly)
    good = by_conf[0.30]
    assert good["total"] == n and good["detected"] == n
    assert good["any_acc_bp"] >= 5_000
    assert 0 < good["top1_hits"] <= good["any_hits"]

    # 0.97 rejects every token (confidences 0.55 / 0.95): nothing detected
    bad = by_conf[0.97]
    assert bad["detected"] == 0 and bad["any_acc_bp"] == 0

    # ranking puts the accurate cell first; best-params cache round-trips
    assert results[0]["min_confidence"] == 0.30
    path = str(tmp_path / "best.json")
    best = save_best_params(results, path)
    with open(path) as f:
        saved = json.load(f)
    assert saved == best
    assert saved["params"]["min_confidence"] == 0.30
    assert saved["accuracy_bp"] == results[0]["top1_acc_bp"]
