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
    # reference-parity metadata (app/services/param_cache.py:30-52)
    assert saved["preset"] == "sweep"
    assert saved["accuracy"] == results[0]["top1_acc_bp"] / 10_000
    assert isinstance(saved["timestamp"], float)
    assert len(saved["date"]) == 19  # YYYY-MM-DD HH:MM:SS


def test_param_cache_roundtrip_fallback_and_listing(tmp_path):
    """Preset cache semantics (app/services/param_cache.py:30-91): metadata
    shape, deterministic injectable timestamp, missing/corrupt -> fallback
    preset -> None, params-only accessor, preset listing."""
    from apple_ocr_backend_spark.sources import param_cache as PC
    d = str(tmp_path)
    saved = PC.save_best_params(d, "etched", {"low_text": 0.3}, 0.85,
                                now=1_700_000_000.0)
    assert saved == {"preset": "etched", "params": {"low_text": 0.3},
                     "accuracy": 0.85, "timestamp": 1_700_000_000.0,
                     "date": saved["date"]}
    assert PC.load_best_params(d, "etched") == saved
    # fallback chain: missing preset falls through to the cached one
    assert PC.load_best_params(d, "sticker", fallback="etched") == saved
    assert PC.load_best_params(d, "sticker") is None
    assert PC.get_best_params(d, "sticker", fallback="etched") \
        == {"low_text": 0.3}
    # corrupt file behaves like missing (reference returns None on decode
    # errors) and still honors the fallback
    with open(PC.cache_path(d, "sticker"), "w") as f:
        f.write("{not json")
    assert PC.load_best_params(d, "sticker") is None
    assert PC.get_best_params(d, "sticker", fallback="etched") \
        == {"low_text": 0.3}
    listing = PC.list_cached_presets(d)
    assert set(listing) == {"etched"}
    assert listing["etched"]["accuracy"] == 0.85
