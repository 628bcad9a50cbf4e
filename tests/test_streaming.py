"""Structured-Streaming layer: incremental extraction parity + event-time
windows.  AvailableNow drains existing files then stops, so these tests are
deterministic and bounded."""

from __future__ import annotations

import os

import pytest

from apple_ocr_backend_spark.config import ExtractConfig
from apple_ocr_backend_spark.sources.corpus import make_corpus, extract_docs_oracle
from apple_ocr_backend_spark.streaming.stream_extract import (
    stream_extract, windowed_event_counts)
from tests.test_pipeline_parity import _to_spark_docs, _spans_map

CFG = ExtractConfig()
SF = "/root/testdata/sf0.001"


def test_stream_extract_matches_batch(spark, tmp_path):
    docs = make_corpus(40, seed=11)
    golden = _spans_map(extract_docs_oracle(docs, CFG))
    sdf = _to_spark_docs(spark, docs)
    in_dir = str(tmp_path / "in")
    # two files -> at least one micro-batch boundary exercised
    sdf.limit(20).write.parquet(os.path.join(in_dir, "a"))
    sdf.subtract(sdf.limit(20)).write.parquet(os.path.join(in_dir, "b"))

    q = stream_extract(spark, in_dir + "/*", str(tmp_path / "tbl"),
                       str(tmp_path / "ckpt"), CFG,
                       max_files_per_trigger=1)
    q.awaitTermination(120)

    from apple_ocr_backend_spark.sources.icelite import Table
    out = Table(str(tmp_path / "tbl")).read(spark).toPandas()
    assert len(out) == len(docs)
    assert _spans_map(out) == golden


def test_stream_epoch_replay_is_idempotent(spark, tmp_path):
    """A replayed epoch id must not double-append (exactly-once ledger)."""
    docs = make_corpus(10, seed=3)
    sdf = _to_spark_docs(spark, docs)
    in_dir = str(tmp_path / "in")
    sdf.write.parquet(in_dir)

    tbl_dir = str(tmp_path / "tbl")
    q = stream_extract(spark, in_dir, tbl_dir, str(tmp_path / "ckpt"), CFG)
    q.awaitTermination(120)
    from apple_ocr_backend_spark.sources.icelite import Table
    t = Table(tbl_dir)
    n1 = t.read(spark).count()
    snaps1 = len(t.snapshots())

    # replay epoch 0 against a fresh checkpoint (simulates failure recovery)
    q2 = stream_extract(spark, in_dir, tbl_dir, str(tmp_path / "ckpt2"), CFG)
    q2.awaitTermination(120)
    assert t.read(spark).count() == n1
    assert len(t.snapshots()) == snaps1


def test_windowed_event_counts_stream_equals_batch(spark, tmp_path):
    import datetime
    events = spark.read.parquet(f"{SF}/events.parquet").select(
        "ts", "event_type", "value")
    max_ts = events.agg({"ts": "max"}).collect()[0][0]
    # append mode emits a window only once the watermark (max event time -
    # 10 min) passes its end — the trailing windows stay open forever on a
    # finite source, so the batch expectation excludes them
    horizon = max_ts - datetime.timedelta(minutes=10)
    batch = {(str(r["w_start"]), r["event_type"]): (r["n"], r["sum_q"])
             for r in windowed_event_counts(events).collect()
             if r["w_end"] <= horizon}
    assert batch, "horizon filter left no windows — corpus too small"

    in_dir = str(tmp_path / "ev")
    events.write.parquet(in_dir)
    stream = (spark.readStream.schema(events.schema).parquet(in_dir))
    q = (windowed_event_counts(stream)
         .writeStream.format("memory").queryName("winagg")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = {(str(r["w_start"]), r["event_type"]): (r["n"], r["sum_q"])
           for r in spark.sql("select * from winagg").collect()}
    assert got == batch
