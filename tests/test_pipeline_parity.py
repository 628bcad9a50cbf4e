"""Spark pipeline == pandas oracle, bit-for-bit, under span-sequence equality
(kind, text, media_ref, order) — the BASELINE.json correctness invariant.

Both the staged (anti-join early-stop) and fused (single UDF) OCR topologies
must produce identical results, independent of partitioning.
"""

from __future__ import annotations

import pandas as pd
import pytest

from apple_ocr_backend_spark.config import ExtractConfig
from apple_ocr_backend_spark.sources.corpus import (
    make_corpus, extract_docs_oracle, docs_spark_schema)
from apple_ocr_backend_spark.plans.pipeline import extract_docs

CFG = ExtractConfig()


def _spans_map(df: pd.DataFrame) -> dict[str, list[tuple]]:
    out = {}
    for doc_id, spans in zip(df["doc_id"], df["spans"]):
        norm = []
        for s in spans:
            d = s.asDict() if hasattr(s, "asDict") else dict(s)
            norm.append((d["kind"], d["text"], d["media_ref"], d["order"]))
        out[doc_id] = norm
    return out


def _to_spark_docs(spark, docs: pd.DataFrame):
    rows = [(d, [(s["kind"], s["text"], s["media_ref"], s["offset"])
                 for s in spans])
            for d, spans in zip(docs["doc_id"], docs["spans"])]
    return spark.createDataFrame(rows, schema=docs_spark_schema())


@pytest.fixture(scope="module")
def corpus():
    docs = make_corpus(150, seed=42)
    golden = extract_docs_oracle(docs, CFG)
    return docs, golden


@pytest.mark.parametrize("mode", ["staged", "fused"])
def test_spark_matches_oracle(spark, corpus, mode):
    docs, golden = corpus
    sdf = _to_spark_docs(spark, docs)
    got = extract_docs(sdf, CFG, mode=mode).toPandas()
    want = _spans_map(golden)
    have = _spans_map(got)
    assert set(have) == set(want)
    mismatches = {k for k in want if want[k] != have[k]}
    assert not mismatches, (
        f"{len(mismatches)} docs mismatch, e.g. "
        f"{sorted(mismatches)[0]}:\nwant {want[sorted(mismatches)[0]]}\n"
        f"have {have[sorted(mismatches)[0]]}")


def test_partitioning_invariance(spark, corpus):
    """Same result under a different partition count (shuffle-order
    independence — the determinism the quantized A1 score buys)."""
    docs, golden = corpus
    sdf = _to_spark_docs(spark, docs).repartition(13)
    got = extract_docs(sdf, CFG, mode="staged", num_partitions=7).toPandas()
    assert _spans_map(got) == _spans_map(golden)


def test_fused_kernel_streams_per_batch(spark, corpus):
    """Round-2 verdict #1: the fused mapInArrow kernel must stream one output
    RecordBatch per input Arrow batch (no whole-partition pandas buffering),
    and a (doc, salt) group straddling a batch boundary must still reassemble
    into the identical final sequence (reassemble_partials merges multiple
    partials per key by the unique (offset, span_pos, out_rank) sort)."""
    import pyarrow as pa
    from apple_ocr_backend_spark.plans.pipeline import _mono_partial_kernel

    # direct kernel probe: ONE (doc, salt) group split across two input
    # batches -> two emitted RecordBatches (streaming), two partial arrays
    b = pd.DataFrame({
        "doc_id": ["d"] * 4, "salt": [0] * 4, "span_pos": [0, 1, 2, 3],
        "offset": [0, 1, 2, 3], "kind": ["text"] * 4,
        "media_ref": pd.array([None] * 4, dtype="string"),
        "text": ["alpha one", "beta two", "gamma three", "delta four"]})
    batches = [
        pa.RecordBatch.from_pandas(b.iloc[:2].reset_index(drop=True),
                                   preserve_index=False),
        pa.RecordBatch.from_pandas(b.iloc[2:].reset_index(drop=True),
                                   preserve_index=False)]
    out = list(_mono_partial_kernel(CFG.as_dict())(iter(batches)))
    assert len(out) == 2, "kernel buffered batches instead of streaming"
    # each batch emitted one partial array for the same (doc, salt)
    assert [o.num_rows for o in out] == [1, 1]

    # end-to-end: tiny Arrow batches force straddling everywhere; the fused
    # result must still equal the oracle bit-for-bit
    docs, golden = corpus
    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch")
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "5")
    try:
        got = extract_docs(_to_spark_docs(spark, docs), CFG,
                           mode="fused").toPandas()
    finally:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", old)
    assert _spans_map(got) == _spans_map(golden)


def test_giant_doc_salting(spark):
    """A giant doc splits across salts and still reassembles in exact order."""
    cfg = ExtractConfig(salt_span_budget=16)
    docs = make_corpus(5, seed=7, giant_docs=1, giant_spans=200)
    golden = extract_docs_oracle(docs, cfg)
    sdf = _to_spark_docs(spark, docs)
    got = extract_docs(sdf, cfg, mode="fused").toPandas()
    assert _spans_map(got) == _spans_map(golden)
    g = [s for s in got[got["doc_id"] == "doc_giant_0"]["spans"].iloc[0]]
    orders = [x["order"] for x in g]
    assert orders == list(range(len(orders))) and len(orders) >= 200
