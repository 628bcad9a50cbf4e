"""Report/export sinks (S6/S9/A5/F7 coverage)."""

from __future__ import annotations

import json
import os

import pytest

from pyspark.sql import functions as F

from apple_ocr_backend_spark.sources.export import (
    export_filters, generate_excel, summary_stats, write_eval_report)

SF = "/root/testdata/sf0.001"


def test_export_filters_and_summary(spark):
    o = spark.read.parquet(f"{SF}/orders.parquet")
    filtered = export_filters(o, date_col="o_orderdate",
                              date_from="1995-06-01", date_to="1996-06-01",
                              o_orderstatus="F")
    n = filtered.count()
    assert 0 < n < o.count()
    assert filtered.filter(F.col("o_orderstatus") != "F").count() == 0
    s = summary_stats(filtered, "o_totalprice").collect()[0]
    assert s["n"] == n and s["min_v"] <= s["avg_v"] <= s["max_v"]


def test_write_eval_report(spark, tmp_path):
    e = spark.read.parquet(f"{SF}/events.parquet").select(
        "event_id", (F.col("value") > 50).alias("match"))
    out = str(tmp_path / "report")
    summary = write_eval_report(e, out)
    assert summary["total"] == e.count()
    assert summary["hits"] == e.filter("match").count()
    assert 0 <= summary["hit_rate_bp"] <= 10000
    with open(os.path.join(out, "summary.json")) as f:
        assert json.load(f) == summary
    back = spark.read.option("header", True).csv(os.path.join(out, "rows_csv"))
    assert back.count() == summary["total"]


def test_generate_excel_gated(spark, tmp_path):
    """openpyxl is absent here: the sink must fail loudly, not silently."""
    df = spark.range(3).toDF("x")
    try:
        import openpyxl  # noqa: F401
        has = True
    except ImportError:
        has = False
    if has:  # pragma: no cover - not this container
        path = generate_excel(df, str(tmp_path / "r.xlsx"))
        assert os.path.exists(path)
    else:
        with pytest.raises(NotImplementedError, match="openpyxl"):
            generate_excel(df, str(tmp_path / "r.xlsx"))
