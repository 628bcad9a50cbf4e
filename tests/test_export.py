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


def test_generate_excel_roundtrip(spark, tmp_path):
    """S6 runs without openpyxl (vendored stdlib writer): 3 sheets, styled
    header, values readable back byte-for-byte via the stdlib reader."""
    from apple_ocr_backend_spark.sources.xlsx_lite import read_xlsx
    df = spark.createDataFrame(
        [(1, "ios", 0.9), (2, "mac", 0.7), (3, "ios", 0.8)],
        "id long, source string, confidence double")
    path = generate_excel(df, str(tmp_path / "r.xlsx"),
                          value_col="confidence", group_col="source",
                          filters={"date_from": "2024-01-01"})
    assert os.path.exists(path)
    sheets = read_xlsx(path)
    assert list(sheets) == ["data", "summary", "metadata"]
    header, rows = sheets["data"]
    assert header == ["id", "source", "confidence"]
    assert sorted(rows) == [[1, "ios", 0.9], [2, "mac", 0.7], [3, "ios", 0.8]]
    sheader, srows = sheets["summary"]
    assert sheader == ["source", "n", "min_v", "max_v", "avg_v"]
    assert {r[0]: r[1] for r in srows} == {"ios": 2, "mac": 1}
    mheader, mrows = sheets["metadata"]
    meta = {r[0]: r[1] for r in mrows}
    assert meta["record_count"] == "3"
    assert meta["filter:date_from"] == "2024-01-01"


def test_xlsx_lite_styled_header_and_widths(tmp_path):
    """The workbook XML carries the bold+fill header style and custom column
    widths (the styling parity with the openpyxl path)."""
    import zipfile
    from apple_ocr_backend_spark.sources.xlsx_lite import write_xlsx
    p = write_xlsx(str(tmp_path / "s.xlsx"),
                   {"data": (["a", "long_column"], [[1, "x" * 70]])})
    with zipfile.ZipFile(p) as z:
        sheet = z.read("xl/worksheets/sheet1.xml").decode()
        styles = z.read("xl/styles.xml").decode()
    assert 's="1"' in sheet              # header row styled
    assert 'width="60"' in sheet         # width clamped at 60
    assert "<b/>" in styles and "FFD9E1F2" in styles


def test_xlsx_lite_value_types_roundtrip(tmp_path):
    from apple_ocr_backend_spark.sources.xlsx_lite import read_xlsx, write_xlsx
    rows = [[1, 2.5, True, None, "<&\"'>"], [-7, 0.0, False, "ok", ""]]
    p = write_xlsx(str(tmp_path / "t.xlsx"), {"s": (["i", "f", "b", "o", "e"],
                                                    rows)})
    header, back = read_xlsx(p)["s"]
    assert header == ["i", "f", "b", "o", "e"]
    assert back == rows


# ----------------------------- S10 xlsx source ----------------------------- #

def _write_csv(tmp_path, headers, rows, name="serials.csv"):
    import csv
    p = str(tmp_path / name)
    with open(p, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(headers)
        w.writerows(rows)
    return p


def test_xlsx_source_fuzzy_header_exact_normalized(tmp_path):
    """'Serial N0.' normalizes to 'serialn0' == norm('serial no') — the
    reference's O/0 confusion fold (generate_image.py:50-53)."""
    from apple_ocr_backend_spark.sources.xlsx import load_serials
    p = _write_csv(tmp_path, ["id", "Serial N0.", "notes"],
                   [[1, "c02y95a8jg5h", "x"],
                    [2, "  F5KVN0DKHJC5 ", "y"],
                    [3, "SHORT", "z"],
                    [4, "", ""]])
    assert load_serials(p, "serial no") == ["C02Y95A8JG5H", "F5KVN0DKHJC5"]


def test_xlsx_source_substring_fallback(tmp_path):
    from apple_ocr_backend_spark.sources.xlsx import load_serials
    # no exact match for 'sn'; 'Device Serial Number' contains 'serial'
    p = _write_csv(tmp_path, ["Device Serial Number", "other"],
                   [["DGKFL96JDRVG", "a"]])
    assert load_serials(p, "sn") == ["DGKFL96JDRVG"]


def test_xlsx_source_missing_column_raises(tmp_path):
    from apple_ocr_backend_spark.sources.xlsx import load_serials
    p = _write_csv(tmp_path, ["alpha", "beta"], [["x", "y"]])
    with pytest.raises(ValueError, match="not found"):
        load_serials(p, "gamma")


def test_xlsx_source_reads_real_workbook(tmp_path):
    """S10 end-to-end on an actual .xlsx file (stdlib writer + reader):
    fuzzy header match and 12-char filtering behave exactly like the CSV
    branch."""
    from apple_ocr_backend_spark.sources.xlsx import load_serials
    from apple_ocr_backend_spark.sources.xlsx_lite import write_xlsx
    p = write_xlsx(str(tmp_path / "serials.xlsx"), {"Sheet1": (
        ["id", "Serial N0.", "notes"],
        [[1, "c02y95a8jg5h", "x"], [2, "  F5KVN0DKHJC5 ", "y"],
         [3, "SHORT", "z"], [4, None, None]])})
    assert load_serials(p, "serial no") == ["C02Y95A8JG5H", "F5KVN0DKHJC5"]


def test_xlsx_source_to_spark_broadcast_side(spark, tmp_path):
    from apple_ocr_backend_spark.sources.xlsx import load_serials, to_spark
    p = _write_csv(tmp_path, ["serial"],
                   [["C02Y95A8JG5H"], ["F5KVN0DKHJC5"]])
    df = to_spark(spark, load_serials(p))
    assert df.count() == 2 and df.columns == ["serial"]


def test_workbook_frames_three_sheets(spark):
    """The 3-sheet workbook content (data/summary/metadata) is computed
    Spark-side and testable without openpyxl."""
    from apple_ocr_backend_spark.sources.export import workbook_frames
    df = spark.createDataFrame(
        [(1, "ios", 0.9), (2, "mac", 0.7), (3, "ios", 0.8)],
        "id long, source string, confidence double")
    frames = workbook_frames(df, value_col="confidence", group_col="source",
                             filters={"source": None, "date_from": "2024-01-01"})
    assert set(frames) == {"data", "summary", "metadata"}
    assert len(frames["data"]) == 3
    assert set(frames["summary"]["source"]) == {"ios", "mac"}
    meta = dict(zip(frames["metadata"]["field"], frames["metadata"]["value"]))
    assert meta["record_count"] == "3"
    assert meta["filter:date_from"] == "2024-01-01"


def test_xlsx_lite_sheet_name_with_quotes(tmp_path):
    """Sheet names land in an XML attribute — double quotes must be
    escaped or the workbook is unparseable."""
    from apple_ocr_backend_spark.sources.xlsx_lite import read_xlsx, write_xlsx
    p = write_xlsx(str(tmp_path / "q.xlsx"),
                   {'my "quoted" sheet': (["a"], [[1]])})
    sheets = read_xlsx(p)
    assert list(sheets) == ['my "quoted" sheet']


def test_xlsx_lite_nonfinite_floats_blank(tmp_path):
    """repr(inf) is not a valid XML numeric value — non-finite floats must
    round-trip as blank (None), like NaN (round-3 advice finding)."""
    from apple_ocr_backend_spark.sources.xlsx_lite import read_xlsx, write_xlsx
    p = write_xlsx(str(tmp_path / "nf.xlsx"), {"s": (
        ["a", "b", "c", "d"],
        [[float("inf"), float("-inf"), float("nan"), 1.5]])})
    header, rows = read_xlsx(p)["s"]
    assert rows == [[None, None, None, 1.5]]


def test_xlsx_lite_rows_truncated_to_header(tmp_path):
    """A sheet whose data rows are wider than the header must not leak the
    stray cells — callers index by header width (round-3 advice finding).
    Built by hand-patching a written sheet so the reader sees a ragged
    workbook a foreign writer could produce."""
    import re
    import zipfile
    from apple_ocr_backend_spark.sources.xlsx_lite import read_xlsx, write_xlsx
    p = write_xlsx(str(tmp_path / "rag.xlsx"),
                   {"s": (["a", "b"], [[1, 2], [3, 4]])})
    with zipfile.ZipFile(p) as z:
        names = {n: z.read(n) for n in z.namelist()}
    sheet = names["xl/worksheets/sheet1.xml"].decode()
    # append a third cell to data row 2 (beyond the 2-column header)
    sheet = sheet.replace(
        '<c r="B2" t="n"><v>2</v></c>',
        '<c r="B2" t="n"><v>2</v></c><c r="C2" t="n"><v>99</v></c>')
    names["xl/worksheets/sheet1.xml"] = sheet.encode()
    with zipfile.ZipFile(p, "w") as z:
        for n, data in names.items():
            z.writestr(n, data)
    header, rows = read_xlsx(p)["s"]
    assert header == ["a", "b"]
    assert rows == [[1, 2], [3, 4]]


def test_xlsx_lite_empty_header_keeps_data(tmp_path):
    """A foreign workbook whose header ROW has no cells must not truncate
    every data row to [] (round-4 advice): the truncation width falls back
    to the widest data row when the header is empty."""
    import re
    import zipfile
    from apple_ocr_backend_spark.sources.xlsx_lite import read_xlsx, write_xlsx
    p = write_xlsx(str(tmp_path / "nohead.xlsx"),
                   {"s": (["a", "b"], [[1, 2], [3, 4]])})
    with zipfile.ZipFile(p) as z:
        names = {n: z.read(n) for n in z.namelist()}
    sheet = names["xl/worksheets/sheet1.xml"].decode()
    # empty out the header row's cells (a foreign writer can emit this)
    sheet = re.sub(r'<row r="1"[^>]*>.*?</row>', '<row r="1"></row>',
                   sheet, count=1, flags=re.S)
    names["xl/worksheets/sheet1.xml"] = sheet.encode()
    with zipfile.ZipFile(p, "w") as z:
        for n, data in names.items():
            z.writestr(n, data)
    header, rows = read_xlsx(p)["s"]
    assert header == []
    assert rows == [[1, 2], [3, 4]]
