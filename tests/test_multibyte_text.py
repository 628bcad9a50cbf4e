"""Multi-byte (UTF-8) guard for the char-indexed text kernels.

``fingerprint`` and the repetition signals bound their sweeps with
CHAR-based ``substring``/``length``/``slice`` expressions; these tests pin
that Spark's char semantics and md5-of-UTF-8-bytes agree with the DuckDB
oracle formulas on non-ASCII corpora (accents, CJK, emoji, combining
marks) — so the prefix bounds can never drift into byte-offset territory
on either engine (round-3 verdict #8).
"""

from __future__ import annotations

import duckdb
import pandas as pd
from pyspark.sql import functions as F

from apple_ocr_backend_spark.functions import text as TX

DOCS = [
    (1, "héllo wörld héllo wörld héllo naïve café déjà vu résumé"),
    (2, "漢字テキストの重複検出は文字単位で行う 漢字テキストの重複検出は文字単位で行う"),
    (3, "emoji 🌍 text 🌍 emoji 🌍 text 🌍 emoji 🌍 mixé"),
    (4, "é combining acute é combining acute é"),
    (5, "ascii only baseline text with several distinct plain tokens here"),
    # long CJK doc: every 8-char window straddles multibyte boundaries
    (6, "".join("汉字串" + str(i) + " " for i in range(300))),
]


def _pdf():
    return pd.DataFrame(DOCS, columns=["doc_id", "text"])


def _spark_df(spark):
    return spark.createDataFrame(_pdf())


def test_fingerprint_multibyte_matches_duckdb(spark):
    got = {r.doc_id: r.fp for r in
           _spark_df(spark).select(
               "doc_id", TX.fingerprint(F.col("text")).alias("fp"))
           .collect()}
    con = duckdb.connect()
    con.register("documents", _pdf())
    want = dict(con.execute("""
        WITH bounded AS (
          SELECT doc_id, substring(text, 1, 4096) AS t FROM documents)
        SELECT doc_id,
               list_min([md5(substring(t, i, 8))
                         FOR i IN range(1, GREATEST(length(t)-7, 1) + 1)])
        FROM bounded""").fetchall())
    assert got == want


def test_char_length_semantics_match_duckdb(spark):
    """F.length / DuckDB length both count CHARS, not bytes — the premise
    every prefix bound relies on."""
    got = {r.doc_id: r.n for r in
           _spark_df(spark).select(
               "doc_id", F.length("text").alias("n")).collect()}
    con = duckdb.connect()
    con.register("documents", _pdf())
    want = dict(con.execute(
        "SELECT doc_id, length(text) FROM documents").fetchall())
    assert got == want
    assert got[2] == len(DOCS[1][1])  # python len = chars, ties all three


def test_repetition_signals_multibyte_match_duckdb(spark):
    t = F.col("text")
    got = {r.doc_id: (r.top_token_q, r.top_bigram_q) for r in
           _spark_df(spark).select(
               "doc_id",
               TX.top_token_frac_q(t).alias("top_token_q"),
               TX.top_bigram_frac_q(t).alias("top_bigram_q"))
           .collect()}
    con = duckdb.connect()
    con.register("documents", _pdf())
    want = {r[0]: (r[1], r[2]) for r in con.execute(r"""
        WITH toks AS (
          SELECT doc_id,
                 string_split(trim(regexp_replace(text, '\s+', ' ', 'g')),
                              ' ') AS tk
          FROM documents),
        bg AS (
          SELECT doc_id, tk[1:4096] AS tks,
                 [tk[i] || CASE WHEN i + 1 <= LEAST(len(tk), 4096)
                                THEN ' ' || tk[i+1] ELSE '' END
                  FOR i IN range(1, GREATEST(LEAST(len(tk), 4096) - 1, 1)
                                 + 1)] AS bgs
          FROM toks)
        SELECT doc_id,
               CAST(FLOOR(list_max(list_transform(list_distinct(tks),
                            t -> len(list_filter(tks, y -> y = t))))
                          / len(tks) * 1000000) AS BIGINT),
               CAST(FLOOR(list_max(list_transform(list_distinct(bgs),
                            t -> len(list_filter(bgs, y -> y = t))))
                          / len(bgs) * 1000000) AS BIGINT)
        FROM bg""").fetchall()}
    assert got == want
