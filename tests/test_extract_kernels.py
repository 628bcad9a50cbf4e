"""Hand-computed golden fixtures for the HTML / PDF / OCR extraction kernels
and the end-to-end pandas oracle (FIXTURES.md §3 classes A/B/C/D/E)."""

from __future__ import annotations

import pandas as pd
import pytest

from apple_ocr_backend_spark.config import ExtractConfig
from apple_ocr_backend_spark.operators.html_extract import extract_html
from apple_ocr_backend_spark.operators.pdf_extract import extract_pdf
from apple_ocr_backend_spark.operators.ocr_extract import (
    parse_tokens, pass_candidates, recover_ocr)
from apple_ocr_backend_spark.sources.corpus import (
    make_corpus, extract_docs_oracle, gen_serial, corrupt_serial)
from apple_ocr_backend_spark.functions import serials as K

import numpy as np

CFG = ExtractConfig()


def _span_df(kind, text, media_ref=None, doc_id="d1", span_pos=0, offset=0):
    return pd.DataFrame([{"doc_id": doc_id, "span_pos": span_pos,
                          "offset": offset, "kind": kind, "text": text,
                          "media_ref": media_ref}])


# --------------------------------------------------------------------------- #
# HTML
# --------------------------------------------------------------------------- #

HTML = ("<html><head><title>Page</title><style>p{x}</style></head><body>"
        "<nav><a href='/'>Home</a> <a href='/a'>About</a></nav>"
        "<article>"
        "<p>The quick brown fox jumps over the lazy dog today.</p>"
        "<p>Second paragraph with exactly seven useful words here.</p>"
        "</article>"
        "<p>tiny</p>"  # below min_words
        "<div><li><a href='/x'>buy now cheap deals great offers</a></li></div>"  # link farm
        "<p>Inline <b>bold</b> markup stays but the text is <i>kept</i> whole.</p>"
        "<footer>contact us at <a href='/c'>corp</a> street number nine</footer>"
        "</body></html>")


def test_html_golden():
    out = extract_html(_span_df("html", HTML), CFG)
    assert list(out["text"]) == [
        "The quick brown fox jumps over the lazy dog today.",
        "Second paragraph with exactly seven useful words here.",
        "Inline bold markup stays but the text is kept whole.",
    ]
    assert list(out["out_rank"]) == [0, 1, 2]
    assert (out["kind"] == "main_text").all()
    assert out["media_ref"].isna().all()


def test_html_link_farm_and_zones_dropped():
    # a <li> of pure link text: link_ratio 1.0 -> dropped even if long
    farm = "<li><a href='/x'>one two three four five six seven eight</a></li>"
    out = extract_html(_span_df("html", f"<body>{farm}</body>"), CFG)
    assert out.empty
    # nav/footer/header/aside subtrees never contribute
    zones = ("<nav><p>one two three four five six</p></nav>"
             "<header><p>one two three four five six</p></header>"
             "<aside><p>one two three four five six</p></aside>"
             "<footer><p>one two three four five six</p></footer>")
    assert extract_html(_span_df("html", zones), CFG).empty


def test_html_tag_density():
    # 6 words, 8 inline tags -> density > 0.5 -> dropped
    dense = "<p><b>a</b> <b>b</b> <b>c</b> <b>d</b> one two three four five six</p>"
    out = extract_html(_span_df("html", dense), CFG)
    assert out.empty


# --------------------------------------------------------------------------- #
# PDF
# --------------------------------------------------------------------------- #

def test_pdf_golden():
    # two blocks; records deliberately shuffled; same-y merge on line 2
    recs = [
        "72,100,10|first line of block one",
        "72,112,10|second line of block one",
        "300,112,10|right cell",
        "72,160,10|lonely block two",  # gap 48 > 1.8*10
    ]
    shuffled = "\n".join([recs[3], recs[1], recs[0], recs[2]])
    out = extract_pdf(_span_df("pdf", shuffled), CFG)
    assert list(out["text"]) == [
        "first line of block one\nsecond line of block one right cell",
        "lonely block two",
    ]
    assert list(out["out_rank"]) == [0, 1]


def test_pdf_malformed_records_dropped():
    out = extract_pdf(_span_df("pdf", "nonsense\n72,100,10|ok line\n|broken"), CFG)
    assert list(out["text"]) == ["ok line"]


# --------------------------------------------------------------------------- #
# OCR recovery
# --------------------------------------------------------------------------- #

def test_parse_tokens():
    t = parse_tokens(pd.Series(["C02Y95A8JG5H@0.9 junk@0.5 bad-token x@1"]))
    assert list(t["token"]) == ["C02Y95A8JG5H", "junk", "x"]
    assert list(t["conf"]) == [0.9, 0.5, 1.0]
    assert list(t["token_idx"]) == [0, 1, 3]


def test_pass_candidates_clean_serial():
    # One clean valid serial at conf .9: shaping 12-char -> x1.1, 11 distinct
    # -> x1.05 => 1.0 (capped); quality x1.1 x1.05 -> 1.0 (capped)
    t = parse_tokens(pd.Series(["C02Y95A8JG5H@0.9"]))
    c = pass_candidates(t, CFG)
    assert "C02Y95A8JG5H" in set(c["serial"])
    row = c[c["serial"] == "C02Y95A8JG5H"].iloc[0]
    assert row["conf"] == pytest.approx(1.0)
    assert row["norm"] == K.normalize_ambiguous(
        pd.Series(["C02Y95A8JG5H"]), position_aware=True)[0]


def test_pass_candidates_corruption_recovered():
    # C02Y95A8JG5H corrupted: 0->O at pos 1 — expansion must regenerate a
    # valid variant mapping to the same normalized bucket
    t = parse_tokens(pd.Series(["CO2Y95A8JG5H@0.9"]))
    c = pass_candidates(t, CFG)
    norms = set(c["norm"])
    assert K.normalize_ambiguous(pd.Series(["C02Y95A8JG5H"]),
                                 position_aware=True)[0] in norms


def test_recover_ocr_early_stop():
    cfg = ExtractConfig(early_stop_confidence=0.9)
    # pass 1 has a high-conf serial -> pass 2 (different serial) is never read
    s1, s2 = "C9XACFFHWK43", "F9WHJKMPRV76"  # expansion fixed points
    df = _span_df("image", f"{s1}@0.95 | {s2}@0.99", media_ref="m://d1/0")
    out = recover_ocr(df, cfg)
    assert list(out["text"]) == [s1]
    assert (out["kind"] == "ocr_text").all()
    assert list(out["media_ref"]) == ["m://d1/0"]
    # low first pass -> both passes read, two candidates, A2-merged
    df2 = _span_df("image", f"{s1}@0.40 | {s2}@0.99", media_ref="m://d1/0")
    out2 = recover_ocr(df2, cfg)
    assert set(out2["text"]) == {s1, s2}
    # pass-2 serial has higher confidence -> rank 0
    assert list(out2.sort_values("out_rank")["text"])[0] == s2


def test_recover_ocr_a2_repeat_boost():
    # same serial in two executed passes: fold max+0.05
    s = "C9XACFFHWK43"
    df = _span_df("image", f"{s}@0.50 | {s}@0.60")
    out = recover_ocr(df, ExtractConfig(early_stop_confidence=0.99))
    assert list(out["text"]) == [s]


def test_recover_ocr_junk_only():
    df = _span_df("image", "QQ@0.5 WWW@0.4 | ZZZZ@0.3")
    out = recover_ocr(df, CFG)
    assert out.empty  # detection miss -> no ocr_text spans (FIXTURES §3E)


def test_recover_ocr_sliding_window():
    s = "C9XACFFHWK43"
    df = _span_df("image", f"XX{s}9@0.9")  # 15-char token, serial inside
    out = recover_ocr(df, CFG)
    assert s in set(out["text"])


# --------------------------------------------------------------------------- #
# End-to-end oracle on synthetic corpus
# --------------------------------------------------------------------------- #

def test_oracle_end_to_end_smoke():
    docs = make_corpus(120, seed=42)
    out = extract_docs_oracle(docs, CFG)
    assert len(out) == len(docs)                      # every doc present
    assert set(out["doc_id"]) == set(docs["doc_id"])
    # determinism
    out2 = extract_docs_oracle(make_corpus(120, seed=42), CFG)
    pd.testing.assert_frame_equal(out, out2)
    # order is dense 0..n-1 per doc
    for spans in out["spans"]:
        assert [s["order"] for s in spans] == list(range(len(spans)))
    # at least some of every output kind
    kinds = {s["kind"] for spans in out["spans"] for s in spans}
    assert kinds <= {"main_text", "ocr_text"} and kinds == {"main_text", "ocr_text"}
    # media_ref carried only on ocr_text
    for spans in out["spans"]:
        for s in spans:
            assert (s["media_ref"] is not None) == (s["kind"] == "ocr_text")


def test_duplicate_offset_tiebreak():
    docs = pd.DataFrame([{
        "doc_id": "d",
        "spans": [
            {"kind": "text", "text": "alpha beta", "media_ref": None, "offset": 0},
            {"kind": "text", "text": "gamma delta", "media_ref": None, "offset": 0},
        ]}])
    out = extract_docs_oracle(docs, CFG)
    assert [s["text"] for s in out["spans"][0]] == ["alpha beta", "gamma delta"]


def test_gen_serial_always_extended_valid():
    rng = np.random.RandomState(3)
    ser = pd.Series([gen_serial(rng) for _ in range(200)])
    assert K.validate_extended(ser)["is_valid"].all()
    # corrupted forms still expand back to a variant in the same norm bucket
    rng2 = np.random.RandomState(4)
    for s in ser[:30]:
        c = corrupt_serial(s, rng2)
        variants = set(K._expand_one(c, True))
        norms = set(K.normalize_ambiguous(pd.Series(sorted(variants)), True))
        assert K.normalize_ambiguous(pd.Series([s]), True)[0] in norms
