"""Span assembly: explode input docs, passthrough text spans, reassemble
ordered output spans.

Hard part (SURVEY.md §7): exact span ordering across shuffles.  Every
extracted row carries the total-order key ``(offset, span_pos, out_rank)``
(document position, tie-break by array position for duplicate offsets —
FIXTURES.md §3E — then within-span rank); reassembly sorts by that key and
assigns the dense per-doc ``order`` demanded by the golden schema.
"""

from __future__ import annotations

import numpy as np
import pandas as pd


def explode_docs_pandas(docs: pd.DataFrame) -> pd.DataFrame:
    """docs(doc_id, spans:list[dict]) -> rows (doc_id, span_pos, kind, text,
    media_ref, offset).  Pandas-side (oracle / fixtures); the Spark pipeline
    uses posexplode instead."""
    n = docs["spans"].str.len().fillna(0).astype(int).to_numpy()
    if len(docs) == 0 or int(n.sum()) == 0:
        return pd.DataFrame(columns=["doc_id", "span_pos", "kind", "text",
                                     "media_ref", "offset"])
    doc_ids = np.repeat(docs["doc_id"].to_numpy(), n)
    flat = [s for spans in docs["spans"] for s in (spans or [])]
    out = pd.DataFrame({
        "doc_id": doc_ids,
        "kind": [s.get("kind") for s in flat],
        "text": [s.get("text") for s in flat],
        "media_ref": [s.get("media_ref") for s in flat],
        "offset": [s.get("offset") for s in flat],
    })
    out["span_pos"] = out.groupby("doc_id", sort=False).cumcount()
    return out[["doc_id", "span_pos", "kind", "text", "media_ref", "offset"]]


def extract_text_spans(df: pd.DataFrame) -> pd.DataFrame:
    """kind='text' passthrough: whitespace-normalized, empties dropped."""
    from .html_extract import _empty_out
    if df.empty:
        return _empty_out()
    src = df.reset_index(drop=True)
    text = (src["text"].fillna("").str.replace(r"\s+", " ", regex=True).str.strip())
    keep = text.str.len() > 0
    out = src.loc[keep.to_numpy(), ["doc_id", "span_pos", "offset"]].copy()
    out["out_rank"] = 0
    out["kind"] = "main_text"
    out["text"] = text[keep].to_numpy()
    out["media_ref"] = None
    return out[["doc_id", "span_pos", "offset", "out_rank", "kind", "text", "media_ref"]]


def reassemble_pandas(extracted: pd.DataFrame) -> pd.DataFrame:
    """Extracted rows -> docs(doc_id, spans:list[dict(kind,text,media_ref,order)]).

    Total order inside a doc: (offset, span_pos, out_rank); ``order`` is the
    dense 0-based rank (FIXTURES.md §2).
    """
    if extracted.empty:
        return pd.DataFrame({"doc_id": pd.Series(dtype=object),
                             "spans": pd.Series(dtype=object)})
    d = extracted.sort_values(["doc_id", "offset", "span_pos", "out_rank"],
                              kind="stable", ignore_index=True)
    d["order"] = d.groupby("doc_id", sort=False).cumcount()
    span_struct = [
        {"kind": k, "text": t, "media_ref": m, "order": int(o)}
        for k, t, m, o in zip(d["kind"], d["text"], d["media_ref"], d["order"])
    ]
    d = d.assign(span=span_struct)
    out = (d.groupby("doc_id", sort=True)["span"].agg(list)
             .reset_index().rename(columns={"span": "spans"}))
    return out
