"""Deterministic synthetic video corpus (uncompressed AVI payloads).

The video twin of ``image_corpus.py``/``audio_corpus.py``: every frame
pixel derives from ``md5(f"{doc_id}_{tag}")`` arithmetic, so the planted
per-frame geometry — frame count, band position, band height, ink value —
is computable in plain SQL while the Spark side must recover it from the
actual AVI bytes through the nested-RIFF walk -> DIB row decode -> numpy
reduction chain (``functions/avi_codec.py``).

Clip layout (all constants mirrored in ``plans/catalog.py`` oracle SQL):
- frames 24 x 32 gray, background 200, fps 10
- n_frames = 2 + H('vn') % 4
- frame k carries one horizontal ink band: rows
  [y0, y0 + bh) with y0 = H('vy{k}') % 12, bh = 4 + H('vh{k}') % 8
  (y0 + bh <= 22 < 24, so the band always fits), ink value
  v = 40 + H('vv{k}') % 40 (always darker than the background)

Closed-form per-frame stats: ink_rows = bh (rows whose min < background),
ink_min = v (the frame minimum).  The encoder plants an odd-sized JUNK
chunk between the header and movi lists, so readers that do not honor
RIFF pad bytes desynchronize.
"""

from __future__ import annotations

import hashlib

import numpy as np

from ..functions.avi_codec import encode_avi_gray

FRAME_H, FRAME_W = 24, 32
BACKGROUND = 200
FPS = 10


def _h(doc_id: int, tag: str) -> int:
    """First 6 md5 hex digits as an int — matches DuckDB
    ``('0x' || substr(md5(...), 1, 6))::BIGINT``."""
    return int(hashlib.md5(f"{doc_id}_{tag}".encode()).hexdigest()[:6], 16)


def planted_clip(doc_id: int) -> dict:
    """The analytic answer key for one document (what the oracle SQL
    computes): per-frame (y0, band_height, ink_value)."""
    n = 2 + _h(doc_id, "vn") % 4
    frames = [{"y0": _h(doc_id, f"vy{k}") % 12,
               "bh": 4 + _h(doc_id, f"vh{k}") % 8,
               "ink": 40 + _h(doc_id, f"vv{k}") % 40}
              for k in range(n)]
    return {"n_frames": n, "frames": frames}


def render_doc_video(doc_id: int) -> bytes:
    """AVI payload for ``doc_id`` (see module docstring)."""
    g = planted_clip(doc_id)
    frames = []
    for f in g["frames"]:
        img = np.full((FRAME_H, FRAME_W), BACKGROUND, dtype=np.uint8)
        img[f["y0"]:f["y0"] + f["bh"], :] = f["ink"]
        frames.append(img)
    return encode_avi_gray(frames, fps=FPS)
