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


# -------------------------------------------------- TTA serial-plate clips

# The video analog of the reference client's scan window: it captures up
# to 10 frames of the same physical serial plate and most are motion-
# degraded; recognition must pick the sharp one
# (ios/.../SerialScannerViewModel.swift:34-38,197-282).  Here: every
# frame renders the SAME planted 12-char serial (image_corpus's md5
# '_c{i}' arithmetic, so the oracle recomputes it in SQL), exactly one
# frame is clean (its read is a perfect template match, conf 1.0) and the
# rest carry heavy ink dropout.  Measured over doc_id < 4000 (28k
# frames): every clean-frame read is conf 1.0 and exact; NO degraded
# frame reaches conf 1.0; best-frame arg-max is exact 4000/4000 while a
# frame-0-only reader misreads 2,265/4000 — the arg-max is load-bearing.
TTA_BAD_DROPOUT = 0.65


def planted_tta(doc_id: int) -> dict:
    """Analytic answer key: frame count and the clean frame's index."""
    n = 3 + _h(doc_id, "tn") % 4
    return {"n_frames": n, "good": _h(doc_id, "tg") % n}


def _serial_plate(doc_id: int, k: int, dropout: float) -> np.ndarray:
    """Frame ``k``'s plate: the planted serial in the 5x7 glyph font with
    per-frame jitter and per-frame dropout — the (doc_id, k)-seeded twin
    of ``image_corpus.render_serial_image`` (whose single rng seed would
    make every frame identical)."""
    from ..functions.glyph_ocr import render_text_bitmap
    from .image_corpus import PLATE_H, SERIAL_LEN, planted_serial

    text = planted_serial(doc_id)
    jitter = [_h(doc_id, f"tj{k}_{i}") % 3 for i in range(SERIAL_LEN)]
    mask = render_text_bitmap(text, scale=2, gap=4, jitter=jitter).astype(bool)
    if dropout > 0:
        rng = np.random.default_rng(doc_id * 101 + k + 1)
        mask &= rng.random(mask.shape) >= dropout
    h, w = mask.shape
    ys = np.arange(PLATE_H)[:, None]
    xs = np.arange(w + 20)[None, :]
    img = (215 + (xs * 7 + ys * 13) % 5).astype(np.uint8)
    y0, x0 = (PLATE_H - h) // 2, 10
    plate = img[y0:y0 + h, x0:x0 + w]
    plate[mask] = 60
    return img


def render_doc_serial_video(doc_id: int) -> bytes:
    """AVI clip of serial plates (one clean frame among degraded ones).

    Frame widths are jitter-independent (text length x glyph pitch), so
    all frames of a doc share one shape as the encoder requires."""
    g = planted_tta(doc_id)
    frames = [_serial_plate(doc_id, k,
                            0.0 if k == g["good"] else TTA_BAD_DROPOUT)
              for k in range(g["n_frames"])]
    return encode_avi_gray(frames, fps=FPS)
