"""Deterministic synthetic document-image corpus (PNG payloads).

Every pixel derives from ``md5(f"{doc_id}_{tag}")`` arithmetic, so the
planted geometry — band count, band rows, rotation, glare flag — is
computable in plain SQL (DuckDB: ``('0x' || substr(md5(...), 1, 6))::BIGINT``)
while the Spark side must recover it from the actual pixels through the
full decode -> preprocess -> projection -> band-extraction chain.  That
makes the image-path catalog entries end-to-end oracle-checkable without
an image library on the oracle side.

Layout (all constants mirrored in ``plans/catalog.py`` oracle SQL):
- canvas 144 x 256, light background 215 + (x*7 + y*13) % 5
- n_bands = 2 + H('n') % 3 text bands, one per vertical slot of
  ``144 // n_bands`` rows; band 0 is the 24-row header (thickest —
  orientation detection keys on it), bands k>0 are 16 + H('h{k}') % 6
  rows starting at slot_top + 8 + H('o{k}') % 5
- strokes: columns 16..239, ink (value 60 + x % 16) wherever
  ``(x + phase) % 4 != 3`` with phase = H('p') % 4 — 3-on/1-off vertical
  strokes, 168 inked columns exactly
- optional glare: if H('g') % 4 == 0, a radius-3 saturated disc at
  row 3 (margin-only, so it never clips a band)
- rotation (when requested): ``np.rot90`` by H('r') % 4 quarter turns

The renderer parallels the reference's fixture corpus role
(synthetic inputs with known answers, ``app/tests/conftest.py``): the
image is the payload, the md5 arithmetic is the answer key.
"""

from __future__ import annotations

import hashlib

import numpy as np

from ..functions.png_codec import encode_png_gray  # noqa: F401  (renderer's encode half)

H_CANVAS, W_CANVAS = 144, 256
X0_STROKE, X1_STROKE = 16, 240
HEADER_H = 24


def _h(doc_id: int, tag: str) -> int:
    """First 6 md5 hex digits as an int — matches Spark
    ``conv(substring(md5(...),1,6),16,10)`` and DuckDB
    ``('0x' || substr(md5(...),1,6))::BIGINT``."""
    return int(hashlib.md5(f"{doc_id}_{tag}".encode()).hexdigest()[:6], 16)


def planted_geometry(doc_id: int) -> dict:
    """The analytic answer key for one document (what the oracle SQL
    computes)."""
    n_bands = 2 + _h(doc_id, "n") % 3
    slot = H_CANVAS // n_bands
    bands = []
    for k in range(n_bands):
        if k == 0:
            y0, bh = 8, HEADER_H
        else:
            y0 = k * slot + 8 + _h(doc_id, f"o{k}") % 5
            bh = 16 + _h(doc_id, f"h{k}") % 6
        bands.append((y0, y0 + bh))
    return {
        "n_bands": n_bands,
        "bands": bands,
        "phase": _h(doc_id, "p") % 4,
        "glare": _h(doc_id, "g") % 4 == 0,
        "rot_quads": _h(doc_id, "r") % 4,
    }


def render_doc_image(doc_id: int, rotate: bool = False,
                     glare: bool = True) -> np.ndarray:
    """uint8 grayscale page for ``doc_id`` (see module docstring)."""
    g = planted_geometry(doc_id)
    ys = np.arange(H_CANVAS)[:, None]
    xs = np.arange(W_CANVAS)[None, :]
    img = (215 + (xs * 7 + ys * 13) % 5).astype(np.uint8)
    stroke_cols = np.arange(X0_STROKE, X1_STROKE)
    inked = (stroke_cols + g["phase"]) % 4 != 3
    stroke_vals = (60 + stroke_cols % 16).astype(np.uint8)
    for y0, y1 in g["bands"]:
        band = img[y0:y1, X0_STROKE:X1_STROKE]
        band[:, inked] = stroke_vals[inked]
    if glare and g["glare"]:
        cx = 40 + _h(doc_id, "gx") % (W_CANVAS - 80)
        dy = ys - 3
        dx = xs - cx
        img[(dy * dy + dx * dx) <= 9] = 255
    if rotate and g["rot_quads"]:
        img = np.ascontiguousarray(np.rot90(img, g["rot_quads"]))
    return img


# ----------------------------------------------------------- serial plates

SERIAL_LEN = 12
PLATE_H = 40


def planted_serial(doc_id: int) -> str:
    """The 12-char string drawn on the plate — pure md5 arithmetic, so the
    oracle recomputes it in SQL (char i = CHARSET[H('c{i}') % 36])."""
    from ..functions.glyph_ocr import CHARSET
    return "".join(CHARSET[_h(doc_id, f"c{i}") % 36]
                   for i in range(SERIAL_LEN))


def render_serial_image(doc_id: int, scale: int = 2,
                        dropout: float = 0.03,
                        text: str | None = None) -> np.ndarray:
    """uint8 grayscale serial plate: the planted string (or an explicit
    12-char ``text``) rendered in the 5x7 glyph font at ``scale`` with
    per-glyph vertical jitter (H('j{i}') % 3 rows) and deterministic ink
    dropout — non-trivial but exactly recoverable input for the
    template-match OCR."""
    from ..functions.glyph_ocr import render_text_bitmap
    if text is None:
        text = planted_serial(doc_id)
    jitter = [_h(doc_id, f"j{i}") % 3 for i in range(SERIAL_LEN)]
    mask = render_text_bitmap(text, scale=scale, gap=2 * scale,
                              jitter=jitter).astype(bool)
    if dropout > 0:
        rng = np.random.default_rng(doc_id)
        mask &= rng.random(mask.shape) >= dropout
    h, w = mask.shape
    ys = np.arange(PLATE_H)[:, None]
    xs = np.arange(w + 20)[None, :]
    img = (215 + (xs * 7 + ys * 13) % 5).astype(np.uint8)
    y0, x0 = (PLATE_H - h) // 2, 10
    plate = img[y0:y0 + h, x0:x0 + w]
    plate[mask] = 60
    return img


# ------------------------------------------------- degraded fallback plates

DEGRADED_SCALE = 3
DEGRADED_DROPOUT = 0.08
SALT_CELL = 6        # one speck candidate per 6x6 grid cell...
SALT_P = 0.25        # ...with this probability, jittered in the inner 4x4


def render_degraded_serial_image(doc_id: int) -> np.ndarray:
    """Fallback-sweep fixture plate: the planted serial at scale 3 with
    heavier ink dropout (0.08) plus isolated background salt specks —
    ink-valued single pixels, at most one per 6x6 grid cell (jittered
    inside the cell's inner 4x4, so two specks are never closer than
    2 px) and never within one pixel of glyph ink.  Isolation makes the
    planted string exactly recoverable: a 3x3 neighbor-count despeckle
    removes every speck and nothing else.  The specks break BOTH
    single-pass reads — gap segmentation shatters (every speck column
    splits a "glyph") and the fixed-pitch prior mis-prices the pitch off
    the speck-stretched bounding box — which is exactly the regime the
    reference routes to its Tesseract fallback sweep
    (``app/pipeline/tesseract_adapter.py:86-237``); measured over
    doc_id < 4000: plain reads 0/4000 exact, sweep 4000/4000."""
    img = render_serial_image(doc_id, scale=DEGRADED_SCALE,
                              dropout=DEGRADED_DROPOUT)
    clean = render_serial_image(doc_id, scale=DEGRADED_SCALE, dropout=0.0)
    ink = (clean < 128).astype(np.uint8)
    p = np.pad(ink, 1)
    h, w = img.shape
    near_ink = sum(p[dy:dy + h, dx:dx + w]
                   for dy in range(3) for dx in range(3)) > 0
    rng = np.random.default_rng(doc_id + 7 ** 9)
    out = img.copy()
    for cy in range(0, h - SALT_CELL + 1, SALT_CELL):
        for cx in range(0, w - SALT_CELL + 1, SALT_CELL):
            if rng.random() < SALT_P:
                y = cy + 1 + int(rng.integers(0, 4))
                x = cx + 1 + int(rng.integers(0, 4))
                if not near_ink[y, x]:
                    out[y, x] = 60
    return out
