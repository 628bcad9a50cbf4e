"""Template-match OCR for the rendered serial plates (no OCR engine).

The sandbox has no EasyOCR/Tesseract, so the OCR-text recovery step is
re-derived from first principles at the scale this corpus renders: a 5x7
monospace glyph font (classic LED-matrix shapes, distinguishable by
construction — slashed zero, serifed one), drawn at integer scale with
per-glyph jitter and deterministic ink dropout, then recognized by
segmentation + block-max downsampling + nearest-template Hamming match.
The same font table drives rendering and recognition, so correctness is
end-to-end checkable: the catalog oracle recomputes the PLANTED string
from md5 arithmetic while Spark must read it back off actual pixels.

Reference analog: the EasyOCR `readtext` allowlist path
(``app/pipeline/ocr_adapter_improved.py:639-811``) — allowlist here is
the font table itself; confidence is template-match similarity.
"""

from __future__ import annotations

import numpy as np

CHARSET = "ABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789"

# 5x7 glyphs, 5 bits per row (MSB = leftmost column)
_FONT_ROWS = {
    "A": (0b01110, 0b10001, 0b10001, 0b11111, 0b10001, 0b10001, 0b10001),
    "B": (0b11110, 0b10001, 0b11110, 0b10001, 0b10001, 0b10001, 0b11110),
    "C": (0b01110, 0b10001, 0b10000, 0b10000, 0b10000, 0b10001, 0b01110),
    "D": (0b11100, 0b10010, 0b10001, 0b10001, 0b10001, 0b10010, 0b11100),
    "E": (0b11111, 0b10000, 0b11110, 0b10000, 0b10000, 0b10000, 0b11111),
    "F": (0b11111, 0b10000, 0b11110, 0b10000, 0b10000, 0b10000, 0b10000),
    "G": (0b01110, 0b10001, 0b10000, 0b10111, 0b10001, 0b10001, 0b01111),
    "H": (0b10001, 0b10001, 0b11111, 0b10001, 0b10001, 0b10001, 0b10001),
    "I": (0b01110, 0b00100, 0b00100, 0b00100, 0b00100, 0b00100, 0b01110),
    "J": (0b00111, 0b00010, 0b00010, 0b00010, 0b00010, 0b10010, 0b01100),
    "K": (0b10001, 0b10010, 0b10100, 0b11000, 0b10100, 0b10010, 0b10001),
    "L": (0b10000, 0b10000, 0b10000, 0b10000, 0b10000, 0b10000, 0b11111),
    "M": (0b10001, 0b11011, 0b10101, 0b10101, 0b10001, 0b10001, 0b10001),
    "N": (0b10001, 0b11001, 0b10101, 0b10011, 0b10001, 0b10001, 0b10001),
    "O": (0b01110, 0b10001, 0b10001, 0b10001, 0b10001, 0b10001, 0b01110),
    "P": (0b11110, 0b10001, 0b10001, 0b11110, 0b10000, 0b10000, 0b10000),
    "Q": (0b01110, 0b10001, 0b10001, 0b10001, 0b10101, 0b10010, 0b01101),
    "R": (0b11110, 0b10001, 0b10001, 0b11110, 0b10100, 0b10010, 0b10001),
    "S": (0b01111, 0b10000, 0b10000, 0b01110, 0b00001, 0b00001, 0b11110),
    "T": (0b11111, 0b00100, 0b00100, 0b00100, 0b00100, 0b00100, 0b00100),
    "U": (0b10001, 0b10001, 0b10001, 0b10001, 0b10001, 0b10001, 0b01110),
    "V": (0b10001, 0b10001, 0b10001, 0b10001, 0b10001, 0b01010, 0b00100),
    "W": (0b10001, 0b10001, 0b10001, 0b10101, 0b10101, 0b11011, 0b10001),
    "X": (0b10001, 0b01010, 0b00100, 0b00100, 0b00100, 0b01010, 0b10001),
    "Y": (0b10001, 0b01010, 0b00100, 0b00100, 0b00100, 0b00100, 0b00100),
    "Z": (0b11111, 0b00001, 0b00010, 0b00100, 0b01000, 0b10000, 0b11111),
    "0": (0b01110, 0b10001, 0b10011, 0b10101, 0b11001, 0b10001, 0b01110),
    "1": (0b00100, 0b01100, 0b00100, 0b00100, 0b00100, 0b00100, 0b01110),
    "2": (0b01110, 0b10001, 0b00001, 0b00110, 0b01000, 0b10000, 0b11111),
    "3": (0b11111, 0b00010, 0b00100, 0b00010, 0b00001, 0b10001, 0b01110),
    "4": (0b00010, 0b00110, 0b01010, 0b10010, 0b11111, 0b00010, 0b00010),
    "5": (0b11111, 0b10000, 0b11110, 0b00001, 0b00001, 0b10001, 0b01110),
    "6": (0b00110, 0b01000, 0b10000, 0b11110, 0b10001, 0b10001, 0b01110),
    "7": (0b11111, 0b00001, 0b00010, 0b00100, 0b01000, 0b01000, 0b01000),
    "8": (0b01110, 0b10001, 0b10001, 0b01110, 0b10001, 0b10001, 0b01110),
    "9": (0b01110, 0b10001, 0b10001, 0b01111, 0b00001, 0b00010, 0b01100),
}


def glyph_bitmap(ch: str) -> np.ndarray:
    """(7, 5) uint8 0/1 bitmap for one charset character."""
    rows = _FONT_ROWS[ch]
    return np.array([[(r >> (4 - c)) & 1 for c in range(5)] for r in rows],
                    dtype=np.uint8)


# (36, 7, 5) stacked templates in CHARSET order, built once per process.
# Each template is normalized through the SAME tight-crop + block-max-pool
# path recognition applies to glyph crops, so narrow glyphs (I, 1) match
# their own rendering exactly instead of being penalized for bbox width.
_TEMPLATES = None


def templates() -> np.ndarray:
    global _TEMPLATES
    if _TEMPLATES is None:
        norm = []
        for c in CHARSET:
            g = glyph_bitmap(c)
            xs = np.flatnonzero(g.sum(axis=0))
            norm.append(_pool_to_grid(g[:, xs[0]:xs[-1] + 1]))
        _TEMPLATES = np.stack(norm)
    return _TEMPLATES


def render_text_bitmap(text: str, scale: int = 2, gap: int = 4,
                       jitter: list[int] | None = None) -> np.ndarray:
    """0/1 ink bitmap of ``text`` at integer ``scale`` with ``gap`` blank
    columns between glyphs and optional per-glyph vertical jitter (rows
    shifted down by jitter[i]; canvas grows by max jitter)."""
    gh, gw = 7 * scale, 5 * scale
    if not text:
        return np.zeros((gh, 0), dtype=np.uint8)
    jitter = list(jitter or [])
    # pad (never truncate) so text longer than the caller's jitter list
    # still renders every glyph instead of silently dropping the tail
    jitter += [0] * (len(text) - len(jitter))
    h = gh + max(jitter)
    w = len(text) * (gw + gap) - gap
    out = np.zeros((h, w), dtype=np.uint8)
    x = 0
    for ch, j in zip(text, jitter):
        g = np.kron(glyph_bitmap(ch), np.ones((scale, scale), dtype=np.uint8))
        out[j:j + gh, x:x + gw] = g
        x += gw + gap
    return out


def _pool_to_grid(mask: np.ndarray) -> np.ndarray:
    """Block-max downsample a tight glyph crop to the 7x5 template grid —
    robust to scale, jitter, and dropped border pixels.  reduceat over the
    linspace bin starts is bit-identical to the per-cell slice-max (incl.
    the at-least-one-row rule for crops smaller than the grid: equal
    consecutive indices reduce to the single element, which is exactly the
    ``max(y1, y0+1)`` slice) — fuzz-pinned in tests/test_glyph_ocr.py."""
    hh, ww = mask.shape
    yb = np.linspace(0, hh, 8).astype(np.int64)[:7]
    xb = np.linspace(0, ww, 6).astype(np.int64)[:5]
    rows = np.maximum.reduceat(mask, yb, axis=0)
    return np.maximum.reduceat(rows, xb, axis=1)


# flat int8 templates (36, 35), built lazily beside `templates()`
_TEMPLATES_FLAT = None


def _templates_flat() -> np.ndarray:
    global _TEMPLATES_FLAT
    if _TEMPLATES_FLAT is None:
        _TEMPLATES_FLAT = templates().reshape(36, -1).astype(np.int8)
    return _TEMPLATES_FLAT


def _match(grid: np.ndarray) -> tuple[str, float]:
    """Nearest template by Hamming distance; confidence = 1 - dist/35."""
    dists = np.abs(_templates_flat() - grid.reshape(-1).astype(np.int8))
    dists = dists.sum(axis=1)
    best = int(np.argmin(dists))  # ties -> lowest CHARSET index
    return CHARSET[best], 1.0 - float(dists[best]) / 35.0


def _match_tight(tight: np.ndarray) -> tuple[str, float]:
    """Match a tight glyph crop, tolerating one lost boundary row/column:
    ink dropout can erase an entire edge row of a glyph (e.g. the bottom
    tip of V at small scale), which shrinks the tight bbox and misaligns
    the pooling bins.  Re-pool with a one-pixel empty pad on each edge and
    keep the best match; the unpadded grid is tried first and wins ties
    (strict improvement to switch), so clean glyphs are unaffected."""
    h, w = tight.shape
    ch, conf = _match(_pool_to_grid(tight))
    if conf == 1.0:
        return ch, conf
    grids = []
    for dy0, dy1, dx0, dx1 in ((1, 0, 0, 0), (0, 1, 0, 0),
                               (0, 0, 1, 0), (0, 0, 0, 1)):
        padded = np.zeros((h + dy0 + dy1, w + dx0 + dx1), dtype=tight.dtype)
        padded[dy0:dy0 + h, dx0:dx0 + w] = tight
        grids.append(_pool_to_grid(padded).reshape(-1))
    # one batched distance table (4 pad variants x 36 templates)
    d = np.abs(_templates_flat()[None, :, :]
               - np.asarray(grids, dtype=np.int8)[:, None, :]).sum(axis=2)
    best = d.argmin(axis=1)  # ties -> lowest CHARSET index per variant
    for v in range(4):
        pconf = 1.0 - float(d[v, best[v]]) / 35.0
        if pconf > conf:
            ch, conf = CHARSET[int(best[v])], pconf
    return ch, conf


def recognize_text(mask: np.ndarray, expect_chars: int | None = None,
                   min_gap: int = 3) -> tuple[str, float]:
    """Read a one-line ink mask back to text: trim to the text band,
    segment glyphs on column gaps >= ``min_gap`` (falling back to
    fixed-pitch division when ``expect_chars`` is known and the gap
    segmentation disagrees — the reference's 12-char shape prior,
    ``app/pipeline/ocr_adapter.py:152-159``), then nearest-template match
    per glyph.  Returns (text, min glyph confidence)."""
    rows = np.flatnonzero(mask.sum(axis=1))
    if len(rows) == 0:
        return "", 0.0
    band = mask[rows[0]:rows[-1] + 1]
    cols = band.sum(axis=0)
    nz = np.flatnonzero(cols)
    band = band[:, nz[0]:nz[-1] + 1]
    cols = cols[nz[0]:nz[-1] + 1]
    # gap segmentation: runs of >= min_gap empty columns split glyphs.
    # Run bounds come from the diff of the empty mask (loop over the ~11
    # gaps, not the ~170 columns); the band is tight-cropped so every
    # empty run is interior and a trailing gap cannot exist.
    empty = (cols == 0).astype(np.int8)
    run_starts = np.flatnonzero(np.diff(np.concatenate(([0], empty)))
                                == 1)
    run_ends = np.flatnonzero(np.diff(np.concatenate((empty, [0])))
                              == -1) + 1
    segs, start = [], 0
    for s, e in zip(run_starts, run_ends):
        if e - s >= min_gap and s > start:
            segs.append((start, int(s)))
            start = int(e)
    segs.append((start, len(cols)))
    if expect_chars is not None and len(segs) != expect_chars:
        pitch = band.shape[1] / expect_chars
        segs = [(int(round(i * pitch)), int(round((i + 1) * pitch)))
                for i in range(expect_chars)]
    out, conf = [], 1.0
    for x0, x1 in segs:
        crop = band[:, x0:x1]
        ys = np.flatnonzero(crop.sum(axis=1))
        xs = np.flatnonzero(crop.sum(axis=0))
        if len(ys) == 0:
            out.append("?")
            conf = 0.0
            continue
        tight = crop[ys[0]:ys[-1] + 1, xs[0]:xs[-1] + 1]
        ch, c = _match_tight(tight)
        out.append(ch)
        conf = min(conf, c)
    return "".join(out), conf
