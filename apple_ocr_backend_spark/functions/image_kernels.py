"""Numpy image kernels for the OCR preprocessing path (no cv2/pillow).

Re-derivations of the reference's image "payload math" on plain numpy —
every kernel is array-vectorized (the only Python loops are over tile
grids or fixed 5x5 window offsets, never over pixels) so it runs inside
Arrow-batched ``mapInPandas`` stages at full speed:

- local-mean adaptive threshold with the reference's parameter formula
  (block = clamp(w//20, 11..51) odd, C = clamp(mean/20, 5..15),
  ``app/pipeline/ocr_adapter_improved.py:315-327``)
- CLAHE (tiled clip-limited histogram equalization,
  ``ocr_adapter_improved.py:233-347``)
- glare reduction with stats-based method select (division by large-kernel
  background vs morphological top-hat, ``ocr_adapter_improved.py:86-199``)
- 5x5 bilateral filter (``ocr_adapter_improved.py:233-347``)
- bilinear resize (``ocr_adapter_improved.py:619-633``)
- row/column ink projections + profile stats for adaptive thresholds
  (``ocr_adapter_improved.py:843-869``)
- projection-band ROI extraction with the min-height / min-width-ratio /
  energy / aspect filters (``ocr_adapter_improved.py:814-936``,
  ``yolo_detector.py:429-438``) and energy-ranked top-k
  (``ocr_adapter.py:327-352``)
- text-orientation detection from projection variance + thickest-band
  position (``ocr_adapter_improved.py:494-616``)
"""

from __future__ import annotations

import numpy as np


# ---------------------------------------------------------------- integral

def _integral(img: np.ndarray) -> np.ndarray:
    """Summed-area table with a zero top row/left column (int64)."""
    s = np.zeros((img.shape[0] + 1, img.shape[1] + 1), dtype=np.int64)
    np.cumsum(np.cumsum(img, axis=0, dtype=np.int64), axis=1, out=s[1:, 1:])
    return s


def local_mean(img: np.ndarray, block: int) -> np.ndarray:
    """Mean over a (block x block) window centered per pixel, borders
    clamped — one integral image, no per-pixel loop."""
    h, w = img.shape
    r = block // 2
    s = _integral(img)
    ys = np.arange(h)
    xs = np.arange(w)
    y0 = np.clip(ys - r, 0, h)[:, None]
    y1 = np.clip(ys + r + 1, 0, h)[:, None]
    x0 = np.clip(xs - r, 0, w)[None, :]
    x1 = np.clip(xs + r + 1, 0, w)[None, :]
    tot = s[y1, x1] - s[y0, x1] - s[y1, x0] + s[y0, x0]
    area = (y1 - y0) * (x1 - x0)
    return tot / area


def adaptive_threshold(img: np.ndarray, block: int | None = None,
                       c: float | None = None) -> np.ndarray:
    """Binary ink mask: 1 where the pixel is darker than its local mean by
    more than C.  Parameter formula matches the reference
    (``ocr_adapter_improved.py:315-327``): block = clamp(w//20, 11..51)
    forced odd; C = clamp(global_mean/20, 5..15)."""
    h, w = img.shape
    if block is None:
        block = int(np.clip(w // 20, 11, 51)) | 1
    if c is None:
        c = float(np.clip(img.mean() / 20.0, 5.0, 15.0))
    return (img < local_mean(img, block) - c).astype(np.uint8)


# ---------------------------------------------------------------- contrast

def clahe(img: np.ndarray, tiles: int = 8, clip_limit: float = 2.0) -> np.ndarray:
    """Contrast-limited adaptive histogram equalization: per-tile clipped
    CDF LUTs, bilinearly interpolated between the four surrounding tile
    centers per pixel (the standard CLAHE construction; reference uses
    cv2.createCLAHE, ``ocr_adapter_improved.py:233-347``)."""
    h, w = img.shape
    ty = max(1, min(tiles, h))
    tx = max(1, min(tiles, w))
    yb = np.linspace(0, h, ty + 1).astype(np.int64)
    xb = np.linspace(0, w, tx + 1).astype(np.int64)
    luts = np.empty((ty, tx, 256), dtype=np.float32)
    for i in range(ty):
        for j in range(tx):
            tile = img[yb[i]:yb[i + 1], xb[j]:xb[j + 1]]
            hist = np.bincount(tile.reshape(-1), minlength=256).astype(np.float64)
            limit = clip_limit * tile.size / 256.0
            excess = np.maximum(hist - limit, 0.0).sum()
            hist = np.minimum(hist, limit) + excess / 256.0
            cdf = np.cumsum(hist)
            luts[i, j] = (cdf - cdf[0]) * 255.0 / max(cdf[-1] - cdf[0], 1e-9)
    # bilinear interpolation between tile-center LUTs
    cy = (yb[:-1] + yb[1:]) / 2.0
    cx = (xb[:-1] + xb[1:]) / 2.0
    ys = np.arange(h, dtype=np.float64)
    xs = np.arange(w, dtype=np.float64)
    iy = np.clip(np.searchsorted(cy, ys) - 1, 0, ty - 2) if ty > 1 else np.zeros(h, np.int64)
    ix = np.clip(np.searchsorted(cx, xs) - 1, 0, tx - 2) if tx > 1 else np.zeros(w, np.int64)
    if ty > 1:
        fy = np.clip((ys - cy[iy]) / np.maximum(cy[iy + 1] - cy[iy], 1e-9), 0, 1)
    else:
        fy = np.zeros(h)
    if tx > 1:
        fx = np.clip((xs - cx[ix]) / np.maximum(cx[ix + 1] - cx[ix], 1e-9), 0, 1)
    else:
        fx = np.zeros(w)
    iy2 = np.minimum(iy + 1, ty - 1)
    ix2 = np.minimum(ix + 1, tx - 1)
    px = img.astype(np.int64)
    v00 = luts[iy[:, None], ix[None, :], px]
    v01 = luts[iy[:, None], ix2[None, :], px]
    v10 = luts[iy2[:, None], ix[None, :], px]
    v11 = luts[iy2[:, None], ix2[None, :], px]
    fy_ = fy.astype(np.float32)[:, None]
    fx_ = fx.astype(np.float32)[None, :]
    # two nested lerps (3 multiplies) instead of the 4-term expansion
    top = v00 + (v01 - v00) * fx_
    bot = v10 + (v11 - v10) * fx_
    out = top + (bot - top) * fy_
    return np.round(out).clip(0, 255).astype(np.uint8)


def bilateral5(img: np.ndarray, sigma_space: float = 2.0,
               sigma_range: float = 40.0) -> np.ndarray:
    """Edge-preserving 5x5 bilateral filter, vectorized over the 25 window
    offsets (never over pixels).  Range weighting keeps stroke/background
    boundaries crisp while flattening texture — the reference's denoise
    step (``ocr_adapter_improved.py:233-347``)."""
    h, w = img.shape
    pad = np.pad(img, 2, mode="edge").astype(np.int16)
    center = pad[2:2 + h, 2:2 + w]
    # range weights come from a 256-entry LUT over |intensity diff| — one
    # gather per offset instead of 36k exp() calls (uint8 domain makes the
    # LUT exact, not an approximation)
    diffs = np.arange(256, dtype=np.float32)
    range_lut = np.exp(-(diffs * diffs) / np.float32(2 * sigma_range ** 2))
    acc = np.zeros((h, w), dtype=np.float32)
    wacc = np.zeros((h, w), dtype=np.float32)
    for dy in range(-2, 3):
        for dx in range(-2, 3):
            shifted = pad[2 + dy:2 + dy + h, 2 + dx:2 + dx + w]
            ws = np.float32(np.exp(-(dy * dy + dx * dx)
                                   / (2 * sigma_space ** 2)))
            wgt = range_lut[np.abs(shifted - center)] * ws
            acc += wgt * shifted
            wacc += wgt
    return np.round(acc / wacc).clip(0, 255).astype(np.uint8)


# --------------------------------------------------------------- morphology

def _sliding_minmax(img: np.ndarray, k: int, op) -> np.ndarray:
    """Rectangular-kernel min/max filter via two separable 1-D passes on
    ``sliding_window_view`` (erode = min, dilate = max)."""
    r = k // 2
    pad_mode = "edge"
    p = np.pad(img, ((r, r), (0, 0)), mode=pad_mode)
    v = np.lib.stride_tricks.sliding_window_view(p, k, axis=0)
    rows = op(v, axis=-1)
    p = np.pad(rows, ((0, 0), (r, r)), mode=pad_mode)
    v = np.lib.stride_tricks.sliding_window_view(p, k, axis=1)
    return op(v, axis=-1)


def erode(img: np.ndarray, k: int = 3) -> np.ndarray:
    return _sliding_minmax(img, k, np.min)


def dilate(img: np.ndarray, k: int = 3) -> np.ndarray:
    return _sliding_minmax(img, k, np.max)


def despeckle(mask: np.ndarray, min_neighbors: int = 2) -> np.ndarray:
    """Drop ink pixels whose 3x3 neighborhood (self included) holds fewer
    than ``min_neighbors`` ink pixels — the binary median/denoise analog
    of the reference's alternate preprocessing paths (isolated salt
    speckle dies, multi-pixel strokes survive).  Used by the fallback OCR
    sweep (``tesseract_adapter.py:86-158`` runs five preprocess paths for
    the same reason: the primary binarization keeps noise the engine
    can't segment through)."""
    ink = (mask > 0)
    p = np.pad(ink, 1)
    h, w = mask.shape
    cnt = sum(p[dy:dy + h, dx:dx + w].astype(np.int16)
              for dy in range(3) for dx in range(3))
    return (ink & (cnt >= min_neighbors)).astype(np.uint8)


def tophat(img: np.ndarray, k: int = 15) -> np.ndarray:
    """White top-hat: img - open(img); isolates bright structures smaller
    than the kernel (the reference's tophat glare method,
    ``ocr_adapter_improved.py:86-199``)."""
    opened = dilate(erode(img, k), k)
    return (img.astype(np.int32) - opened.astype(np.int32)).clip(0, 255).astype(np.uint8)


# -------------------------------------------------------------------- glare

def glare_stats(img: np.ndarray) -> dict:
    """(mean, std, glare_ratio) — the triple the reference's method
    selector keys on (``ocr_adapter_improved.py:86-199``); glare_ratio is
    the fraction of near-saturated pixels."""
    return {"mean": float(img.mean()), "std": float(img.std()),
            "glare_ratio": float((img >= 250).mean())}


def reduce_glare(img: np.ndarray) -> tuple[np.ndarray, str]:
    """Stats-selected glare reduction: no-op when glare_ratio ~ 0;
    division-by-background normalization for broad glare; top-hat removal
    for small specular spots.  Returns (image, method) so callers can log
    the selection the way the reference does."""
    st = glare_stats(img)
    if st["glare_ratio"] < 1e-4:
        return img, "none"
    if st["glare_ratio"] > 0.05:
        bg = local_mean(img, 31).clip(1.0, None)
        out = (img.astype(np.float64) / bg) * st["mean"]
        return np.round(out).clip(0, 255).astype(np.uint8), "division"
    # top-hat responds to ANY locally-bright pixel (e.g. paper between dark
    # strokes), so the subtraction is masked to near-saturated pixels —
    # repair the specular spot, leave legitimate background untouched
    spot = tophat(img, 15)
    sat = img >= 245
    out = img.astype(np.int32)
    out[sat] -= spot.astype(np.int32)[sat]
    return out.clip(0, 255).astype(np.uint8), "tophat"


# ------------------------------------------------------------------- resize

def resize_bilinear(img: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Bilinear resample with half-pixel centers (cv2.INTER_LINEAR analog,
    ``ocr_adapter_improved.py:619-633``)."""
    h, w = img.shape
    ys = (np.arange(out_h) + 0.5) * h / out_h - 0.5
    xs = (np.arange(out_w) + 0.5) * w / out_w - 0.5
    y0 = np.clip(np.floor(ys).astype(np.int64), 0, h - 1)
    x0 = np.clip(np.floor(xs).astype(np.int64), 0, w - 1)
    y1 = np.minimum(y0 + 1, h - 1)
    x1 = np.minimum(x0 + 1, w - 1)
    fy = np.clip(ys - y0, 0, 1)[:, None]
    fx = np.clip(xs - x0, 0, 1)[None, :]
    im = img.astype(np.float64)
    out = (im[y0[:, None], x0[None, :]] * (1 - fy) * (1 - fx)
           + im[y0[:, None], x1[None, :]] * (1 - fy) * fx
           + im[y1[:, None], x0[None, :]] * fy * (1 - fx)
           + im[y1[:, None], x1[None, :]] * fy * fx)
    return np.round(out).clip(0, 255).astype(np.uint8)


# -------------------------------------------------------- projections / ROI

def ink_image(img: np.ndarray, bg_ref: int = 215) -> np.ndarray:
    """Darkness map: how far below the nominal paper level each pixel sits
    (0 for background/glare)."""
    return (bg_ref - img.astype(np.int32)).clip(0, None)


def row_projection(mask: np.ndarray) -> np.ndarray:
    """Per-row ink sums (int64) — the reference's projection profile
    (``ocr_adapter_improved.py:843-869``)."""
    return mask.sum(axis=1, dtype=np.int64)


def profile_stats(profile: np.ndarray) -> dict:
    """mean/median/std/max of a projection profile — the adaptive-threshold
    inputs (A8, ``ocr_adapter_improved.py:843-869``)."""
    return {"mean": float(profile.mean()), "median": float(np.median(profile)),
            "std": float(profile.std()), "max": float(profile.max())}


def smooth_profile(profile: np.ndarray, radius: int = 2) -> np.ndarray:
    """Box smoothing (±radius) with edge clamping — the Gaussian-smooth
    analog on the 1-D profile."""
    k = 2 * radius + 1
    p = np.pad(profile.astype(np.float64), radius, mode="edge")
    c = np.cumsum(np.concatenate(([0.0], p)))
    return (c[k:] - c[:-k]) / k


def find_bands(profile: np.ndarray, img_h: int,
               min_height: int | None = None,
               rel_threshold: float = 0.5,
               refine: bool = True) -> list[tuple[int, int, int]]:
    """Projection bands: smooth -> threshold at mean*rel_threshold ->
    contiguous runs -> boundary refinement on the RAW profile -> min-height
    filter.  Returns [(y0, y1, energy)] in position order; y1 exclusive.

    Boundary refinement matters: smoothing spreads a hard band edge across
    ``radius`` rows, so each candidate run is snapped to the extent of
    raw-profile rows above a small fraction of the run's own peak — exact
    recovery of hard-edged bands, stable on soft edges.  ``refine=False``
    keeps the raw smoothed runs — a genuinely different band hypothesis
    (edges spread by the smoothing radius) used as the second proposal
    source for the NMS merge (P4)."""
    if min_height is None:
        min_height = max(15, img_h // 20)  # yolo_detector.py:429-438
    sm = smooth_profile(profile)
    thr = sm.mean() * rel_threshold
    above = sm > thr
    if not above.any():
        return []
    edges = np.flatnonzero(np.diff(np.concatenate(([0], above.view(np.int8), [0]))))
    bands = []
    raw = profile.astype(np.float64)
    n = len(profile)
    for s, e in zip(edges[::2], edges[1::2]):
        peak = raw[s:e].max()
        if peak <= 0:
            continue
        if not refine:
            if e - s >= min_height:
                bands.append((int(s), int(e), int(raw[s:e].sum())))
            continue
        lo = 0.05 * peak
        # snap: shrink to raw support, then grow while raw stays above lo
        ys, ye = s, e
        while ys < ye and raw[ys] <= lo:
            ys += 1
        while ye > ys and raw[ye - 1] <= lo:
            ye -= 1
        while ys > 0 and raw[ys - 1] > lo:
            ys -= 1
        while ye < n and raw[ye] > lo:
            ye += 1
        if ye - ys >= min_height:
            bands.append((int(ys), int(ye), int(raw[ys:ye].sum())))
    # merge duplicates produced by snapping two runs onto the same support;
    # the merged extent's energy is recomputed over the union (keeping the
    # first band's energy would understate it and mis-rank/mis-filter the
    # merged band downstream)
    merged: list[tuple[int, int, int]] = []
    for b in sorted(bands):
        if merged and b[0] < merged[-1][1]:
            prev = merged[-1]
            y1 = max(prev[1], b[1])
            merged[-1] = (prev[0], y1, int(raw[prev[0]:y1].sum()))
        else:
            merged.append(b)
    return merged


def filter_rois(bands: list[tuple[int, int, int]], img_w: int,
                widths: list[int] | int, min_width_ratio: float = 0.1,
                aspect_lo: float = 2.0, aspect_hi: float = 15.0,
                energy_rel: float = 0.5) -> list[tuple[int, int, int]]:
    """Reference ROI filters (F9): min width ratio 0.1, aspect ratio in
    [2, 15] on the band box, energy > mean_energy * height * 0.5
    (``ocr_adapter_improved.py:885-936``; ``yolo_detector.py:429-438``).
    ``widths`` is the per-band bounding-box width (or one shared value)."""
    if not bands:
        return []
    if isinstance(widths, int):
        widths = [widths] * len(bands)
    mean_row_energy = (sum(b[2] for b in bands)
                       / max(sum(b[1] - b[0] for b in bands), 1))
    out = []
    for (y0, y1, energy), bw in zip(bands, widths):
        hgt = y1 - y0
        aspect = bw / max(hgt, 1)
        if (bw >= min_width_ratio * img_w
                and aspect_lo <= aspect <= aspect_hi
                and energy > mean_row_energy * hgt * energy_rel):
            out.append((y0, y1, energy))
    return out


def nms(boxes, scores, iou_threshold: float = 0.45) -> list[int]:
    """Greedy non-maximum suppression (the ``cv2.dnn.NMSBoxes`` analog the
    reference runs over YOLO detections, ``yolo_detector.py:337-378``):
    ``boxes`` (N, 4) as [y0, x0, y1, x1] half-open, ``scores`` (N,).
    Returns kept indices in descending-score order; equal scores keep the
    earlier index (deterministic across platforms)."""
    boxes = np.asarray(boxes, dtype=np.float64).reshape(-1, 4)
    scores = np.asarray(scores, dtype=np.float64)
    n = len(scores)
    order = np.lexsort((np.arange(n), -scores))
    areas = ((boxes[:, 2] - boxes[:, 0]).clip(min=0)
             * (boxes[:, 3] - boxes[:, 1]).clip(min=0))
    alive = np.ones(n, dtype=bool)
    keep: list[int] = []
    for i in order:
        if not alive[i]:
            continue
        keep.append(int(i))
        iy0 = np.maximum(boxes[i, 0], boxes[:, 0])
        ix0 = np.maximum(boxes[i, 1], boxes[:, 1])
        iy1 = np.minimum(boxes[i, 2], boxes[:, 2])
        ix1 = np.minimum(boxes[i, 3], boxes[:, 3])
        inter = (iy1 - iy0).clip(min=0) * (ix1 - ix0).clip(min=0)
        iou = inter / np.maximum(areas[i] + areas - inter, 1e-9)
        alive &= iou <= iou_threshold
        alive[i] = False
    return keep


def top_k_bands(bands: list[tuple[int, int, int]], k: int) -> list[tuple[int, int, int]]:
    """Energy-ranked top-k, returned in position order (W2,
    ``ocr_adapter.py:327-352``)."""
    best = sorted(bands, key=lambda b: (-b[2], b[0]))[:k]
    return sorted(best)


def band_x_extent(mask: np.ndarray, y0: int, y1: int) -> tuple[int, int]:
    """Column support of a row band (bounding box in x) from the ink mask."""
    cols = mask[y0:y1].sum(axis=0)
    nz = np.flatnonzero(cols)
    if len(nz) == 0:
        return 0, 0
    return int(nz[0]), int(nz[-1] + 1)


# -------------------------------------------------------------- orientation

def detect_orientation(img: np.ndarray, bg_ref: int = 215) -> int:
    """Text orientation in {0, 90, 180, 270} from projection variance +
    thickest-band position (``ocr_adapter_improved.py:494-616``):

    - horizontal text lines make the ROW projection spiky (variance wins);
      vertical lines (a 90/270-rotated page) make the COLUMN projection
      spiky;
    - the thickest band is the document header; its position (top/bottom,
      left/right) disambiguates 0 vs 180 and 90 vs 270.

    Angle convention: the value returned is how far the page has been
    rotated counter-clockwise from upright — rotate clockwise by it (i.e.
    ``np.rot90(img, -angle // 90)``) to restore upright."""
    ink = ink_image(img, bg_ref)
    rows = ink.sum(axis=1, dtype=np.int64).astype(np.float64)
    cols = ink.sum(axis=0, dtype=np.int64).astype(np.float64)
    # normalize by length so the comparison is shape-independent
    rv = rows.var() / max(rows.mean(), 1.0) ** 2
    cv = cols.var() / max(cols.mean(), 1.0) ** 2
    horizontal = rv >= cv
    profile = rows if horizontal else cols
    n = len(profile)
    bands = find_bands(profile.astype(np.int64), n, min_height=4)
    if not bands:
        return 0
    thick = max(bands, key=lambda b: (b[1] - b[0], -b[0]))
    center = (thick[0] + thick[1]) / 2.0
    first_half = center < n / 2.0
    if horizontal:
        return 0 if first_half else 180
    return 90 if first_half else 270
