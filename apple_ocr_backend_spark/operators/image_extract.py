"""Image-payload extraction stages: decode -> preprocess -> ROI -> orient.

These are the real (non-stubbed) versions of the reference's image path,
built on the from-scratch PNG codec (``functions/png_codec.py``) and the
numpy kernel suite (``functions/image_kernels.py``) — no cv2/pillow.
Each stage is an Arrow-batched ``mapInPandas``: the Python level iterates
documents within a batch exactly like the reference's per-image cv2 calls
(``app/pipeline/ocr_adapter_improved.py:1346-1471``); every pixel loop is
vectorized numpy.  At scale the binary column arrives from the table scan
(these stages never shuffle — they are map-only over whatever partitioning
the scan produced); ``render_media`` exists because this sandbox has to
synthesize its own payloads (md5-derived geometry, see
``sources/image_corpus.py``), standing in for the scan.

Pipeline roles vs SURVEY.md §2: S1 (decode scan), P1 (preprocess chain),
P2 (glare reduction), P3 (projection-band ROIs), P6 (orientation), F9
(ROI geometry filters), A8 (projection-profile stats), W2 (energy top-k),
X10 (CLAHE/bilateral/adaptive-threshold/resize kernels).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame

from ..functions import image_kernels as K
from ..functions.png_codec import decode_png_gray, encode_png_gray
from ..sources.image_corpus import render_doc_image

RENDER_DDL = "doc_id bigint, media binary"


def _render_media_from(df: DataFrame, render_fn) -> DataFrame:
    """Shared batching shell for the synthetic media renderers:
    df(doc_id, ...) -> (doc_id, media: binary PNG) via ``render_fn(doc_id)
    -> uint8 ndarray``."""
    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            if b.empty:
                continue
            media = [encode_png_gray(render_fn(int(d))) for d in b["doc_id"]]
            yield pd.DataFrame({"doc_id": b["doc_id"], "media": media})
    return df.select("doc_id").mapInPandas(fn, schema=RENDER_DDL)


def render_media(df: DataFrame, rotate: bool = False,
                 glare: bool = True) -> DataFrame:
    """df(doc_id, ...) -> (doc_id, media: binary): deterministic synthetic
    PNG pages (the sandbox's stand-in for reading an image column off the
    table scan)."""
    return _render_media_from(
        df, lambda d: render_doc_image(d, rotate=rotate, glare=glare))


DECODE_STATS_DDL = ("doc_id bigint, height int, width int, ink_rows int, "
                    "glare boolean")


def decode_stats(df: DataFrame, bg_ref: int = 215) -> DataFrame:
    """df(doc_id, media) -> per-image decode + projection-profile stats
    (S1 + A8): decoded dimensions, count of rows carrying any ink, and a
    saturation(glare) flag — the stats the reference derives before
    choosing preprocessing parameters (``ocr_adapter_improved.py:843-869``)."""
    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            if b.empty:
                continue
            hs, ws, inkr, gl = [], [], [], []
            for media in b["media"]:
                img = decode_png_gray(bytes(media))
                ink = K.ink_image(img, bg_ref)
                hs.append(img.shape[0])
                ws.append(img.shape[1])
                inkr.append(int((ink.sum(axis=1) > 0).sum()))
                gl.append(bool((img >= 250).any()))
            yield pd.DataFrame({"doc_id": b["doc_id"], "height": hs,
                                "width": ws, "ink_rows": inkr, "glare": gl})
    return df.mapInPandas(fn, schema=DECODE_STATS_DDL)


ROI_DDL = "doc_id bigint, roi_idx int, y0 int, y1 int"


def _default_bands(h: int) -> list[tuple[int, int, int]]:
    """P5 fallback when no projection band survives the filters: the
    reference's 3 fixed bands in its center/bottom/top priority order
    (``yolo_detector.py:397-497``)."""
    third = h // 3
    return [(third, 2 * third, 0), (2 * third, h, 0), (0, third, 0)]


def extract_rois(df: DataFrame, top_k: int = 4,
                 fallback: bool = True) -> DataFrame:
    """df(doc_id, media) -> one row per detected text band
    (P1+P2+P3+P5+F9+W2): glare-reduce -> CLAHE -> bilateral -> adaptive
    threshold -> row projection -> band extraction -> geometry/energy
    filters -> energy top-k, emitted in position order; documents where
    nothing survives fall back to the reference's 3 fixed bands.
    1 -> N Arrow batch contract."""
    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            if b.empty:
                continue
            docs, idxs, y0s, y1s = [], [], [], []
            for doc, media in zip(b["doc_id"], b["media"]):
                img = decode_png_gray(bytes(media))
                img, _method = K.reduce_glare(img)
                binm = K.adaptive_threshold(K.bilateral5(K.clahe(img)))
                bands = K.find_bands(K.row_projection(binm), img.shape[0])
                widths = [max(x1 - x0, 1) for x0, x1 in
                          (K.band_x_extent(binm, b0, b1) for b0, b1, _ in bands)]
                rois = K.top_k_bands(
                    K.filter_rois(bands, img.shape[1], widths), top_k)
                if not rois and fallback:
                    rois = _default_bands(img.shape[0])
                for i, (y0, y1, _energy) in enumerate(rois):
                    docs.append(doc)
                    idxs.append(i)
                    y0s.append(y0)
                    y1s.append(y1)
            yield pd.DataFrame({"doc_id": docs, "roi_idx": idxs,
                                "y0": y0s, "y1": y1s})
    return df.mapInPandas(fn, schema=ROI_DDL)


def extract_rois_nms(df: DataFrame, top_k: int = 4,
                     iou_threshold: float = 0.45,
                     fallback: bool = True) -> DataFrame:
    """df(doc_id, media) -> one row per merged ROI box: P4's post-model
    pipeline (``yolo_detector.py:140-378``) with real multi-source
    proposals in place of the conv net.  TWO detectors propose scored
    boxes over the same preprocessed mask — the refined projection bands
    (P3) and the unrefined smoothed runs (band edges spread by the
    smoothing radius: a coarser second hypothesis, the contour-fallback
    analog) — each filtered by the F9 geometry gates, then greedy IoU NMS
    (``functions/image_kernels.py::nms``, the cv2.dnn.NMSBoxes analog)
    merges the proposal sets: coincident and radius-spread duplicates are
    suppressed in favor of the refined box.  NMS ranks by energy DENSITY
    (energy / band height, the per-row ink concentration): refinement
    strips the sub-threshold tail rows smoothing spreads a band edge
    into, so the refined hypothesis always scores at least as dense as
    its unrefined twin — raw energy would instead favor the WIDER box
    whenever faint tail rows carry any ink at all (the reference's NMS
    likewise ranks by detector confidence, not box area).  Refined
    proposals are listed first and win exact ties.  Energy top-k of the
    survivors, emitted in position order; the empty-proposal fallback is
    the reference's 3 fixed bands (P5)."""
    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            if b.empty:
                continue
            docs, idxs, y0s, y1s = [], [], [], []
            for doc, media in zip(b["doc_id"], b["media"]):
                img = decode_png_gray(bytes(media))
                img, _method = K.reduce_glare(img)
                binm = K.adaptive_threshold(K.bilateral5(K.clahe(img)))
                profile = K.row_projection(binm)
                proposals = []
                for refine in (True, False):  # refined first: wins ties
                    cand = K.find_bands(profile, img.shape[0],
                                        refine=refine)
                    extents = [K.band_x_extent(binm, b0, b1)
                               for b0, b1, _ in cand]
                    widths = [max(x1 - x0, 1) for x0, x1 in extents]
                    kept = set(K.filter_rois(cand, img.shape[1], widths))
                    for band, (x0, x1) in zip(cand, extents):
                        if band in kept:
                            y0, y1, energy = band
                            proposals.append((y0, x0, y1, x1, energy))
                if proposals:
                    boxes = [(p[0], p[1], p[2], p[3]) for p in proposals]
                    scores = [p[4] / max(p[2] - p[0], 1) for p in proposals]
                    keep = K.nms(boxes, scores, iou_threshold)
                    survivors = [(proposals[i][0], proposals[i][2],
                                  proposals[i][4]) for i in keep]
                    rois = [(y0, y1) for y0, y1, _
                            in K.top_k_bands(survivors, top_k)]
                elif fallback:
                    rois = [(y0, y1) for y0, y1, _
                            in _default_bands(img.shape[0])]
                else:
                    rois = []
                for i, (y0, y1) in enumerate(rois):
                    docs.append(doc)
                    idxs.append(i)
                    y0s.append(y0)
                    y1s.append(y1)
            yield pd.DataFrame({"doc_id": docs, "roi_idx": idxs,
                                "y0": y0s, "y1": y1s})
    return df.mapInPandas(fn, schema=ROI_DDL)


ORIENT_DDL = "doc_id bigint, angle int"


def detect_orientations(df: DataFrame) -> DataFrame:
    """df(doc_id, media) -> (doc_id, angle in {0,90,180,270}) via projection
    variance + thickest-band position (P6)."""
    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            if b.empty:
                continue
            angles = [K.detect_orientation(decode_png_gray(bytes(m)))
                      for m in b["media"]]
            yield pd.DataFrame({"doc_id": b["doc_id"],
                                "angle": pd.Series(angles, dtype="int32")})
    return df.mapInPandas(fn, schema=ORIENT_DDL)


RESIZE_DDL = ("doc_id bigint, h_in int, w_in int, h_out int, w_out int, "
              "n_bytes_out bigint")


def resize_images(df: DataFrame, scale: int = 2) -> DataFrame:
    """df(doc_id, media) -> bilinear downscale by ``scale`` + re-encode
    (X10 resize on real pixels; replaces the byte-decimation stand-in for
    PNG payloads)."""
    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            if b.empty:
                continue
            rows = {"doc_id": b["doc_id"], "h_in": [], "w_in": [],
                    "h_out": [], "w_out": [], "n_bytes_out": []}
            for media in b["media"]:
                img = decode_png_gray(bytes(media))
                h, w = img.shape
                out = K.resize_bilinear(img, h // scale, w // scale)
                enc = encode_png_gray(out)
                rows["h_in"].append(h)
                rows["w_in"].append(w)
                rows["h_out"].append(out.shape[0])
                rows["w_out"].append(out.shape[1])
                rows["n_bytes_out"].append(len(enc))
            yield pd.DataFrame(rows)
    return df.mapInPandas(fn, schema=RESIZE_DDL)


def render_serial_media(df: DataFrame) -> DataFrame:
    """df(doc_id, ...) -> (doc_id, media): PNG serial plates — the planted
    12-char string in the 5x7 glyph font with jitter + ink dropout
    (``sources/image_corpus.py::render_serial_image``)."""
    from ..sources.image_corpus import render_serial_image
    return _render_media_from(df, render_serial_image)


OCR_DDL = "doc_id bigint, text string, conf double"


def ocr_serials(df: DataFrame, expect_chars: int = 12) -> DataFrame:
    """df(doc_id, media) -> (doc_id, text, conf): real OCR on real pixels —
    decode PNG, adaptive-threshold binarize, glyph segmentation,
    nearest-template Hamming match (``functions/glyph_ocr.py``; the
    EasyOCR-readtext analog, ``ocr_adapter_improved.py:639-811``).
    ``conf`` is the worst per-glyph template similarity."""
    from ..functions.glyph_ocr import recognize_text

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            if b.empty:
                continue
            texts, confs = [], []
            for media in b["media"]:
                img = decode_png_gray(bytes(media))
                text, conf = recognize_text(K.adaptive_threshold(img),
                                            expect_chars=expect_chars)
                texts.append(text)
                confs.append(conf)
            yield pd.DataFrame({"doc_id": b["doc_id"], "text": texts,
                                "conf": confs})
    return df.mapInPandas(fn, schema=OCR_DDL)


def render_degraded_serial_media(df: DataFrame) -> DataFrame:
    """df(doc_id, ...) -> (doc_id, media): PNG serial plates degraded past
    what the single-pass reader segments through (heavier dropout +
    isolated background salt, ``sources/image_corpus.py::
    render_degraded_serial_image``) — the fallback sweep's input."""
    from ..sources.image_corpus import render_degraded_serial_image
    return _render_media_from(df, render_degraded_serial_image)


FALLBACK_DDL = ("doc_id bigint, text string, conf double, variant string, "
                "n_tried int")

# (variant name, despeckle min_neighbors or 0 = raw binarization,
#  use the 12-char fixed-pitch prior) — ordered cheapest/least-destructive
# first, exactly like the reference's preprocess-path x PSM-mode grid
# (``tesseract_adapter.py:86-158``: 5 preprocess paths x 4 PSM modes,
# early exit on a confident hit).
_FALLBACK_SWEEP = (
    ("plain_gap", 0, False),
    ("plain_fixed", 0, True),
    ("despeckle2_gap", 2, False),
    ("despeckle2_fixed", 2, True),
    ("despeckle3_fixed", 3, True),
)


def ocr_serials_fallback(df: DataFrame, expect_chars: int = 12) -> DataFrame:
    """df(doc_id, media) -> (doc_id, text, conf, variant, n_tried): the
    P10 fallback sweep on real pixels — decode once, then try (preprocess
    path x segmentation mode) variants in fixed order with early stop at
    a fully-confident read (O1, ``tesseract_adapter.py:86-237``):

    * preprocess paths: raw adaptive-threshold mask, then neighbor-count
      despeckle at 2 and 3 (the 5-preprocess-path analog; despeckle is
      the binary-median denoise the reference gets from its blur/morph
      passes);
    * segmentation modes: pure gap segmentation vs the 12-char
      fixed-pitch prior (the PSM-mode analog);
    * candidates shorter/longer than ``expect_chars`` are discarded (F1's
      length filter over the sliding-window candidates,
      ``tesseract_adapter.py:154-163``);
    * surviving candidates keep their max confidence across variants (A6
      per-serial max, ``tesseract_adapter.py:230-237``); the winner is the
      max-confidence candidate, earliest variant on ties.

    ``variant`` names the pass that produced the winning read; ``n_tried``
    counts passes actually run (early stop makes it < 5 on clean input).
    """
    from ..functions.glyph_ocr import recognize_text

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            if b.empty:
                continue
            rows = {"doc_id": [], "text": [], "conf": [], "variant": [],
                    "n_tried": []}
            for doc_id, media in zip(b["doc_id"], b["media"]):
                base = K.adaptive_threshold(decode_png_gray(bytes(media)))
                masks = {0: base}
                cands: dict[str, tuple[float, str, int]] = {}
                tried = 0
                for name, dk, fixed in _FALLBACK_SWEEP:
                    if dk not in masks:
                        masks[dk] = K.despeckle(base, dk)
                    t, c = recognize_text(
                        masks[dk],
                        expect_chars=expect_chars if fixed else None)
                    tried += 1
                    if len(t) == expect_chars:
                        if t not in cands or c > cands[t][0]:
                            cands[t] = (c, name, tried)
                        if c == 1.0:
                            # early stop only on a confident HIT — in the
                            # reference only validity-filtered reads become
                            # candidates at all (tesseract_adapter.py:
                            # 224-226) and early stop keys on the best
                            # CANDIDATE's confidence (O1,
                            # ocr_adapter_improved.py:1432-1456); a
                            # confident read that failed the length filter
                            # is not a candidate and must not end the sweep
                            break
                if cands:
                    text, (conf, variant, _) = max(
                        cands.items(), key=lambda kv: (kv[1][0], -kv[1][2]))
                else:
                    text, conf, variant = "", 0.0, "none"
                rows["doc_id"].append(doc_id)
                rows["text"].append(text)
                rows["conf"].append(conf)
                rows["variant"].append(variant)
                rows["n_tried"].append(tried)
            yield pd.DataFrame(rows)
    return df.mapInPandas(fn, schema=FALLBACK_DDL)
