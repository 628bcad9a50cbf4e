"""Numpy image kernels: unit checks + planted-geometry recovery properties."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from apple_ocr_backend_spark.functions import image_kernels as K
from apple_ocr_backend_spark.sources.image_corpus import (
    planted_geometry, render_doc_image)


# ------------------------------------------------------------------ kernels

def test_local_mean_matches_naive():
    rng = np.random.default_rng(1)
    img = rng.integers(0, 256, (12, 17), dtype=np.uint8)
    got = K.local_mean(img, 5)
    h, w = img.shape
    for y in (0, 3, 11):
        for x in (0, 8, 16):
            y0, y1 = max(y - 2, 0), min(y + 3, h)
            x0, x1 = max(x - 2, 0), min(x + 3, w)
            assert abs(got[y, x] - img[y0:y1, x0:x1].mean()) < 1e-9


def test_adaptive_threshold_param_formula():
    """block = clamp(w//20, 11..51)|odd, C = clamp(mean/20, 5..15)
    (ocr_adapter_improved.py:315-327): a flat image yields no ink; a dark
    stroke on that image does."""
    img = np.full((40, 600), 200, dtype=np.uint8)  # w//20 = 30 -> block 31
    assert K.adaptive_threshold(img).sum() == 0
    img[20, 100:500] = 40
    mask = K.adaptive_threshold(img)
    assert mask[20, 200:400].all()
    assert mask[0].sum() == 0


def test_clahe_keeps_flat_background_flat():
    """The clip limit must stop a texture-only tile from being stretched
    to full range (that would plant phantom ink)."""
    ys, xs = np.mgrid[0:64, 0:64]
    img = (215 + (xs * 7 + ys * 13) % 5).astype(np.uint8)
    out = K.clahe(img)
    assert int(out.max()) - int(out.min()) < 60
    assert abs(float(out.mean()) - float(img.mean())) < 40


def test_bilateral_preserves_edges_flattens_texture():
    img = np.full((20, 20), 215, dtype=np.uint8)
    img[:, 10:] = 60
    out = K.bilateral5(img)
    assert abs(int(out[5, 9]) - 215) <= 3 and abs(int(out[5, 10]) - 60) <= 3
    tex = (200 + (np.arange(400).reshape(20, 20) % 4)).astype(np.uint8)
    assert K.bilateral5(tex).std() < tex.std()


def test_morphology_and_tophat():
    img = np.zeros((15, 15), dtype=np.uint8)
    img[7, 7] = 255
    assert K.erode(img, 3).sum() == 0            # lone pixel erodes away
    assert K.dilate(img, 3)[6:9, 6:9].min() == 255
    base = np.full((30, 30), 100, dtype=np.uint8)
    base[14:16, 14:16] = 250                      # small bright spot
    th = K.tophat(base, 15)
    assert th[14, 14] >= 140 and th[0, 0] == 0


def test_reduce_glare_spot_repair_only_touches_saturation():
    img = render_doc_image(8, rotate=False)      # doc 8 has a glare disc
    assert K.glare_stats(img)["glare_ratio"] > 0
    out, method = K.reduce_glare(img)
    assert method == "tophat"
    assert (out >= 250).sum() < (img >= 250).sum()
    untouched = img < 245
    assert (out[untouched] == img[untouched]).all()


def test_reduce_glare_division_for_broad_glare():
    ys, xs = np.mgrid[0:60, 0:60]
    img = np.clip(150 + (xs * 2), 0, 255).astype(np.uint8)  # broad gradient
    img[:, 50:] = 255                                        # >5% saturated
    img[30, 5:55] = 40                                       # a stroke
    out, method = K.reduce_glare(img)
    assert method == "division"
    # the stroke must stay the darkest structure after normalization
    assert out[30, 20] < out[10, 20] and out[30, 45] < out[10, 45]


def test_resize_bilinear_basics():
    const = np.full((16, 24), 99, dtype=np.uint8)
    assert (K.resize_bilinear(const, 8, 12) == 99).all()
    grad = np.tile(np.arange(0, 240, 10, dtype=np.uint8), (4, 1))
    out = K.resize_bilinear(grad, 4, 12)
    assert (np.diff(out[0].astype(int)) >= 0).all()   # monotone preserved


def test_profile_stats_and_band_filters():
    prof = np.array([0, 0, 50, 50, 50, 0, 0], dtype=np.int64)
    st_ = K.profile_stats(prof)
    assert st_["max"] == 50 and st_["median"] == 0
    bands = [(0, 20, 10_000), (30, 50, 100)]
    kept = K.filter_rois(bands, img_w=200, widths=[200, 200])
    assert kept == [(0, 20, 10_000)]                  # energy filter
    kept = K.filter_rois([(0, 20, 10_000)], img_w=200, widths=[10])
    assert kept == []                                 # min-width ratio
    kept = K.filter_rois([(0, 200, 10_000)], img_w=200, widths=[200])
    assert kept == []                                 # aspect < 2
    assert K.top_k_bands(bands, 1) == [(0, 20, 10_000)]


# ------------------------------------------- planted-geometry properties

@settings(max_examples=60, deadline=None)
@given(doc=st.integers(0, 99_999))
def test_roi_chain_recovers_planted_bands_exactly(doc):
    g = planted_geometry(doc)
    img = render_doc_image(doc, rotate=False)
    img, _ = K.reduce_glare(img)
    mask = K.adaptive_threshold(K.bilateral5(K.clahe(img)))
    bands = K.find_bands(K.row_projection(mask), img.shape[0])
    widths = [max(x1 - x0, 1) for x0, x1 in
              (K.band_x_extent(mask, b0, b1) for b0, b1, _ in bands)]
    rois = K.top_k_bands(K.filter_rois(bands, img.shape[1], widths), 4)
    assert [(a, b) for a, b, _ in rois] == g["bands"]


@settings(max_examples=60, deadline=None)
@given(doc=st.integers(0, 99_999))
def test_orientation_recovers_planted_rotation(doc):
    g = planted_geometry(doc)
    img = render_doc_image(doc, rotate=True)
    assert K.detect_orientation(img) == 90 * g["rot_quads"]


@settings(max_examples=30, deadline=None)
@given(doc=st.integers(0, 99_999))
def test_orientation_inverse_restores_upright(doc):
    """The documented angle convention: rot90(img, -angle//90) is upright."""
    img = render_doc_image(doc, rotate=True)
    angle = K.detect_orientation(img)
    upright = np.ascontiguousarray(np.rot90(img, -angle // 90))
    assert (upright == render_doc_image(doc, rotate=False)).all()


def test_nms_greedy_suppression_and_ties():
    from apple_ocr_backend_spark.functions.image_kernels import nms
    # identical boxes: higher score wins; equal scores keep earlier index
    boxes = [(0, 0, 10, 100), (0, 0, 10, 100), (50, 0, 60, 100)]
    assert nms(boxes, [1.0, 2.0, 0.5]) == [1, 2]
    assert nms(boxes, [2.0, 2.0, 0.5]) == [0, 2]
    # radius-spread duplicate (IoU ~ 0.83) suppressed; disjoint box kept
    boxes = [(10, 0, 30, 100), (8, 0, 32, 100), (70, 0, 90, 100)]
    assert nms(boxes, [3.0, 3.0, 1.0]) == [0, 2]
    # below the threshold nothing is suppressed
    boxes = [(0, 0, 10, 100), (8, 0, 18, 100)]  # IoU = 2/18 ~ 0.11
    assert sorted(nms(boxes, [1.0, 1.0], iou_threshold=0.1)) == [0]
    assert sorted(nms(boxes, [1.0, 1.0], iou_threshold=0.45)) == [0, 1]
    # empty input
    assert nms(np.zeros((0, 4)), []) == []
