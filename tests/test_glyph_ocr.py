"""Template-match OCR: font sanity, recognition properties, edge cases."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from apple_ocr_backend_spark.functions import image_kernels as K
from apple_ocr_backend_spark.functions.glyph_ocr import (
    CHARSET, glyph_bitmap, recognize_text, render_text_bitmap, templates)
from apple_ocr_backend_spark.sources.image_corpus import (
    planted_serial, render_serial_image)


def test_font_covers_charset_and_glyphs_are_distinct():
    assert len(CHARSET) == 36 and len(set(CHARSET)) == 36
    t = templates().reshape(36, -1).astype(np.int8)
    d = np.abs(t[:, None, :] - t[None, :, :]).sum(axis=2)
    np.fill_diagonal(d, 99)
    assert d.min() >= 3  # every glyph pair differs by >= 3 pixels
    for ch in CHARSET:
        g = glyph_bitmap(ch)
        assert g.shape == (7, 5) and g.any()


def test_clean_roundtrip_every_char():
    """Each glyph alone, at scales 1-3, reads back exactly."""
    for scale in (1, 2, 3):
        for ch in CHARSET:
            mask = render_text_bitmap(ch, scale=scale)
            got, conf = recognize_text(mask)
            assert got == ch and conf == 1.0, (ch, scale, got)


@settings(max_examples=60, deadline=None)
@given(doc=st.integers(0, 99_999))
def test_serial_plate_recovery(doc):
    """Full path: render plate (jitter + dropout) -> PNG-free binarize ->
    recognize; must equal the planted md5-derived string."""
    img = render_serial_image(doc)
    got, conf = recognize_text(K.adaptive_threshold(img), expect_chars=12)
    assert got == planted_serial(doc)
    assert conf > 0.5


def test_fixed_pitch_fallback_when_gaps_vanish():
    """Glyphs packed with a 1-px gap defeat gap segmentation; the 12-char
    shape prior (reference's serial-length filter) must still split them."""
    text = "AB0C1D2E3F4G"
    mask = render_text_bitmap(text, scale=2, gap=1)
    got, _ = recognize_text(mask, expect_chars=12)
    assert got == text


def test_empty_and_blank_inputs():
    assert recognize_text(np.zeros((10, 40), dtype=np.uint8)) == ("", 0.0)


def test_pool_to_grid_matches_slice_max_reference():
    """The reduceat pooling must be bit-identical to the per-cell slice-max
    definition (incl. the at-least-one-row rule for crops smaller than the
    7x5 grid)."""
    from apple_ocr_backend_spark.functions.glyph_ocr import _pool_to_grid

    def reference(mask):
        hh, ww = mask.shape
        yb = np.linspace(0, hh, 8).astype(np.int64)
        xb = np.linspace(0, ww, 6).astype(np.int64)
        out = np.zeros((7, 5), dtype=np.uint8)
        for r in range(7):
            for c in range(5):
                y0, y1 = yb[r], max(yb[r + 1], yb[r] + 1)
                x0, x1 = xb[c], max(xb[c + 1], xb[c] + 1)
                out[r, c] = mask[y0:y1, x0:x1].max(initial=0)
        return out

    rng = np.random.default_rng(7)
    for _ in range(2000):
        hh, ww = int(rng.integers(1, 40)), int(rng.integers(1, 30))
        m = (rng.random((hh, ww)) < 0.3).astype(np.uint8)
        assert np.array_equal(_pool_to_grid(m), reference(m)), (hh, ww)


def test_confidence_degrades_with_damage():
    mask = render_text_bitmap("HELLO0WORLD1", scale=2)
    _, clean = recognize_text(mask, expect_chars=12)
    damaged = mask.copy()
    # kill BOTH pixel rows of alternating template rows (scale 2): block-max
    # pooling cannot repair a fully-missing template row
    damaged[0::4] = 0
    damaged[1::4] = 0
    _, rough = recognize_text(damaged, expect_chars=12)
    assert clean == 1.0 and rough < clean
