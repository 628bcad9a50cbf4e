"""Video TTA fixtures + kernel: the client scan-window semantics (P11/A7,
``ios/.../SerialScannerViewModel.swift:34-38,197-282``) on real AVI bytes —
one clean frame among heavy-dropout ones, best-frame arg-max recovers the
planted serial while a frame-0-only reader cannot."""

from __future__ import annotations

import numpy as np
import pytest

from apple_ocr_backend_spark.functions import image_kernels as K
from apple_ocr_backend_spark.functions.avi_codec import decode_avi_gray
from apple_ocr_backend_spark.functions.glyph_ocr import recognize_text
from apple_ocr_backend_spark.sources.image_corpus import planted_serial
from apple_ocr_backend_spark.sources.video_corpus import (
    FPS, planted_tta, render_doc_serial_video)


def _reads(doc_id: int) -> list[tuple[str, float]]:
    frames, fps = decode_avi_gray(render_doc_serial_video(doc_id))
    assert fps == FPS
    return [recognize_text(K.adaptive_threshold(fr), expect_chars=12)
            for fr in frames]


@pytest.mark.parametrize("doc_id", [0, 1, 7, 42, 123, 299])
def test_clean_frame_is_exact_and_degraded_frames_never_tie(doc_id):
    g = planted_tta(doc_id)
    reads = _reads(doc_id)
    assert len(reads) == g["n_frames"]
    text, conf = reads[g["good"]]
    assert text == planted_serial(doc_id) and conf == 1.0
    # the arg-max separation invariant: no degraded frame reaches 1.0
    # (measured 0/14,028 frames over doc_id < 4000 when the fixture was
    # designed — these spot docs re-pin it in CI)
    for k, (_, c) in enumerate(reads):
        if k != g["good"]:
            assert c < 1.0


def test_best_frame_argmax_recovers_everywhere_frame0_does_not():
    docs = range(120)
    argmax_ok = frame0_wrong = 0
    for d in docs:
        want = planted_serial(d)
        reads = _reads(d)
        # (conf desc, frame_idx asc) — the catalog's max_by ordering
        best = max(((c, -k, t) for k, (t, c) in enumerate(reads)))
        if best[2] == want:
            argmax_ok += 1
        if reads[0][0] != want:
            frame0_wrong += 1
    assert argmax_ok == len(list(docs))
    # TTA is load-bearing: a single-frame reader misses a large fraction
    # (2,265/4000 measured at design time; >=25% expected in any window)
    assert frame0_wrong >= len(list(docs)) // 4


def test_clip_frames_share_shape_and_carry_same_serial():
    for d in (3, 77):
        frames, _ = decode_avi_gray(render_doc_serial_video(d))
        shapes = {f.shape for f in frames}
        assert len(shapes) == 1
        # every frame renders the SAME planted string: a degraded frame's
        # read may be wrong, but its ink is a subset of ITS OWN clean
        # render's pixel positions (dropout only removes ink; jitter is
        # per-frame, so compare against the same frame re-rendered clean)
        from apple_ocr_backend_spark.sources.video_corpus import \
            _serial_plate
        for k, fr in enumerate(frames):
            clean = _serial_plate(d, k, 0.0) < 128
            ink = fr < 128
            assert not (ink & ~clean).any()
