"""Pipeline configuration.

The reference keeps its knobs in ``app/config.py`` / ``app/production_config.py``
(e.g. ``MIN_ACCEPTANCE_CONFIDENCE = 0.65`` at ``app/config.py:18``, early-stop
confidence 0.75/0.5/0.95 at ``app/production_config.py:13`` and
``app/pipeline/ocr_adapter_improved.py:942``).  Here the config is a frozen
dataclass passed explicitly (and broadcast into UDF stages as a plain dict —
reference analog: param-cache presets, ``app/services/param_cache.py:30-91``).
"""

from __future__ import annotations

from dataclasses import dataclass, asdict


@dataclass(frozen=True)
class ExtractConfig:
    # --- OCR recovery (image spans) ---
    # minimum per-token OCR confidence to consider at all
    # (reference: min_confidence param, app/pipeline/ocr_adapter.py:253-254)
    min_confidence: float = 0.30
    # per-pass early stop: a span whose best candidate reaches this confidence
    # skips all later passes (reference: early_stop_confidence,
    # ocr_adapter_improved.py:942,1432-1456)
    early_stop_confidence: float = 0.90
    # maximum number of progressive passes encoded in an image span's token
    # stream (reference: 4 stages, ocr_adapter_improved.py:939-1307)
    max_passes: int = 4

    # --- HTML boilerplate stripping ---
    html_min_words: int = 5          # blocks shorter than this are boilerplate
    html_max_link_ratio: float = 0.33  # link-text chars / text chars
    html_max_tag_density: float = 0.50  # inline tags / words

    # --- PDF layout parsing ---
    # new block when the vertical gap to the previous line exceeds
    # gap_factor * font_size (pdfminer-style line clustering)
    pdf_gap_factor: float = 1.8

    # --- Spark-side knobs ---
    # (session-level knobs — shuffle partitions, Arrow batch size — live in
    # session.py / get_spark, not here: they are per-SparkSession, not
    # per-extraction, and a copy in this dataclass would just go stale)
    # spans-size-aware salting: a doc is split into ceil(weight / salt_span_budget)
    # salts, where weight = number of spans (north_rule skew handling)
    salt_span_budget: int = 256

    def as_dict(self) -> dict:
        return asdict(self)


DEFAULT_CONFIG = ExtractConfig()
