"""S8 param cache: per-preset best-parameter files with metadata + fallback.

Re-expression of the reference's parameter-cache service
(``app/services/param_cache.py:30-91``): one JSON file per device preset
under a cache directory, each carrying ``{preset, params, accuracy,
timestamp, date}``; loads return None on missing/corrupt files, and the
metadata-free accessor returns just the params.  Two deltas for this
engine's needs:

* ``now`` is injectable so tests (and replayed runs) get deterministic
  timestamp/date fields;
* ``load_best_params``/``get_best_params`` take an optional ``fallback``
  preset tried when the requested one is absent or unreadable (the
  reference's callers hand-roll this preset-default chain).

Writes are atomic (tmp + os.replace) — the reference's thread lock guards
a single process; at cluster scale the atomic rename is what prevents a
concurrent reader from seeing a torn file.
"""

from __future__ import annotations

import json
import os
import time


def cache_path(cache_dir: str, preset: str) -> str:
    return os.path.join(cache_dir, f"{preset}_best_params.json")


def save_best_params(cache_dir: str, preset: str, params: dict,
                     accuracy: float, now: float | None = None,
                     extra: dict | None = None) -> dict:
    """Write the preset's best params + metadata; returns the payload.

    ``now`` (epoch seconds) defaults to the current time; inject it for
    deterministic output.  ``extra`` fields (e.g. this engine's integer
    ``accuracy_bp``) are merged into the payload without disturbing the
    reference-parity keys."""
    if now is None:
        now = time.time()
    payload = {
        "preset": preset,
        "params": dict(params),
        "accuracy": accuracy,
        "timestamp": now,
        "date": time.strftime("%Y-%m-%d %H:%M:%S", time.localtime(now)),
        **(extra or {}),
    }
    os.makedirs(cache_dir, exist_ok=True)
    path = cache_path(cache_dir, preset)
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(payload, f, indent=2)
    os.replace(tmp, path)
    return payload


def load_best_params(cache_dir: str, preset: str,
                     fallback: str | None = None) -> dict | None:
    """Full payload (params + metadata) for ``preset``; on a missing or
    corrupt file, try the ``fallback`` preset once; else None."""
    path = cache_path(cache_dir, preset)
    try:
        with open(path) as f:
            return json.load(f)
    except (OSError, json.JSONDecodeError):
        if fallback is not None and fallback != preset:
            return load_best_params(cache_dir, fallback)
        return None


def get_best_params(cache_dir: str, preset: str,
                    fallback: str | None = None) -> dict | None:
    """Just the parameter values (no metadata), with the same fallback."""
    payload = load_best_params(cache_dir, preset, fallback)
    if payload and isinstance(payload.get("params"), dict):
        return payload["params"]
    return None


def list_cached_presets(cache_dir: str) -> dict[str, dict]:
    """Preset -> {accuracy, date, timestamp} for every readable cache file."""
    out: dict[str, dict] = {}
    if not os.path.isdir(cache_dir):
        return out
    for name in sorted(os.listdir(cache_dir)):
        if not name.endswith("_best_params.json"):
            continue
        preset = name[:-len("_best_params.json")]
        payload = load_best_params(cache_dir, preset)
        if payload:
            out[preset] = {"accuracy": payload.get("accuracy"),
                           "date": payload.get("date"),
                           "timestamp": payload.get("timestamp")}
    return out
