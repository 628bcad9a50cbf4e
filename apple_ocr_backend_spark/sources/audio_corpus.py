"""Deterministic synthetic audio corpus (WAV/PCM16 payloads).

The audio twin of ``image_corpus.py``: every sample derives from
``md5(f"{doc_id}_{tag}")`` arithmetic, so the planted signal parameters —
length, amplitude, half-period — are computable in plain SQL while the
Spark side must recover the stats from the actual WAV bytes through the
full RIFF-walk -> PCM decode -> numpy reduction chain
(``functions/wav_codec.py``).  That makes the audio-path catalog entry
end-to-end oracle-checkable without an audio library on the oracle side.

Signal layout (all constants mirrored in ``plans/catalog.py`` oracle SQL):
- sample rate 8000 Hz, 16-bit mono PCM
- n_samples = 4000 + H('al') % 4000   (0.5-1.0 s)
- amplitude A = 1000 + H('aa') % 20000
- half-period hp = 8 + H('ap') % 24 samples
- sample[i] = +A when (i // hp) is even, else -A  (square wave)

Square waves make every headline stat closed-form: peak = A, rms = A
exactly (all samples are +-A, and A^2 * n < 2^53 keeps the float64 mean
exact), and the zero-crossing count is (n_samples - 1) // hp (the sign
flips exactly at each interior multiple of hp).

A deterministic foreign 'LIST' chunk (payload length 3 + H('ax') % 4,
odd sizes included) is inserted between 'fmt ' and 'data' so the decode
path must genuinely walk chunks with RIFF pad-byte handling — a reader
that assumes sample data at offset 44 fails on this corpus.

Reference analog: the seeded fixture generator with analytic labels
(``generate_image.py:23-38,204-225``) — payload is the input, md5
arithmetic is the answer key.
"""

from __future__ import annotations

import hashlib

import numpy as np

from ..functions.wav_codec import encode_wav_pcm16

SAMPLE_RATE = 8000


def _h(doc_id: int, tag: str) -> int:
    """First 6 md5 hex digits as an int — matches DuckDB
    ``('0x' || substr(md5(...), 1, 6))::BIGINT``."""
    return int(hashlib.md5(f"{doc_id}_{tag}".encode()).hexdigest()[:6], 16)


def planted_signal(doc_id: int) -> dict:
    """The analytic answer key for one document (what the oracle SQL
    computes)."""
    n = 4000 + _h(doc_id, "al") % 4000
    amp = 1000 + _h(doc_id, "aa") % 20000
    hp = 8 + _h(doc_id, "ap") % 24
    return {"n_samples": n, "amplitude": amp, "half_period": hp,
            "zero_crossings": (n - 1) // hp}


def render_doc_audio(doc_id: int) -> bytes:
    """WAV payload for ``doc_id`` (see module docstring)."""
    g = planted_signal(doc_id)
    i = np.arange(g["n_samples"])
    samples = np.where((i // g["half_period"]) % 2 == 0,
                       g["amplitude"], -g["amplitude"]).astype(np.int16)
    foreign = b"\x07" * (3 + _h(doc_id, "ax") % 4)
    return encode_wav_pcm16(samples, SAMPLE_RATE,
                            extra_chunks=[(b"LIST", foreign)])
