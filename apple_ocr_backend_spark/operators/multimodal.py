"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The Spark-side plumbing is real — binary columns, Arrow-batched
``mapInPandas`` with the exact batch shape a decode/feature-extract stage
needs — and the decode step is real for PNG and BMP images via the
from-scratch codecs (``functions/png_codec.py``, ``functions/bmp_codec.py``)
and for PCM16 WAV audio (``functions/wav_codec.py``, chunk-walking RIFF
parse; see ``audio_decode_stats`` below); formats that genuinely need an
external library (JPEG/WebP/compressed audio/video) raise
``NotImplementedError`` and the shipping path falls back to the
deterministic signature extractor.

Reference analog: raw request bytes decoded per image
(``cv2.imdecode(np.frombuffer(...))``, ``app/pipeline/ocr_adapter.py:105-108``).
The reference's per-process model singleton (``ocr_adapter_improved.py:
19-70``) lives where per-worker init is actually expensive — the glyph
template cache in ``functions/glyph_ocr.py`` — module imports themselves
are already cached per worker by Python.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame

MEDIA_META_DDL = "doc_id bigint, n_bytes bigint, sig string"


def decode_image(data: bytes):
    """bytes -> uint8 grayscale ndarray (cv2.imdecode analog).  Real for
    PNG and BMP payloads (from-scratch codecs, ``functions/png_codec.py``
    and ``functions/bmp_codec.py``); raises
    ValueError/NotImplementedError for formats the environment has no
    codec for — callers catch and fall back."""
    if data[:8] == b"\x89PNG\r\n\x1a\n":
        from ..functions.png_codec import decode_png_gray
        return decode_png_gray(data)
    if data[:2] == b"BM":
        from ..functions.bmp_codec import decode_bmp_gray
        return decode_bmp_gray(data)
    raise NotImplementedError(
        "only PNG/BMP payloads decode in this environment; install "
        "pillow/cv2 for JPEG/WebP and extend decode_image")


def _signature_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Deterministic fallback feature extractor: byte length + md5 hex.
    Vectorized per Arrow batch; the only per-item Python is hashlib over the
    raw buffers (CPU-bound C code, no decode)."""
    for b in batches:
        if b.empty:
            continue
        media = b["media"]
        yield pd.DataFrame({
            "doc_id": b["doc_id"],
            "n_bytes": media.map(len).astype("int64"),
            "sig": media.map(lambda x: hashlib.md5(x).hexdigest()),
        })


def media_signatures(df: DataFrame) -> DataFrame:
    """df(doc_id, media: binary) -> (doc_id, n_bytes, sig).

    The real pipeline would swap `_signature_batches` for a decode +
    feature-extract kernel with the identical batch shape."""
    return df.mapInPandas(_signature_batches, schema=MEDIA_META_DDL)


RESIZE_DDL = ("doc_id bigint, n_bytes_in bigint, n_bytes_out bigint, "
              "sig_out string")


def _resize_batches(target_bytes: int):
    """Deterministic resize stand-in: stride-decimate the buffer down to
    ~``target_bytes`` (every ceil(n/target)-th byte), emit the output size +
    digest.  The real kernel swaps the decimation for a codec resize
    (INTER_AREA analog — the reference caps inputs the same way,
    ``ocr_adapter_improved.py:647-655``) behind the identical batch shape."""
    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            if b.empty:
                continue
            n_in, n_out, sigs = [], [], []
            for media in b["media"]:
                media = media or b""  # null buffer -> empty, not a crash
                n = len(media)
                stride = max(1, -(-n // target_bytes))
                out = media[::stride]
                n_in.append(n)
                n_out.append(len(out))
                sigs.append(hashlib.md5(out).hexdigest())
            yield pd.DataFrame({"doc_id": b["doc_id"], "n_bytes_in": n_in,
                                "n_bytes_out": n_out, "sig_out": sigs})
    return fn


def resize_media(df: DataFrame, target_bytes: int = 64) -> DataFrame:
    """df(doc_id, media: binary) -> (doc_id, n_bytes_in, n_bytes_out,
    sig_out): the resize/downsample contract (O4 input-size cap analog),
    deterministic so the catalog oracle replays it in SQL."""
    return df.mapInPandas(_resize_batches(target_bytes), schema=RESIZE_DDL)


FRAME_DDL = "doc_id bigint, frame_idx int, n_frame_bytes bigint, frame_sig string"


def _frame_batches(max_frames: int):
    """Deterministic frame sampler: a media buffer of n bytes yields
    ``min(max_frames, 1 + n // 64)`` frames — contiguous byte slices of
    stride ``ceil(n / n_frames)`` — each reduced to (length, md5).  This is
    the decode/frame-sample STAND-IN: the real kernel swaps the slicing for
    a codec call with the identical 1->N Arrow batch contract (per-item C
    hashing here plays the role of per-frame decode work)."""
    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            if b.empty:
                continue
            docs, idxs, lens, sigs = [], [], [], []
            for doc, media in zip(b["doc_id"], b["media"]):
                media = media or b""  # null buffer -> empty, not a crash
                n = len(media)
                nf = min(max_frames, 1 + n // 64)
                stride = -(-n // nf)
                for k in range(nf):
                    chunk = media[k * stride:(k + 1) * stride]
                    docs.append(doc)
                    idxs.append(k)
                    lens.append(len(chunk))
                    sigs.append(hashlib.md5(chunk).hexdigest())
            yield pd.DataFrame({"doc_id": docs, "frame_idx": idxs,
                                "n_frame_bytes": lens, "frame_sig": sigs})
    return fn


def sample_frames(df: DataFrame, max_frames: int = 4) -> DataFrame:
    """df(doc_id, media: binary) -> (doc_id, frame_idx, n_frame_bytes,
    frame_sig): the video frame-sampling contract (1 row -> N frame rows
    through one Arrow batch stage).  Deterministic, so the catalog oracle
    replays it in SQL; a real deployment swaps the slicing stand-in for the
    codec singleton's decode."""
    return df.mapInPandas(_frame_batches(max_frames), schema=FRAME_DDL)


# ---------------------------------------------------- audio / video paths

RENDER_MEDIA_DDL = "doc_id bigint, media binary"
# kept under their historical names for existing callers/tests
RENDER_AUDIO_DDL = RENDER_VIDEO_DDL = RENDER_MEDIA_DDL


def _render_media_operator(render_doc):
    """(doc_id -> payload bytes) -> a (doc_id, media: binary) mapInPandas
    operator: the shared stand-in for reading a stored media column off
    the table scan (one definition for the WAV/AVI/serial-clip renderers)."""
    def op(df: DataFrame) -> DataFrame:
        def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for b in batches:
                if b.empty:
                    continue
                media = [render_doc(int(d)) for d in b["doc_id"]]
                yield pd.DataFrame({"doc_id": b["doc_id"], "media": media})
        return df.select("doc_id").mapInPandas(fn, schema=RENDER_MEDIA_DDL)
    return op


def render_audio_media(df: DataFrame) -> DataFrame:
    """df(doc_id, ...) -> (doc_id, media: binary WAV): deterministic
    synthetic PCM16 payloads (``sources/audio_corpus.py``) — the audio
    twin of ``image_extract.render_media``."""
    from ..sources.audio_corpus import render_doc_audio
    return _render_media_operator(render_doc_audio)(df)


def render_video_media(df: DataFrame) -> DataFrame:
    """df(doc_id, ...) -> (doc_id, media: binary AVI): deterministic
    synthetic uncompressed-DIB clips (``sources/video_corpus.py``)."""
    from ..sources.video_corpus import render_doc_video
    return _render_media_operator(render_doc_video)(df)


VIDEO_STATS_DDL = ("doc_id bigint, frame_idx int, height int, width int, "
                   "ink_rows int, ink_min int")


def video_frame_stats(df: DataFrame, background: int = 200) -> DataFrame:
    """df(doc_id, media: binary AVI) -> one row per decoded frame with its
    dimensions, count of rows carrying ink (row min below ``background``),
    and the frame minimum.  REAL decode via the nested-RIFF walker
    (``functions/avi_codec.py``); the 1->N frame fan-out is the same
    Arrow-batch contract ``sample_frames`` stubs with byte slices — this
    is that contract with an actual codec behind it."""
    from ..functions.avi_codec import decode_avi_gray

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            if b.empty:
                continue
            docs, idxs, hs, ws, inkr, mins = [], [], [], [], [], []
            for doc, media in zip(b["doc_id"], b["media"]):
                frames, _fps = decode_avi_gray(bytes(media))
                for k, fr in enumerate(frames):
                    docs.append(doc)
                    idxs.append(k)
                    hs.append(fr.shape[0])
                    ws.append(fr.shape[1])
                    inkr.append(int((fr.min(axis=1) < background).sum()))
                    mins.append(int(fr.min()))
            yield pd.DataFrame({"doc_id": docs, "frame_idx": idxs,
                                "height": hs, "width": ws,
                                "ink_rows": inkr, "ink_min": mins})
    return df.mapInPandas(fn, schema=VIDEO_STATS_DDL)


def render_serial_video_media(df: DataFrame) -> DataFrame:
    """df(doc_id, ...) -> (doc_id, media: binary AVI): serial-plate clips —
    one clean frame among heavy-dropout ones, all rendering the planted
    12-char string (``sources/video_corpus.py::render_doc_serial_video``,
    the client scan-window fixture)."""
    from ..sources.video_corpus import render_doc_serial_video
    return _render_media_operator(render_doc_serial_video)(df)


VIDEO_OCR_DDL = "doc_id bigint, frame_idx int, text string, conf double"


def video_frame_ocr(df: DataFrame, expect_chars: int = 12) -> DataFrame:
    """df(doc_id, media: binary AVI) -> one OCR read per decoded frame
    (frame_idx, text, conf): AVI walk (``functions/avi_codec.py``) ->
    adaptive-threshold binarize -> glyph template match per frame — the
    per-frame half of the reference client's TTA loop
    (``SerialScannerViewModel.swift:197-258``).  The best-frame arg-max
    (``:267``, A7) deliberately stays OUTSIDE this kernel as a relational
    ``max_by`` aggregation: frames are data, not control flow, so Spark
    gets a combinable per-doc reduction instead of a Python fold."""
    from ..functions import image_kernels as K
    from ..functions.avi_codec import decode_avi_gray
    from ..functions.glyph_ocr import recognize_text

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            if b.empty:
                continue
            docs, idxs, texts, confs = [], [], [], []
            for doc, media in zip(b["doc_id"], b["media"]):
                frames, _fps = decode_avi_gray(bytes(media))
                for k, fr in enumerate(frames):
                    text, conf = recognize_text(K.adaptive_threshold(fr),
                                                expect_chars=expect_chars)
                    docs.append(doc)
                    idxs.append(k)
                    texts.append(text)
                    confs.append(conf)
            yield pd.DataFrame({"doc_id": docs, "frame_idx": idxs,
                                "text": texts, "conf": confs})
    return df.mapInPandas(fn, schema=VIDEO_OCR_DDL)


AUDIO_STATS_DDL = ("doc_id bigint, n_samples int, sample_rate int, "
                   "duration_ms double, peak int, rms double, "
                   "zero_crossings int")


def audio_decode_stats(df: DataFrame) -> DataFrame:
    """df(doc_id, media: binary WAV) -> per-clip decode + signal stats:
    sample count, rate, duration, peak amplitude, RMS, zero-crossing
    count.  REAL decode via the from-scratch RIFF walker
    (``functions/wav_codec.py``); reductions are numpy over the decoded
    int16 buffer — no per-sample Python.  The stats the audio analog of
    the reference's pre-OCR image profiling (``ocr_adapter_improved.py:
    843-869``) would key preprocessing on."""
    from ..functions.wav_codec import decode_wav_pcm16

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            if b.empty:
                continue
            ns, rates, durs, peaks, rmss, zcs = [], [], [], [], [], []
            for media in b["media"]:
                samples, rate = decode_wav_pcm16(bytes(media))
                s = samples.astype(np.int64)
                n = len(s)
                ns.append(n)
                rates.append(rate)
                durs.append(n * 1000.0 / rate)
                peaks.append(int(np.abs(s).max()) if n else 0)
                rmss.append(float(np.sqrt(np.mean(s * s))) if n else 0.0)
                zcs.append(int(np.count_nonzero(s[1:] * s[:-1] < 0)))
            yield pd.DataFrame({
                "doc_id": b["doc_id"], "n_samples": ns, "sample_rate": rates,
                "duration_ms": durs, "peak": peaks, "rms": rmss,
                "zero_crossings": zcs})
    return df.mapInPandas(fn, schema=AUDIO_STATS_DDL)
