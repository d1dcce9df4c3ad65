"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride through the engine as ``binary`` columns with a
small typed header; decode / feature-extract / resize / frame-sample are
Arrow-batched ``mapInPandas`` operators. The real decode libraries
(PIL/ffmpeg etc.) are NOT in this container, so real-format branches are
gated behind an import-try — but every operator runs for real over
deterministic synthetic codecs whose pixels/samples are closed-form
integer arithmetic every engine (Spark, DuckDB oracle, NumPy pytest)
mirrors exactly:

    FIMG: b"FIMG" + w:u16 + h:u16 + row-major pixels
          pixel(x, y) = (seed + 31*x + 17*y) % 251
    FVID: b"FVID" + n_frames:u16 + w:u16 + h:u16 + raw frames
          frame f pixel = (seed + 7*f + 31*x + 17*y) % 251
    FAUD: b"FAUD" + rate:u32 + n:u32 + int16 samples
          s[t] = ((seed*13 + t*t) % 4001) - 2000

``frame_sample`` re-emits sampled frames as standalone FIMG payloads so the
image operators compose downstream (video -> frames -> image features).
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FEATURE_BANDS = 4

MM_SCHEMA = (
    "doc_id long, width int, height int, n_bytes long, "
    "pixel_sum long, mean_pixel double, features array<double>"
)

try:  # real decoders would live here; not present in this image
    import PIL.Image  # type: ignore # noqa: F401

    HAVE_PIL = True
except ImportError:
    HAVE_PIL = False


def encode_fake_image(seed: int, width: int, height: int) -> bytes:
    x = np.arange(width, dtype=np.int64)
    y = np.arange(height, dtype=np.int64)
    px = ((seed + 31 * x[None, :] + 17 * y[:, None]) % 251).astype(np.uint8)
    return b"FIMG" + struct.pack("<HH", width, height) + px.tobytes()


def synthesize_images(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """documents -> (doc_id, image binary): deterministic fake images whose
    dimensions derive from doc_id (width = 16 + id % 48, height = 16 +
    (id * 7) % 32) — mirrored by the SQL oracle."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf[id_col].tolist()
            blobs = [
                encode_fake_image(i, 16 + i % 48, 16 + (i * 7) % 32) for i in ids
            ]
            yield pd.DataFrame({"doc_id": ids, "image": blobs})

    return docs.select(id_col).mapInPandas(gen, schema="doc_id long, image binary")


def decode_image_features(images: DataFrame) -> DataFrame:
    """(doc_id, image) -> typed metadata + features via one Arrow-batched
    ``mapInPandas`` pass.

    With a real decoder present this would decode the actual format; here the
    deterministic fakeimg codec exercises the identical plumbing. Rows whose
    payload does not parse yield NULL metadata (never an executor crash —
    corrupt blobs are data, not errors, at 100 TB)."""

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {
                "doc_id": [], "width": [], "height": [], "n_bytes": [],
                "pixel_sum": [], "mean_pixel": [], "features": [],
            }
            for doc_id, blob in zip(pdf["doc_id"], pdf["image"]):
                out["doc_id"].append(doc_id)
                if blob is None or len(blob) < 8 or bytes(blob[:4]) != b"FIMG":
                    out["width"].append(None)
                    out["height"].append(None)
                    out["n_bytes"].append(None if blob is None else len(blob))
                    out["pixel_sum"].append(None)
                    out["mean_pixel"].append(None)
                    out["features"].append(None)
                    continue
                w, h = struct.unpack("<HH", bytes(blob[4:8]))
                px = np.frombuffer(bytes(blob[8 : 8 + w * h]), dtype=np.uint8)
                bands = np.array_split(px.astype(np.float64), FEATURE_BANDS)
                out["width"].append(w)
                out["height"].append(h)
                out["n_bytes"].append(len(blob))
                out["pixel_sum"].append(int(px.astype(np.int64).sum()))
                out["mean_pixel"].append(round(float(px.mean()), 6))
                out["features"].append(
                    [round(float(b.mean()), 6) for b in bands]
                )
            yield pd.DataFrame(out)

    return images.mapInPandas(decode, schema=MM_SCHEMA)


def resize_images(images: DataFrame, width: int, height: int) -> DataFrame:
    """Resize operator. Real resampling needs PIL (absent) -> explicit
    NotImplementedError; the fakeimg path regenerates at the target size
    (deterministic stand-in that keeps the operator testable end-to-end)."""

    def rz(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if HAVE_PIL:  # pragma: no cover - not in this container
                raise NotImplementedError("real resize path untested here")
            blobs = []
            for doc_id, blob in zip(pdf["doc_id"], pdf["image"]):
                if blob is not None and bytes(blob[:4]) == b"FIMG":
                    blobs.append(encode_fake_image(int(doc_id), width, height))
                else:
                    blobs.append(None)
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "image": blobs})

    return images.mapInPandas(rz, schema="doc_id long, image binary")


def encode_fake_video(seed: int, n_frames: int, width: int, height: int) -> bytes:
    """FVID container: header + concatenated raw frames; frame f pixel
    (x, y) = (seed + 7*f + 31*x + 17*y) % 251 — closed-form for oracles."""
    x = np.arange(width, dtype=np.int64)
    y = np.arange(height, dtype=np.int64)
    frames = [
        ((seed + 7 * f + 31 * x[None, :] + 17 * y[:, None]) % 251)
        .astype(np.uint8)
        .tobytes()
        for f in range(n_frames)
    ]
    return b"FVID" + struct.pack("<HHH", n_frames, width, height) + b"".join(frames)


def synthesize_videos(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """documents -> (doc_id, video binary): deterministic fake clips;
    n_frames = 8 + id % 9, dims = (16 + id % 16, 16 + (id * 3) % 16)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf[id_col].tolist()
            blobs = [
                encode_fake_video(i, 8 + i % 9, 16 + i % 16, 16 + (i * 3) % 16)
                for i in ids
            ]
            yield pd.DataFrame({"doc_id": ids, "video": blobs})

    return docs.select(id_col).mapInPandas(gen, schema="doc_id long, video binary")


def frame_sample(video: DataFrame, every_n: int = 4) -> DataFrame:
    """Sample every ``every_n``-th frame of each clip; sampled frames are
    re-emitted as standalone FIMG payloads, so the image operators
    (:func:`decode_image_features`, :func:`resize_images`) compose directly
    downstream — the real pipeline shape (video -> frames -> image ops).

    A real decoder (ffmpeg, absent from this image) would slot into the
    demux step behind the same mapInPandas signature; the FVID path is raw
    frame slicing. Corrupt payloads produce no rows (data, not errors)."""

    def fs(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"doc_id": [], "frame_idx": [], "frame": []}
            for doc_id, blob in zip(pdf["doc_id"], pdf["video"]):
                if blob is None or len(blob) < 10 or bytes(blob[:4]) != b"FVID":
                    continue
                nf, w, h = struct.unpack("<HHH", bytes(blob[4:10]))
                fsize = w * h
                for f in range(0, nf, every_n):
                    start = 10 + f * fsize
                    raw = bytes(blob[start : start + fsize])
                    if len(raw) < fsize:
                        break
                    out["doc_id"].append(doc_id)
                    out["frame_idx"].append(f)
                    out["frame"].append(
                        b"FIMG" + struct.pack("<HH", w, h) + raw
                    )
            yield pd.DataFrame(out)

    return video.mapInPandas(fs, schema="doc_id long, frame_idx int, frame binary")


# ------------------------------------------------------------------- audio


def encode_fake_audio(seed: int, rate: int, n: int) -> bytes:
    """FAUD container: header + int16 samples, s[t] = ((seed*13 + t*t) %
    4001) - 2000 — integer arithmetic every engine mirrors exactly."""
    t = np.arange(n, dtype=np.int64)
    samples = (((seed * 13 + t * t) % 4001) - 2000).astype(np.int16)
    return b"FAUD" + struct.pack("<II", rate, n) + samples.tobytes()


def synthesize_audio(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """documents -> (doc_id, audio binary): rate 8000, n = 800 + (id%5)*400."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf[id_col].tolist()
            blobs = [
                encode_fake_audio(i, 8000, 800 + (i % 5) * 400) for i in ids
            ]
            yield pd.DataFrame({"doc_id": ids, "audio": blobs})

    return docs.select(id_col).mapInPandas(gen, schema="doc_id long, audio binary")


AUDIO_SCHEMA = (
    "doc_id long, sample_rate long, n_samples long, duration_sec double, "
    "rms double, zero_crossings long, band_energy array<double>"
)


def decode_audio_features(audio: DataFrame, n_bands: int = FEATURE_BANDS) -> DataFrame:
    """(doc_id, audio) -> typed metadata + features in one Arrow pass:
    duration, RMS amplitude, zero-crossing count, per-band mean energy.
    Corrupt payloads -> NULL metadata rows."""

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {
                "doc_id": [], "sample_rate": [], "n_samples": [],
                "duration_sec": [], "rms": [], "zero_crossings": [],
                "band_energy": [],
            }
            for doc_id, blob in zip(pdf["doc_id"], pdf["audio"]):
                out["doc_id"].append(doc_id)
                if blob is None or len(blob) < 12 or bytes(blob[:4]) != b"FAUD":
                    for k in ("sample_rate", "n_samples", "duration_sec",
                              "rms", "zero_crossings", "band_energy"):
                        out[k].append(None)
                    continue
                rate, n = struct.unpack("<II", bytes(blob[4:12]))
                smp = np.frombuffer(
                    bytes(blob[12 : 12 + 2 * n]), dtype=np.int16
                ).astype(np.float64)
                sign = np.signbit(smp)
                zc = int((sign[1:] != sign[:-1]).sum())
                bands = np.array_split(smp * smp, n_bands)
                out["sample_rate"].append(rate)
                out["n_samples"].append(n)
                out["duration_sec"].append(round(n / rate, 6))
                out["rms"].append(round(float(np.sqrt((smp * smp).mean())), 6))
                out["zero_crossings"].append(zc)
                out["band_energy"].append(
                    [round(float(b.mean()), 6) for b in bands]
                )
            yield pd.DataFrame(out)

    return audio.mapInPandas(decode, schema=AUDIO_SCHEMA)
