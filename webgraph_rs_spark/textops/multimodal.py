"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride through the engine as ``binary`` columns with a
small typed header; decode / feature-extract / resize / frame-sample are
Arrow-batched ``mapInPandas`` operators. The decode libraries (PIL/ffmpeg
etc.) are NOT in this container, so the real decoders are gated behind an
import-try and raise ``NotImplementedError`` — but the Spark-side plumbing
(schema, partitioning, UDF signatures, batch shapes) is real and tested via
a deterministic synthetic codec ("fakeimg"):

    payload = b"FIMG" + width:uint16 + height:uint16 + row-major bytes
              (pixel(x, y) = (seed + 31*x + 17*y) % 251)

so metadata decode is arithmetic the SQL oracle can mirror, and features
(mean/min/max pixel, per-band means) have closed-form pytest oracles.
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


def frame_sample(video: DataFrame, every_n: int = 10) -> DataFrame:
    """Frame-sampling operator signature for video payloads. Decoding needs
    ffmpeg (absent): raises NotImplementedError at execution, but the plan
    (schema, explode shape) is real."""

    def fs(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        raise NotImplementedError(
            "video frame decode requires ffmpeg, not present in this image"
        )
        yield  # pragma: no cover

    return video.mapInPandas(fs, schema="doc_id long, frame_idx int, frame binary")
