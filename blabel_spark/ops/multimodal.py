"""Multimodal columns: opaque binary payloads + typed metadata.

Pattern mandated by the brief: image/audio/video payloads travel as
``binary`` columns with a typed metadata struct; decode / feature-extract /
resize / frame-sample run as Arrow-batched ``mapInPandas`` stages so the
JVM↔Python exchange is one Arrow batch per partition, never per row.

The actual codecs (PIL/libav) are NOT in this container, so the decode
step is stubbed: ``decode="real"`` raises NotImplementedError at the
import boundary, while the default deterministic fake decoder derives a
pixel/sample buffer from the payload bytes (md5-seeded), keeping every
downstream shape, schema and partitioning decision real and testable.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MEDIA_SCHEMA = ("media_id long, kind string, payload binary, "
                "width int, height int, sample_rate int, duration_ms int, "
                "codec string")


def synth_media(spark: SparkSession, n: int = 64, seed: int = 7) -> DataFrame:
    """Deterministic fake media table (payload bytes are md5-chained)."""
    rows = []
    kinds = ["image", "audio", "video"]
    for i in range(n):
        kind = kinds[i % 3]
        blob = b"".join(hashlib.md5(f"{seed}|{i}|{j}".encode()).digest()
                        for j in range(8 + (i % 5)))
        w, h = (8 + i % 4, 6 + i % 3) if kind == "image" else (0, 0)
        sr = 16000 if kind == "audio" else 0
        dur = 1000 + 250 * (i % 4) if kind != "image" else 0
        rows.append((i, kind, blob, w, h, sr, dur, f"fake-{kind}"))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def _fake_decode(payload: bytes, n_values: int) -> np.ndarray:
    """Deterministic pseudo-decode: tile the payload bytes to n_values
    uint8 samples.  Stands in for a real codec; same signature/shape."""
    buf = np.frombuffer(payload, dtype=np.uint8)
    reps = int(np.ceil(n_values / max(len(buf), 1)))
    return np.tile(buf, reps)[:n_values]


def decode_features(media: DataFrame, decode: str = "fake",
                    batch_hint: int = 1024) -> DataFrame:
    """Decode payloads and extract per-item features (mean/std/8-bin
    histogram of the sample buffer) → (media_id, kind, n_samples,
    mean, std, hist array<int>).

    decode="real" requires an image/audio codec stack that is not baked
    into this container → NotImplementedError (clearly-marked stub).
    """
    if decode == "real":
        raise NotImplementedError(
            "real codecs (PIL/libav) are not available in this container; "
            "use decode='fake' — the Spark plumbing is identical")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for _, r in pdf.iterrows():
                n = (r["width"] * r["height"] if r["kind"] == "image"
                     else max(r["sample_rate"] * r["duration_ms"] // 1000,
                              len(r["payload"])))
                buf = _fake_decode(r["payload"], int(max(n, 1)))
                hist = np.histogram(buf, bins=8, range=(0, 256))[0]
                out.append((r["media_id"], r["kind"], len(buf),
                            float(np.round(buf.mean(), 4)),
                            float(np.round(buf.std(), 4)),
                            hist.astype("int64").tolist()))
            yield pd.DataFrame(out, columns=[
                "media_id", "kind", "n_samples", "mean", "std", "hist"])

    schema = ("media_id long, kind string, n_samples long, mean double, "
              "std double, hist array<long>")
    return media.mapInPandas(run, schema)


def resize_images(media: DataFrame, out_w: int = 4, out_h: int = 4) -> DataFrame:
    """'Resize' image payloads by striding the decoded buffer to
    out_w×out_h — the shape contract of a real resize, minus the codec."""
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf = pdf[pdf["kind"] == "image"]
            out = []
            for _, r in pdf.iterrows():
                n = int(max(r["width"] * r["height"], 1))
                buf = _fake_decode(r["payload"], n)
                idx = np.linspace(0, n - 1, out_w * out_h).astype(int)
                out.append((r["media_id"], out_w, out_h,
                            buf[idx].tobytes()))
            yield pd.DataFrame(out, columns=["media_id", "width", "height",
                                             "pixels"])

    return media.mapInPandas(
        run, "media_id long, width int, height int, pixels binary")


def sample_frames(media: DataFrame, every_ms: int = 500) -> DataFrame:
    """Frame-sample video payloads: one row per sampled frame offset with
    a deterministic frame fingerprint (md5 of the frame's byte slice)."""
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf = pdf[pdf["kind"] == "video"]
            out = []
            for _, r in pdf.iterrows():
                dur = int(r["duration_ms"])
                payload = bytes(r["payload"])
                n_frames = max(dur // every_ms, 1)
                step = max(len(payload) // n_frames, 1)
                for f in range(n_frames):
                    sl = payload[f * step:(f + 1) * step]
                    out.append((r["media_id"], f * every_ms,
                                hashlib.md5(sl).hexdigest()))
            yield pd.DataFrame(out, columns=["media_id", "offset_ms",
                                             "frame_hash"])

    return media.mapInPandas(
        run, "media_id long, offset_ms int, frame_hash string")
