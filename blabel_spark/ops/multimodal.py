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


def _decode_batch(payloads: pd.Series, n_values: np.ndarray
                  ) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized batch pseudo-decode: one flat uint8 sample buffer for
    the whole Arrow batch plus per-row segment ids.

    All rows decode in ONE numpy gather: concatenate the payload bytes,
    then index sample j of row r at payload_offset[r] + (j mod len[r]) —
    no per-row Python in the hot path (a real codec would slot in here as
    a batched decode the same way)."""
    lens = np.fromiter((len(p) for p in payloads), dtype=np.int64,
                       count=len(payloads))
    lens = np.maximum(lens, 1)
    offs = np.concatenate(([0], np.cumsum(lens)[:-1]))
    # empty payloads are padded with one zero byte so the flat buffer
    # layout matches the clamped lens — otherwise a single empty payload
    # mid-batch shifts every later row's samples and can index past the
    # buffer end
    allbytes = np.frombuffer(b"".join(bytes(p) or b"\x00" for p in payloads),
                             dtype=np.uint8)
    n = np.maximum(n_values.astype(np.int64), 1)
    seg_id = np.repeat(np.arange(len(n)), n)
    starts = np.concatenate(([0], np.cumsum(n)[:-1]))
    pos = np.arange(int(n.sum())) - starts[seg_id]     # within-row index
    idx = offs[seg_id] + pos % lens[seg_id]
    return allbytes[idx], seg_id


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
            if not len(pdf):
                continue
            kind = pdf["kind"].to_numpy()
            w = pdf["width"].to_numpy(dtype=np.int64)
            h = pdf["height"].to_numpy(dtype=np.int64)
            sr = pdf["sample_rate"].to_numpy(dtype=np.int64)
            dur = pdf["duration_ms"].to_numpy(dtype=np.int64)
            plen = np.fromiter((len(p) for p in pdf["payload"]),
                               dtype=np.int64, count=len(pdf))
            n = np.where(kind == "image", w * h,
                         np.maximum(sr * dur // 1000, plen))
            samples, seg_id = _decode_batch(pdf["payload"], n)
            n = np.maximum(n, 1)
            # segmented stats — all numpy, no per-row Python
            sums = np.bincount(seg_id, weights=samples, minlength=len(n))
            sq = np.bincount(seg_id, weights=samples.astype(np.float64) ** 2,
                             minlength=len(n))
            mean = sums / n
            std = np.sqrt(np.maximum(sq / n - mean ** 2, 0.0))
            hist2d = np.bincount(seg_id * 8 + (samples >> 5),
                                 minlength=len(n) * 8).reshape(len(n), 8)
            yield pd.DataFrame({
                "media_id": pdf["media_id"].to_numpy(),
                "kind": kind,
                "n_samples": n,
                "mean": np.round(mean, 4),
                "std": np.round(std, 4),
                "hist": list(hist2d.astype(np.int64)),
            })

    schema = ("media_id long, kind string, n_samples long, mean double, "
              "std double, hist array<long>")
    return media.mapInPandas(run, schema)


def resize_images(media: DataFrame, out_w: int = 4, out_h: int = 4) -> DataFrame:
    """'Resize' image payloads by striding the decoded buffer to
    out_w×out_h — the shape contract of a real resize, minus the codec."""
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        k = out_w * out_h
        for pdf in batches:
            pdf = pdf[pdf["kind"] == "image"].reset_index(drop=True)
            if not len(pdf):
                continue
            n = np.maximum(
                pdf["width"].to_numpy(np.int64)
                * pdf["height"].to_numpy(np.int64), 1)
            samples, seg_id = _decode_batch(pdf["payload"], n)
            starts = np.concatenate(([0], np.cumsum(n)[:-1]))
            # per-row linspace as one 2-D gather: stride j*(n_r-1)//(k-1)
            j = np.arange(k)
            idx = starts[:, None] + j[None, :] * (n[:, None] - 1) // max(
                k - 1, 1)
            pix = samples[idx]                      # (rows, k) uint8
            yield pd.DataFrame({
                "media_id": pdf["media_id"].to_numpy(),
                "width": out_w, "height": out_h,
                "pixels": list(map(bytes, pix)),
            })

    return media.mapInPandas(
        run, "media_id long, width int, height int, pixels binary")


def sample_frames(media: DataFrame, every_ms: int = 500) -> DataFrame:
    """Frame-sample video payloads: one row per sampled frame offset with
    a deterministic frame fingerprint (md5 of the frame's byte slice)."""
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf = pdf[pdf["kind"] == "video"].reset_index(drop=True)
            if not len(pdf):
                continue
            dur = pdf["duration_ms"].to_numpy(np.int64)
            plen = np.fromiter((len(p) for p in pdf["payload"]),
                               dtype=np.int64, count=len(pdf))
            n_frames = np.maximum(dur // every_ms, 1)
            step = np.maximum(plen // n_frames, 1)
            # vectorized frame expansion: one output row per (video, frame)
            vid_id = np.repeat(np.arange(len(pdf)), n_frames)
            starts = np.concatenate(([0], np.cumsum(n_frames)[:-1]))
            frame_no = np.arange(int(n_frames.sum())) - starts[vid_id]
            lo = frame_no * step[vid_id]
            hi = lo + step[vid_id]
            payloads = pdf["payload"].to_numpy()
            # md5 is inherently per-frame (the output row), like any hash
            # column — the expansion/indexing above is the vectorized part
            hashes = [hashlib.md5(
                bytes(payloads[v])[a:b]).hexdigest()
                for v, a, b in zip(vid_id, lo, hi)]
            yield pd.DataFrame({
                "media_id": pdf["media_id"].to_numpy()[vid_id],
                "offset_ms": frame_no * every_ms,
                "frame_hash": hashes,
            })

    return media.mapInPandas(
        run, "media_id long, offset_ms int, frame_hash string")
