"""Multimodal column plumbing for training-data pipelines.

Images/audio/video ride as opaque `binary` columns + typed metadata
structs. The Spark-side plumbing (schema, batching, partition sizing,
UDF signatures) is real and tested; the actual codec work is stubbed
behind `DecodeBackend` because media libraries aren't in this
container — a real backend (PIL/ffmpeg) plugs in without touching the
dataflow. Decode runs in `mapInPandas` so each Arrow batch amortizes
Python crossing, and `repartition` before decode bounds per-task
memory (binary payloads don't split like parquet row groups).
"""

from __future__ import annotations

import hashlib
import zlib
from typing import Callable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image|audio|video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("duration_ms", T.IntegerType(), True),
                    T.StructField("mime", T.StringType(), True),
                ]
            ),
            True,
        ),
    ]
)

# A DecodeBackend maps raw bytes → feature vector (np.ndarray float32).
DecodeBackend = Callable[[bytes, str], np.ndarray]


def real_decode_backend(payload: bytes, kind: str) -> np.ndarray:
    """Placeholder for a PIL/torchaudio/ffmpeg decode. Not available in
    this container — install a media backend and swap it in."""
    raise NotImplementedError(
        "media codecs unavailable in this environment; use fake_decode_backend"
    )


def fake_decode_backend(payload: bytes, kind: str, dim: int = 16) -> np.ndarray:
    """Deterministic stand-in: feature vector from a rolling crc32 over
    the payload bytes — exercises the full Spark plumbing (Arrow binary
    transfer, batch shapes, schema) with reproducible output."""
    out = np.zeros(dim, dtype=np.float32)
    if payload:
        for i in range(0, len(payload), 64):
            h = zlib.crc32(payload[i : i + 64])
            out[h % dim] += 1.0
        n = np.linalg.norm(out)
        if n > 0:
            out /= n
    return out


def extract_features(
    media: DataFrame,
    backend: DecodeBackend = fake_decode_backend,
    dim: int = 16,
    partition_target_rows: int | None = None,
) -> DataFrame:
    """media(MEDIA_SCHEMA) → (media_id, kind, feature array<float>).

    mapInPandas: one Python crossing per Arrow batch; payloads stay
    bytes end-to-end (no base64 detours)."""
    if partition_target_rows:
        n = max(1, media.count() // partition_target_rows)
        media = media.repartition(n)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                backend(p if p is not None else b"", k)
                for p, k in zip(pdf["payload"], pdf["kind"])
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].values,
                    "kind": pdf["kind"].values,
                    "feature": [f.tolist() for f in feats],
                }
            )

    return media.select("media_id", "kind", "payload").mapInPandas(
        run, schema="media_id long, kind string, feature array<float>"
    )


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling *plan*: one row per (media_id, frame_ts_ms)
    derived from metadata — the shuffle-free part of frame extraction;
    the decode itself goes through extract_features per sampled frame."""
    return (
        media.filter(F.col("kind") == "video")
        .select(
            "media_id",
            F.explode(
                F.sequence(
                    F.lit(0),
                    F.greatest(F.coalesce(F.col("meta.duration_ms"), F.lit(0)) - 1, F.lit(0)),
                    F.lit(every_ms),
                )
            ).alias("frame_ts_ms"),
        )
    )


ResizeBackend = Callable[[bytes, int, int, int, int], bytes]
"""(payload, src_w, src_h, dst_w, dst_h) → resized payload bytes."""


def real_resize_backend(payload: bytes, sw: int, sh: int, dw: int, dh: int) -> bytes:
    """Placeholder for a PIL/cv2 resample. Not available here."""
    raise NotImplementedError(
        "media codecs unavailable in this environment; use fake_resize_backend"
    )


def fake_resize_backend(payload: bytes, sw: int, sh: int, dw: int, dh: int) -> bytes:
    """Deterministic stand-in: scales payload length by the pixel ratio
    (repeat/truncate) so batch shapes, binary round-trip, and metadata
    rewrite are exercised with reproducible output."""
    if not payload or not (sw and sh):
        return b""
    target = max(1, int(len(payload) * (dw * dh) / (sw * sh)))
    reps = (target + len(payload) - 1) // len(payload)
    return (payload * reps)[:target]


def resize_plan(
    media: DataFrame,
    dst_w: int,
    dst_h: int,
    backend: ResizeBackend = fake_resize_backend,
) -> DataFrame:
    """Image resize over the binary column: MEDIA_SCHEMA in →
    MEDIA_SCHEMA out with `payload` resized and `meta.width/height`
    rewritten; non-image rows pass through untouched. mapInPandas keeps
    one Python crossing per Arrow batch and bytes end-to-end (the
    brief's resize step; same pluggable-backend seam as decode).
    Shuffle-free — a pure per-partition map, so it composes with any
    upstream partitioning."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_payload, out_meta = [], []
            for p, k, m in zip(pdf["payload"], pdf["kind"], pdf["meta"]):
                m = dict(m) if m is not None else {}
                if k == "image":
                    p = backend(
                        bytes(p) if p is not None else b"",
                        int(m.get("width") or 0),
                        int(m.get("height") or 0),
                        dst_w,
                        dst_h,
                    )
                    m["width"], m["height"] = dst_w, dst_h
                out_payload.append(p)
                out_meta.append(m)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].values,
                    "kind": pdf["kind"].values,
                    "payload": out_payload,
                    "meta": out_meta,
                }
            )

    return media.mapInPandas(run, schema=MEDIA_SCHEMA)


def synth_media(spark, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic fake media table for tests/bench."""
    rows = []
    for i in range(n):
        kind = ["image", "audio", "video"][i % 3]
        payload = hashlib.sha256(f"{seed}:{i}".encode()).digest() * (4 + i % 8)
        rows.append(
            (
                i,
                kind,
                bytearray(payload),
                (64 + i % 512, 64 + (i * 7) % 512, 1000 * (1 + i % 30), f"x/{kind}"),
            )
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)
