"""Multimodal columns: image/audio/video as opaque ``binary`` columns
with typed metadata, processed via Arrow-batched ``mapInPandas``.

The Spark-side plumbing — schemas, batch iteration, partition sizing —
is real and tested; the actual media decode is STUBBED (codec libraries
are not available in this environment): ``decode_stub=True`` (default)
produces deterministic fake features from the md5 of the payload's hex
string (hex, not raw bytes, so the stub is expressible in ANSI SQL for
the DuckDB correctness oracle) so pipelines are end-to-end testable;
``decode_stub=False`` raises NotImplementedError at the decode
boundary, which is where a real Pillow/torchaudio/pyav implementation
plugs in.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F

MEDIA_SCHEMA = (
    "media_id string, kind string, payload binary, width int, height int, "
    "sample_rate int, n_frames int"
)

FEATURE_SCHEMA = "media_id string, kind string, n_bytes long, feature array<float>"

THUMB_SCHEMA = "media_id string, thumb binary, thumb_w int, thumb_h int"

FRAME_SCHEMA = "media_id string, frame_idx int, frame binary"


def synthetic_media_df(spark, n: int = 64, kind: str = "image") -> DataFrame:
    """Deterministic fake media: payload = md5-stream bytes keyed by id."""
    rows = []
    for i in range(n):
        payload = b"".join(
            hashlib.md5(f"{kind}:{i}:{j}".encode()).digest() for j in range(8)
        )
        rows.append((f"m{i:04d}", kind, bytearray(payload), 64, 48, 16000, 30))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def _fake_feature(payload: bytes, dim: int = 8) -> list:
    h = hashlib.md5(payload.hex().encode()).digest()
    return [h[i % 16] / 255.0 for i in range(dim)]


def extract_features(df: DataFrame, dim: int = 8,
                     decode_stub: bool = True) -> DataFrame:
    """binary payload -> fixed-dim feature vector (mapInPandas, Arrow
    batches; partition-parallel)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not decode_stub:
                raise NotImplementedError(
                    "real media decode requires Pillow/torchaudio/pyav; "
                    "plug the decoder in here"
                )
            feats = [
                _fake_feature(bytes(p), dim) for p in pdf["payload"]
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": pdf["payload"].map(len).astype("int64"),
                    "feature": feats,
                }
            )

    return df.mapInPandas(run, FEATURE_SCHEMA)


def resize_images(df: DataFrame, width: int = 16, height: int = 12,
                  decode_stub: bool = True) -> DataFrame:
    """Image resize plumbing: emits (thumb binary, dims). Stub thumbnail
    is a deterministic md5-derived byte block of the right size."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not decode_stub:
                raise NotImplementedError("real image resize needs Pillow")
            thumbs = [
                bytearray(
                    (hashlib.md5(bytes(p).hex().encode()).digest()
                     * (width * height // 16 + 1))[: width * height]
                )
                for p in pdf["payload"]
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "thumb": thumbs,
                    "thumb_w": width,
                    "thumb_h": height,
                }
            )

    return df.where(F.col("kind") == "image").mapInPandas(run, THUMB_SCHEMA)


def sample_frames(df: DataFrame, every_n: int = 10,
                  decode_stub: bool = True) -> DataFrame:
    """Video frame sampling plumbing: one output row per sampled frame."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not decode_stub:
                raise NotImplementedError("real frame sampling needs pyav")
            out = {"media_id": [], "frame_idx": [], "frame": []}
            for mid, payload, n_frames in zip(
                pdf["media_id"], pdf["payload"], pdf["n_frames"]
            ):
                for fi in range(0, int(n_frames), every_n):
                    out["media_id"].append(mid)
                    out["frame_idx"].append(fi)
                    out["frame"].append(
                        bytearray(hashlib.md5(
                            (bytes(payload).hex() + f"{fi:08x}").encode()
                        ).digest())
                    )
            yield pd.DataFrame(out)

    return df.mapInPandas(run, FRAME_SCHEMA)
