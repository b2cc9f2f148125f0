"""Multimodal column plumbing (image/audio/video as opaque binary).

The decode/feature-extraction libraries are not available in this
container, so the *decode step* is stubbed (deterministic fake features or
NotImplementedError), while everything Spark-side is real and tested:
schema, Arrow batch shape, ``mapInPandas`` signatures, partition-size
control for large blobs.

At 100 TB: binary payloads dominate partition size, so the reader path
sets ``spark.sql.files.maxPartitionBytes`` low for blob tables and the
kernels stream Arrow batches without materializing a partition's blobs at
once."""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame

MEDIA_SCHEMA = (
    "media_id bigint, kind string, payload binary, width int, height int, "
    "duration_ms int, codec string"
)

FEATURE_SCHEMA = "media_id bigint, kind string, feat array<float>, note string"


def decode_media(payload: bytes, kind: str) -> dict:
    """STUB: real image/audio decode requires libs absent from this
    container.  Raises by contract; ``fake_features`` is the deterministic
    test double wired through the same plumbing."""
    raise NotImplementedError(
        "media decode requires PIL/av; not available in this environment"
    )


def fake_features(payload: bytes, kind: str, dim: int = 8) -> list[float]:
    """Deterministic fake feature vector from the payload digest — stands
    in for decode→embed so the distributed plumbing is fully testable."""
    d = hashlib.md5((kind or "").encode() + (payload or b"")).digest()
    return [round(b / 255.0, 6) for b in d[:dim]]


def extract_features(
    df: DataFrame, dim: int = 8, use_stub: bool = True
) -> DataFrame:
    """Arrow-batched feature extraction over a media table
    (``MEDIA_SCHEMA``-shaped).  Batch shape: one Arrow batch in, one
    pandas frame out; blobs never cross the driver."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats, notes = [], []
            for payload, kind in zip(pdf["payload"], pdf["kind"]):
                if use_stub:
                    feats.append(fake_features(payload, kind, dim))
                    notes.append("stub")
                else:  # pragma: no cover - real decode path
                    feats.append(decode_media(payload, kind))
                    notes.append("decoded")
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "feat": feats,
                    "note": notes,
                }
            )

    return df.mapInPandas(kernel, schema=FEATURE_SCHEMA)


def resize_media(
    df: DataFrame, width: int, height: int, use_stub: bool = True
) -> DataFrame:
    """Arrow-batched image resize over a media table: output keeps
    MEDIA_SCHEMA with updated (width, height) and the re-encoded payload.

    The actual pixel decode/resample is the stubbed step (PIL absent from
    this container): the deterministic double re-digests the payload with
    the target dims so downstream plumbing (schemas, batch shapes,
    dedup-after-resize) is fully testable; swap ``use_stub=False`` for a
    real PIL kernel in production."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for payload, kind in zip(pdf["payload"], pdf["kind"]):
                if use_stub:
                    payloads.append(
                        hashlib.md5(
                            (payload or b"")
                            + f":{width}x{height}:{kind}".encode()
                        ).digest()
                    )
                else:  # pragma: no cover - real resample path
                    payloads.append(decode_media(payload, kind))
            out = pdf.copy()
            out["payload"] = payloads
            out["width"] = width
            out["height"] = height
            yield out

    return df.mapInPandas(kernel, schema=MEDIA_SCHEMA)


def frame_sample_plan(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling *plan*: expands (media_id, duration_ms) into
    frame timestamps JVM-side (sequence+explode); the decode of each frame
    is the stubbed step."""
    from pyspark.sql import functions as F

    return df.select(
        "media_id",
        F.explode(
            F.sequence(
                F.lit(0),
                F.greatest(F.col("duration_ms") - 1, F.lit(0)),
                F.lit(every_ms),
            )
        ).alias("frame_ts_ms"),
    )
