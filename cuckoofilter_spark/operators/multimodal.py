"""Multimodal column plumbing: image/audio/video payloads as opaque
``binary`` columns with typed metadata, processed in Arrow-batched
``mapInPandas`` stages.

The Spark-side machinery (schemas, batch shapes, partition sizing, UDF
signatures) is real and tested; the codec step is STUBBED because no
image/audio libraries exist in this container: ``decode=`deterministic```
derives a fake-but-stable feature vector from the payload bytes, and
``decode=`strict``` raises ``NotImplementedError`` where a real decoder
(PIL/ffmpeg/torchaudio) would plug in.  Swapping the stub for a real
decoder changes ONE function — none of the distributed plumbing.

Scale notes: media rows are large (MBs) — ``spark.sql.files.
maxPartitionBytes`` governs scan granularity, and the feature extractor
emits small fixed-width vectors, so the post-extract shuffle is tiny.
Never collect payloads; metadata-only plans prune the binary column at the
scan (check ReadSchema).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = ("media_id long, payload binary, media_type string, "
                "width int, height int, sample_rate int, n_frames int")

FEATURE_DIM = 32
FEATURES_SCHEMA = f"media_id long, media_type string, features array<float>, n_bytes long"


def _stub_decode(payload: bytes, media_type: str) -> np.ndarray:
    """Deterministic stand-in for a real decoder: a stable pseudo-feature
    vector seeded from a CONTENT digest (crc32) — a pure function of the
    payload bytes, identical across processes regardless of
    PYTHONHASHSEED (Python's ``hash()`` is per-process salted).  Raises
    for strict mode via `extract_features(..., decode="strict")`."""
    import zlib

    rng = np.random.default_rng(zlib.crc32(payload[:256]))
    return rng.standard_normal(FEATURE_DIM).astype(np.float32)


def extract_features(df: DataFrame, decode: str = "deterministic",
                     batch_rows: int = 64) -> DataFrame:
    """binary payload → fixed-width feature vector, one Arrow batch at a
    time.  ``decode="strict"`` marks where the real codec goes."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for start in range(0, len(pdf), batch_rows):
                chunk = pdf.iloc[start:start + batch_rows]
                feats = []
                for payload, mt in zip(chunk["payload"], chunk["media_type"]):
                    if decode == "strict":
                        raise NotImplementedError(
                            f"real {mt} decoder not available in this "
                            "environment; plug PIL/ffmpeg here")
                    feats.append(_stub_decode(bytes(payload), mt))
                yield pd.DataFrame({
                    "media_id": chunk["media_id"].to_numpy(),
                    "media_type": chunk["media_type"].to_numpy(),
                    "features": feats,
                    "n_bytes": [len(bytes(p)) for p in chunk["payload"]],
                })

    return df.mapInPandas(fn, schema=FEATURES_SCHEMA)


def frame_sample_plan(df: DataFrame, every_n: int = 10) -> DataFrame:
    """Video frame sampling *plan*: explode frame indices 0, n, 2n …
    (metadata-only — prunes the payload column; the per-frame decode is the
    same stubbed codec boundary as `extract_features`)."""
    idx = F.sequence(F.lit(0), F.greatest(F.col("n_frames") - 1, F.lit(0)),
                     F.lit(every_n))
    return (
        df.filter(F.col("media_type") == "video")
        .select("media_id", F.explode(idx).alias("frame_idx"))
    )


def resize_media(df: DataFrame, width: int, height: int,
                 decode: str = "deterministic") -> DataFrame:
    """payload → payload at (width, height): the binary-in/binary-out
    transform stage (image resize / audio resample shape).  The pixel
    work is the same stubbed codec boundary: ``deterministic`` mode
    emits a stable ``width·height``-byte payload derived by tiling or
    truncating the source bytes (testable end-to-end — output size is
    exact and content is a pure function of input); ``strict`` raises at
    the real-decoder plug-in point.  Metadata columns are rewritten to
    the target dimensions; all other plumbing (Arrow batching, schema,
    partition sizing) is the production path."""

    target = width * height

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_payloads = []
            for payload, mt in zip(pdf["payload"], pdf["media_type"]):
                if decode == "strict":
                    raise NotImplementedError(
                        f"real {mt} resampler not available in this "
                        "environment; plug PIL/ffmpeg here")
                raw = bytes(payload)
                if not raw:
                    out_payloads.append(b"\x00" * target)
                    continue
                reps = -(-target // len(raw))
                out_payloads.append((raw * reps)[:target])
            out = pdf.copy()
            out["payload"] = out_payloads
            out["width"] = np.int32(width)
            out["height"] = np.int32(height)
            yield out

    return df.mapInPandas(fn, schema=df.schema)


def media_stats(df: DataFrame) -> DataFrame:
    """Metadata-only aggregate — verifies the binary column is pruned from
    the scan (ReadSchema excludes `payload`)."""
    return (
        df.groupBy("media_type")
        .agg(F.count("*").alias("n"),
             F.avg("width").alias("avg_width"),
             F.avg("n_frames").alias("avg_frames"))
    )
