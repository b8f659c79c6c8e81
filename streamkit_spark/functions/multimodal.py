"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The Spark-side plumbing is real and tested — schema, partition-friendly
batch iteration (mapInPandas, one Arrow batch at a time, never a
collect), UDF signatures, deterministic batch shapes.  The actual codec
work (JPEG decode, resampling, frame extraction) is stubbed: the container
has no image/audio libraries, so ``decode_fn=None`` raises
NotImplementedError at *call* time while ``fake_decode`` provides a
deterministic stand-in so pipelines and tests exercise the full plumbing.

At 100 TB: media rows are large and skew-prone — the module keeps binary
payloads out of shuffles (feature extraction is map-only; only the small
extracted features ever move), and `media_stats` aggregates byte sizes
without deserializing payloads.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image | audio | video
        T.StructField("content", T.BinaryType(), False),
        T.StructField("mime", T.StringType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("duration_ms", T.LongType(), True),
                    T.StructField("sample_rate", T.IntegerType(), True),
                ]
            ),
            True,
        ),
    ]
)

FEATURE_SCHEMA = (
    "media_id long, kind string, n_bytes long, feature array<float>, note string"
)


def fake_decode(content: bytes, kind: str) -> list[float]:
    """Deterministic stand-in for a real decoder: 8 moments of the byte
    stream.  Stable across runs/partitions — usable in correctness tests."""
    if not content:
        return [0.0] * 8
    n = len(content)
    s = sum(content)
    mx, mn = max(content), min(content)
    return [
        float(n),
        s / n,
        float(mx),
        float(mn),
        float(content[0]),
        float(content[-1]),
        float(content[n // 2]),
        float(s % 251),
    ]


def extract_features(
    df: DataFrame,
    decode_fn: Callable[[bytes, str], list[float]] | None = None,
    batch_note: str = "",
) -> DataFrame:
    """Map-only feature extraction over media rows via mapInPandas.

    ``decode_fn=None`` marks the real-codec path as unavailable in this
    environment (STUB): calling the resulting DataFrame raises
    NotImplementedError from the executor.  Pass :func:`fake_decode` (or a
    real decoder) for a working pipeline."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if decode_fn is None:
                raise NotImplementedError(
                    "media decode requires an image/audio codec library; "
                    "not available in this environment (see multimodal.py)"
                )
            out = pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": pdf["content"].map(len).astype("int64"),
                    "feature": pdf.apply(
                        lambda r: decode_fn(r["content"], r["kind"]), axis=1
                    ),
                    "note": batch_note,
                }
            )
            yield out

    return df.mapInPandas(run, schema=FEATURE_SCHEMA)


def frame_sample_plan(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling *plan*: expands each video row into the frame
    timestamps a decoder would extract — pure JVM arithmetic on metadata;
    the (stubbed) decode happens per emitted row downstream."""
    return (
        df.filter(F.col("kind") == "video")
        .select(
            "media_id",
            F.explode(
                F.sequence(
                    F.lit(0),
                    F.coalesce(F.col("meta.duration_ms"), F.lit(0)),
                    F.lit(every_ms),
                )
            ).alias("frame_ts_ms"),
        )
    )


def media_stats(df: DataFrame) -> DataFrame:
    """Byte-size stats per kind without touching payload contents beyond
    length() — stays columnar, no Python."""
    return (
        df.groupBy("kind")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.length("content")).alias("total_bytes"),
            F.max(F.length("content")).alias("max_bytes"),
        )
        .orderBy("kind")
    )


RESIZED_SCHEMA = (
    "media_id long, kind string, content binary, width int, height int, "
    "n_bytes_in long, n_bytes_out long"
)


def fake_resize(content: bytes, w: int, h: int) -> bytes:
    """Deterministic stand-in for a real image resize: stride-samples the
    byte stream down to exactly ``w*h`` bytes (pads by wrapping when the
    source is smaller) — stable across runs/partitions, so pipelines and
    tests can assert exact output shapes without a codec library."""
    target = max(w * h, 1)
    if not content:
        return bytes(target)
    n = len(content)
    return bytes(content[(i * n) // target] for i in range(target))


def resize_media(
    df: DataFrame,
    target_w: int = 64,
    target_h: int = 64,
    resize_fn: Callable[[bytes, int, int], bytes] | None = None,
) -> DataFrame:
    """Map-only media resize via mapInPandas — the thumbnail/normalize
    pass of an image pipeline.

    Same environment contract as :func:`extract_features`:
    ``resize_fn=None`` marks the real-codec path (Pillow/ffmpeg) as
    unavailable and raises NotImplementedError at call time;
    :func:`fake_resize` exercises the full plumbing deterministically.
    The binary payload is transformed in place per Arrow batch and NEVER
    shuffled — downstream writers see the new (smaller) payload plus
    both byte counts for size accounting."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if resize_fn is None:
                raise NotImplementedError(
                    "media resize requires an image codec library; "
                    "not available in this environment (see multimodal.py)"
                )
            out_content = pdf.apply(
                lambda r: resize_fn(r["content"], target_w, target_h), axis=1
            )
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "content": out_content,
                    "width": target_w,
                    "height": target_h,
                    "n_bytes_in": pdf["content"].map(len).astype("int64"),
                    "n_bytes_out": out_content.map(len).astype("int64"),
                }
            )

    return df.mapInPandas(run, schema=RESIZED_SCHEMA)
