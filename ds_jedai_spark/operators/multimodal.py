"""Multimodal (binary) column plumbing.

Treats media as opaque ``binary`` columns with typed metadata, processed
by Arrow-batched ``mapInPandas`` — the Spark-side plumbing (schema,
batching, UDF signature) is real and tested; the actual decoders are
stubbed because no image/audio libraries exist in this environment.

The metadata extractor is a deterministic function of the payload bytes,
so it is oracle-checkable in SQL; a real deployment would swap
``_fake_decode`` for PIL/ffmpeg calls inside the same mapInPandas shape.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F

META_SCHEMA = "doc_id long, byte_len long, width long, height long, frames long"


def with_payload(docs: DataFrame) -> DataFrame:
    """Derive a binary payload column (here: utf-8 bytes of the text —
    stands in for image/audio bytes read from a real store)."""
    return docs.select("doc_id", F.col("text").cast("binary").alias("payload"))


def _fake_decode(byte_len: pd.Series) -> pd.DataFrame:
    """Deterministic stand-in for a media decoder (documented stub)."""
    return pd.DataFrame(
        {
            "byte_len": byte_len,
            "width": 64 + byte_len % 193,
            "height": 64 + (byte_len * 7) % 211,
            "frames": byte_len % 16 + 1,
        }
    )


def media_metadata(docs: DataFrame) -> DataFrame:
    payload = with_payload(docs)

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            lens = pdf["payload"].map(len).astype("int64")
            meta = _fake_decode(lens)
            meta.insert(0, "doc_id", pdf["doc_id"].values)
            yield meta

    return payload.mapInPandas(extract, META_SCHEMA)


RESIZE_TARGET = 224


def resize_meta(docs: DataFrame) -> DataFrame:
    """Aspect-preserving resize planning: target dims fitting a
    RESIZE_TARGET square. Pure column arithmetic over the decoded
    metadata — at scale this column feeds the (stubbed) pixel resampler
    without any extra shuffle."""
    m = "greatest(width, height)"
    return media_metadata(docs).select(
        "doc_id",
        "width",
        "height",
        F.expr(
            f"CAST(floor((width * {RESIZE_TARGET}.0) / {m}) AS BIGINT)"
        ).alias("out_w"),
        F.expr(
            f"CAST(floor((height * {RESIZE_TARGET}.0) / {m}) AS BIGINT)"
        ).alias("out_h"),
    )


def frame_sample(docs: DataFrame) -> DataFrame:
    """Frame sampling plan for video-like payloads: one row per sampled
    frame index (stride = max(1, frames/8)), via explode(sequence(...)) —
    all JVM-side; a real decoder maps these indices to pixel batches."""
    return media_metadata(docs).select(
        "doc_id",
        "frames",
        F.explode(
            F.expr("sequence(CAST(0 AS BIGINT), frames - 1, greatest(CAST(1 AS BIGINT), frames div 8))")
        ).alias("frame_idx"),
    )


def decode_image(docs: DataFrame) -> DataFrame:
    """Real image decode — unavailable in this environment by design."""
    try:
        import PIL  # noqa: F401
    except ImportError as exc:  # pragma: no cover
        raise NotImplementedError(
            "image decoding requires Pillow; only the metadata/plumbing "
            "path (media_metadata) runs in this environment"
        ) from exc
    raise NotImplementedError("decoder wiring pending")
