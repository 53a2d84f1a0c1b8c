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


def _binary_rows(batch, name: str):
    """Zero-copy view of a binary column: (row offsets int64, flat uint8
    buffer) — payload bytes are never materialized as Python objects.

    The buffer reinterpretation below hardcodes non-null int32-offset
    ``binary``; a null row or a large_binary column would silently yield
    offset-garbage lengths, so both invariants are asserted loudly."""
    import numpy as np
    import pyarrow as pa

    col = batch.column(batch.schema.names.index(name))
    # Data-dependent invariants raise (not assert: python -O strips
    # asserts and the reinterpretation would return garbage lengths).
    if col.null_count != 0:
        raise ValueError(f"{name}: null payload rows unsupported")
    if not pa.types.is_binary(col.type):
        raise TypeError(
            f"{name}: expected int32-offset binary, got {col.type}"
        )
    raw = np.frombuffer(col.buffers()[1], dtype=np.int32)
    off = raw[col.offset:col.offset + len(col) + 1].astype(np.int64)
    data = col.buffers()[2]
    flat = (
        np.frombuffer(data, dtype=np.uint8)
        if data is not None
        else np.zeros(0, dtype=np.uint8)
    )
    return off, flat


def media_metadata(docs: DataFrame) -> DataFrame:
    payload = with_payload(docs)

    def extract(batches):
        import numpy as np
        import pyarrow as pa

        for batch in batches:
            off, _ = _binary_rows(batch, "payload")
            lens = pd.Series(np.diff(off))
            meta = _fake_decode(lens)
            yield pa.RecordBatch.from_arrays(
                [
                    batch.column(batch.schema.names.index("doc_id")),
                    *[pa.array(meta[c].to_numpy()) for c in
                      ("byte_len", "width", "height", "frames")],
                ],
                names=["doc_id", "byte_len", "width", "height", "frames"],
            )

    return payload.mapInArrow(extract, META_SCHEMA)


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


DECODE_SCHEMA = "doc_id long, width long, height long, mode string"


def have_image_decoder() -> bool:
    """Feature check for the optional real decoder (Pillow)."""
    try:
        import PIL.Image  # noqa: F401

        return True
    except ImportError:  # pragma: no cover - environment-dependent
        return False


def decode_image(media: DataFrame) -> DataFrame:
    """Real image decode over (doc_id, payload binary) rows — the same
    Arrow-batched mapInPandas shape as media_metadata, wired to Pillow
    when the library exists and a documented NotImplementedError when it
    does not (this container ships no image libraries by design; the
    plumbing — schema, batching, UDF signature — is identical either
    way and unit-tested whenever Pillow is importable)."""
    if not have_image_decoder():
        raise NotImplementedError(
            "image decoding requires Pillow; only the metadata/plumbing "
            "path (media_metadata) runs in this environment"
        )

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import io

        from PIL import Image

        for pdf in batches:
            widths, heights, modes = [], [], []
            for buf in pdf["payload"]:
                with Image.open(io.BytesIO(buf)) as img:
                    widths.append(img.width)
                    heights.append(img.height)
                    modes.append(img.mode)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].values,
                    "width": pd.Series(widths, dtype="int64"),
                    "height": pd.Series(heights, dtype="int64"),
                    "mode": modes,
                }
            )

    return media.mapInPandas(decode, DECODE_SCHEMA)


FEATURES_SCHEMA = (
    "doc_id long, n_bytes long, n_space long, n_vowel long, payload_md5 string"
)


def media_features(docs: DataFrame) -> DataFrame:
    """Feature extraction over the binary payload — the decode-adjacent
    stage of a multimodal pipeline (byte-level statistics + content
    digest). Same Arrow-batched mapInPandas shape as media_metadata, so
    a real embedding/feature model drops into this exact slot; the
    features chosen here are deterministic byte functions, which keeps
    the stage under the DuckDB oracle."""
    payload = with_payload(docs)

    def extract(batches):
        import hashlib

        import numpy as np
        import pyarrow as pa

        for batch in batches:
            off, flat = _binary_rows(batch, "payload")
            lens = np.diff(off)
            starts = off[:-1]
            nz = lens > 0
            space = (flat == ord(" ")).astype(np.int64)
            vowel = np.isin(flat, np.frombuffer(b"aeiou", np.uint8)).astype(
                np.int64
            )
            n_space = np.zeros(len(lens), dtype=np.int64)
            n_vowel = np.zeros(len(lens), dtype=np.int64)
            if nz.any():
                # reduceat over per-row byte ranges; zero-length rows are
                # excluded (a repeated reduceat index would misread).
                n_space[nz] = np.add.reduceat(space, starts[nz])
                n_vowel[nz] = np.add.reduceat(vowel, starts[nz])
            mv = memoryview(flat)
            md5 = [
                hashlib.md5(mv[off[i]:off[i + 1]]).hexdigest()
                for i in range(len(lens))
            ]
            yield pa.RecordBatch.from_arrays(
                [
                    batch.column(batch.schema.names.index("doc_id")),
                    pa.array(lens),
                    pa.array(n_space),
                    pa.array(n_vowel),
                    pa.array(md5, pa.string()),
                ],
                names=["doc_id", "n_bytes", "n_space", "n_vowel", "payload_md5"],
            )

    return payload.mapInArrow(extract, FEATURES_SCHEMA)
