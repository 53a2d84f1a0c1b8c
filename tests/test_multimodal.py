"""Multimodal plumbing tests. The real decoder test runs only where
Pillow exists (skipped in this container by design)."""

import pytest
from pyspark.sql import functions as F

from ds_jedai_spark.operators import multimodal as mm


@pytest.fixture(scope="module")
def docs(spark):
    return spark.range(1, 9).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("text-"), F.repeat(F.lit("x"), (F.col("id") * 7).cast("int"))).alias("text"),
    )


def test_media_metadata_deterministic(docs):
    rows = {r.doc_id: r for r in mm.media_metadata(docs).collect()}
    assert len(rows) == 8
    for doc_id, r in rows.items():
        blen = 5 + doc_id * 7
        assert r.byte_len == blen
        assert r.width == 64 + blen % 193
        assert r.height == 64 + (blen * 7) % 211
        assert r.frames == blen % 16 + 1


def test_resize_preserves_aspect_bound(docs):
    for r in mm.resize_meta(docs).collect():
        assert max(r.out_w, r.out_h) == mm.RESIZE_TARGET or (
            r.width <= mm.RESIZE_TARGET and r.height <= mm.RESIZE_TARGET
        )
        assert r.out_w <= mm.RESIZE_TARGET and r.out_h <= mm.RESIZE_TARGET


def test_decode_image_raises_without_pillow(docs, spark):
    if mm.have_image_decoder():
        pytest.skip("Pillow present; covered by test_decode_image_real")
    media = mm.with_payload(docs)
    with pytest.raises(NotImplementedError):
        mm.decode_image(media)


def test_decode_image_real(spark):
    PIL = pytest.importorskip("PIL")
    import io

    from PIL import Image

    def png_bytes(w, h):
        buf = io.BytesIO()
        Image.new("RGB", (w, h)).save(buf, format="PNG")
        return buf.getvalue()

    media = spark.createDataFrame(
        [(1, png_bytes(10, 20)), (2, png_bytes(30, 5))],
        "doc_id long, payload binary",
    )
    rows = {r.doc_id: r for r in mm.decode_image(media).collect()}
    assert rows[1].width == 10 and rows[1].height == 20
    assert rows[2].width == 30 and rows[2].height == 5
    assert rows[1].mode == "RGB"
