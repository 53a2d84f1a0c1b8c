"""Structured Streaming: multi-microbatch stream-static join equals the
batch join (split source files, one file per trigger)."""

import pytest
from pyspark.sql import functions as F

from ds_jedai_spark.io.synthetic import load_sql, source_box_sql
from ds_jedai_spark.streaming import geostream as gs

SF = "/root/testdata/sf0.001"
THETA = (1.0, 1.0)


@pytest.fixture(scope="module")
def event_files(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("evstream"))
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    ev = spark.read.parquet(f"{SF}/events.parquet").limit(2000)
    ev.repartition(4).write.mode("overwrite").parquet(out)
    return out


def test_stream_static_join_matches_batch_across_microbatches(spark, event_files):
    raw = (
        spark.readStream.schema(gs.EVENT_SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(event_files)
    )
    stream_pts = gs.event_points(raw)
    src = load_sql(spark, SF, source_box_sql())
    j = gs.stream_points_in_boxes(stream_pts, src, THETA)
    gs.run_to_table(j, "t_stream_join", "append")
    got = {
        (r.s_id, r.t_id) for r in spark.table("t_stream_join").collect()
    }

    batch_pts = gs.event_points(spark.read.parquet(event_files))
    want = {
        (r.s_id, r.t_id)
        for r in gs.stream_points_in_boxes(batch_pts, src, THETA).collect()
    }
    assert got == want and len(want) > 0


def test_windowed_counts_watermark_schema(spark, event_files):
    ev = (
        spark.readStream.schema(gs.EVENT_SCHEMA)
        .parquet(event_files)
        .withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    )
    agg = gs.windowed_event_counts(ev)
    gs.run_to_table(agg, "t_stream_win", "complete")
    out = spark.table("t_stream_win")
    assert set(out.columns) == {"win_start", "event_type", "n", "min_value", "max_value"}
    total = out.agg(F.sum("n")).first()[0]
    assert total == spark.read.parquet(event_files).count() > 0
