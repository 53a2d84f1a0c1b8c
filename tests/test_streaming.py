"""Structured Streaming: multi-microbatch stream-static join equals the
batch join (split source files, one file per trigger)."""

import pytest
from pyspark.sql import functions as F

from ds_jedai_spark.io.synthetic import load_sql, source_box_sql
from ds_jedai_spark.streaming import geostream as gs

SF = "/root/testdata/sf0.001"
THETA = (1.0, 1.0)


def _events_normalized(spark):
    """Events with ts as a proper timestamp regardless of the parquet
    layout (NANOS-as-long or MICROS) — the same rule event_stream applies,
    so fixtures rewrite a layout every reader interprets identically."""
    from pyspark.sql import types as T

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    ev = spark.read.parquet(f"{SF}/events.parquet")
    if isinstance(ev.schema["ts"].dataType, T.LongType):
        ev = ev.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return ev.withColumn("ts", F.col("ts").cast("timestamp"))


@pytest.fixture(scope="module")
def event_files(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("evstream"))
    ev = _events_normalized(spark).limit(2000)
    ev.repartition(4).write.mode("overwrite").parquet(out)
    return out


def test_stream_static_join_matches_batch_across_microbatches(spark, event_files):
    raw = gs.event_stream(spark, event_files, maxFilesPerTrigger="1")
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


@pytest.fixture(scope="module")
def ordered_event_files(spark, tmp_path_factory):
    """Time-ordered file drops (the sessionize arrival contract): file i
    holds the i-th quartile of the timeline, written sequentially."""
    out = str(tmp_path_factory.mktemp("evordered"))
    ev = _events_normalized(spark)
    ev = ev.withColumn("tsd", F.col("ts").cast("double"))
    qs = ev.approxQuantile("tsd", [0.25, 0.5, 0.75], 0.0)
    bounds = [float("-inf")] + qs + [float("inf")]
    for i in range(4):
        ev.where(
            (F.col("tsd") > bounds[i]) & (F.col("tsd") <= bounds[i + 1])
        ).drop("tsd").coalesce(1).write.mode("append").parquet(out)
    return out


def test_sessionize_state_carries_across_microbatches(spark, ordered_event_files):
    def run(max_files):
        raw = gs.event_stream(
            spark,
            ordered_event_files,
            maxFilesPerTrigger=str(max_files),
            latestFirst="false",
        )
        name = f"t_sessions_{max_files}"
        gs.run_to_table(gs.sessionize(raw), name, "append")
        return {
            (r.user_id, r.session_start, r.session_end, r.n_events)
            for r in spark.table(name).collect()
        }

    # One batch vs one-file-per-batch must emit the same closed sessions:
    # the open tail lives in state and is never emitted by either.
    single = run(100)
    multi = run(1)
    assert single == multi and len(single) > 0


def test_windowed_counts_watermark_schema(spark, event_files):
    ev = gs.event_stream(spark, event_files)
    agg = gs.windowed_event_counts(ev)
    gs.run_to_table(agg, "t_stream_win", "complete")
    out = spark.table("t_stream_win")
    assert set(out.columns) == {"win_start", "event_type", "n", "min_value", "max_value"}
    total = out.agg(F.sum("n")).first()[0]
    assert total == spark.read.parquet(event_files).count() > 0


def test_stream_stream_pairs_match_batch_across_microbatches(
    spark, ordered_event_files
):
    """Stream-stream interval self-join drained over multi-file triggers
    equals the batch interval join on the same data. Files arrive in
    time order (the same contract real ingestion provides): with the
    watermark (2h) wider than the join interval (30min), no in-interval
    pair is ever evicted — randomly-ordered arrival WOULD legitimately
    drop pairs older than the watermark."""
    event_files = ordered_event_files

    raw = gs.event_stream(spark, event_files, maxFilesPerTrigger="1")
    j = gs.stream_event_pairs(raw)
    gs.run_to_table(j, "t_stream_pairs", "append")
    got = {
        (r.user_id, r.a_id, r.b_id)
        for r in spark.table("t_stream_pairs").collect()
    }

    ev = spark.read.parquet(event_files).withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    a = ev.select("user_id", F.col("event_id").alias("a_id"), F.col("ts").alias("a_ts"))
    b = ev.select(
        F.col("user_id").alias("user_id_b"),
        F.col("event_id").alias("b_id"),
        F.col("ts").alias("b_ts"),
    )
    want = {
        (r.user_id, r.a_id, r.b_id)
        for r in a.join(
            b,
            (F.col("user_id") == F.col("user_id_b"))
            & (F.col("b_ts") > F.col("a_ts"))
            & (F.col("b_ts") <= F.col("a_ts") + F.expr("INTERVAL 30 MINUTES")),
        )
        .select("user_id", "a_id", "b_id")
        .collect()
    }
    assert got == want and len(want) > 0


def test_kill_and_restart_same_checkpoint_is_exactly_once(
    spark, tmp_path_factory
):
    """Failure injection: the streaming dedup chain (duplicate-delivery
    union -> dropDuplicates) writes to a parquet sink, is stopped
    mid-drain, and restarts against the SAME checkpoint. The file sink's
    commit log plus replayed dropDuplicates state must yield exactly one
    output row per event — no losses from the kill, no duplicates from
    the replay."""
    base = tmp_path_factory.mktemp("failinject")
    src_dir, out_dir, ckpt = (
        str(base / "src"), str(base / "out"), str(base / "ckpt")
    )
    ev = _events_normalized(spark).limit(2000)
    # Many small files => many microbatches, so the kill lands mid-drain.
    ev.repartition(16).write.parquet(src_dir)
    expected = ev.select("event_id").distinct().count()

    def dedup_stream():
        a = gs.event_stream(spark, src_dir, maxFilesPerTrigger="1")
        b = gs.event_stream(spark, src_dir, maxFilesPerTrigger="1")
        return (
            a.unionByName(b)
            .withWatermark("ts", "2 hours")
            .dropDuplicates(["event_id"])
            .select("event_id", "event_type")
        )

    def start(trigger_kwargs):
        return (
            dedup_stream()
            .writeStream.format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(**trigger_kwargs)
            .start()
        )

    import time

    before = spark.conf.get("spark.sql.shuffle.partitions", None)
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    try:
        q = start({"processingTime": "0 seconds"})
        # Kill as soon as at least one microbatch committed (and, with 32
        # input files over two sources, well before the drain finishes).
        deadline = time.time() + 120
        while time.time() < deadline:
            if any(p["numInputRows"] > 0 for p in q.recentProgress):
                break
            time.sleep(0.2)
        killed_after = len(q.recentProgress)
        q.stop()
        q.awaitTermination()
        assert killed_after >= 1, "never saw a committed batch before kill"

        q2 = start({"availableNow": True})
        q2.awaitTermination()
    finally:
        if before is None:
            spark.conf.unset("spark.sql.shuffle.partitions")
        else:
            spark.conf.set("spark.sql.shuffle.partitions", before)

    got = spark.read.parquet(out_dir)
    n_rows = got.count()
    n_distinct = got.select("event_id").distinct().count()
    assert n_rows == n_distinct == expected


def test_stream_asof_matches_batch_asof(spark):
    """The streaming validity-interval enrichment must return exactly
    the batch backward as-of join on the same inputs (stream == batch
    contract, left rows without a prior right row included as NULL)."""
    from pyspark.sql import functions as F

    from ds_jedai_spark.io.synthetic import register_views
    from ds_jedai_spark.operators.temporal import asof_join
    from ds_jedai_spark.plans.streaming_plans import stream_asof

    sf = "/root/testdata/sf0.001"
    got = {
        (r.user_id, r.click_id): r.purchase_id
        for r in stream_asof(spark, sf).collect()
    }
    register_views(spark, sf)
    ev = spark.table("events")
    clicks = ev.where(F.col("event_type") == "click").select(
        "user_id", "ts", F.col("event_id").alias("click_id")
    )
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "user_id", "ts", F.col("event_id").alias("purchase_id")
    )
    want = {
        (r.user_id, r.click_id): r.asof_purchase_id
        for r in asof_join(
            clicks, purchases, key="user_id", ts="ts",
            right_attrs=("purchase_id",),
        ).collect()
    }
    assert len(got) > 0 and got == want


def test_stream_ann_topk_matches_batch_ivf(spark):
    """Streaming IVF search row-identical to the batch search over the
    same pinned index — cell-assignment literal, stream-static join and
    complete-mode top-k assembly reproduce (cos DESC, vid) exactly."""
    from ds_jedai_spark.operators.similarity import ivf_trained_topk
    from ds_jedai_spark.plans import pipeline_plans as pl
    from ds_jedai_spark.plans import streaming_plans as sp
    from tests.conftest import SF_SMALL

    got = sorted(
        map(tuple, sp.stream_ann_topk(spark, SF_SMALL).collect())
    )
    art = pl._pinned_ann(spark, SF_SMALL)
    want = sorted(
        map(tuple, ivf_trained_topk(
            pl._emb(spark, SF_SMALL), cent=art["cent"], cells=art["cells"]
        ).collect())
    )
    assert got == want and len(got) > 0


def test_stream_incremental_dedup_invariant_to_batching(spark, tmp_path):
    """foreachBatch incremental dedup appends the SAME pair set no
    matter how the stream splits into micro-batches: per-batch results
    couple batch docs with the static index only."""
    from ds_jedai_spark.io.bucketed import drop_table_and_location
    from ds_jedai_spark.operators import dedup
    from ds_jedai_spark.plans import pipeline_plans as pl

    corpus = pl._corpus(spark, "/root/testdata/sf0.001")
    even = corpus.where(F.col("doc_id") % 2 == 0)
    odd = corpus.where(F.col("doc_id") % 2 == 1)
    index_sh = dedup.pin_shingles(odd)

    want = sorted(
        map(tuple, dedup.minhash_lsh_pairs_cross(
            even, None, tau=pl.TAU_JACCARD, sh_b=index_sh
        ).collect())
    )
    assert want, "expected cross pairs at sf0.001"

    # split the batch side into several files, stream one file per
    # micro-batch
    docs_dir = str(tmp_path / "docs_stream")
    even.repartition(4).write.mode("overwrite").parquet(docs_dir)
    stream = gs.event_stream(
        spark, docs_dir, maxFilesPerTrigger="1"
    ).select("doc_id", "text")
    drop_table_and_location(spark, "t_stream_dedup_inv")
    gs.stream_incremental_dedup(
        stream, index_sh, pl.TAU_JACCARD, "t_stream_dedup_inv"
    )
    got = sorted(map(tuple, spark.table("t_stream_dedup_inv").collect()))
    assert got == want
    spark.sql("DROP TABLE IF EXISTS t_stream_dedup_inv")


def test_stream_embedding_dedup_matches_batch_cross(spark):
    """Streaming embedding ingest == the batch cross query (same pinned
    band table, same even/odd split)."""
    from ds_jedai_spark.plans import pipeline_plans as pl
    from ds_jedai_spark.plans import streaming_plans as sp

    got = sorted(
        map(tuple, sp.stream_embedding_cross(
            spark, "/root/testdata/sf0.001"
        ).collect())
    )
    want = sorted(
        map(tuple, pl.dedup_embedding_cross(
            spark, "/root/testdata/sf0.001"
        ).collect())
    )
    assert got == want and len(got) > 0
    spark.sql("DROP TABLE IF EXISTS stream_emb_cross_tbl")


def test_idempotent_batch_sink_converges_under_retry(spark):
    """The exactly-once sink: replaying a batch id overwrites exactly
    its own partition (no duplicates), other batches' partitions stay;
    the default append sink duplicates on replay — the at-least-once
    behavior the docstrings state."""
    from ds_jedai_spark.io.bucketed import drop_table_and_location
    from ds_jedai_spark.streaming.geostream import _batch_sink

    pairs0 = spark.createDataFrame(
        [(1, 10, 0.9), (2, 20, 0.8)], "d1 long, d2 long, jaccard double"
    )
    pairs1 = spark.createDataFrame(
        [(3, 30, 0.7)], "d1 long, d2 long, jaccard double"
    )
    drop_table_and_location(spark, "t_idem_sink")
    _batch_sink(pairs0, 0, "t_idem_sink", idempotent=True)
    _batch_sink(pairs1, 1, "t_idem_sink", idempotent=True)
    _batch_sink(pairs0, 0, "t_idem_sink", idempotent=True)  # retry of 0
    got = spark.table("t_idem_sink")
    assert got.count() == 3
    assert sorted(
        (r["d1"], r["_batch_id"]) for r in got.collect()
    ) == [(1, 0), (2, 0), (3, 1)]

    drop_table_and_location(spark, "t_app_sink")
    _batch_sink(pairs0, 0, "t_app_sink", idempotent=False)
    _batch_sink(pairs0, 0, "t_app_sink", idempotent=False)  # retry dupes
    assert spark.table("t_app_sink").count() == 4


def test_stream_incremental_dedup_idempotent_mode_matches_append(
    spark, tmp_path
):
    """The idempotent ingest loop produces the same PAIRS as the append
    loop (only the _batch_id lineage column is extra)."""
    from pyspark.sql import functions as F

    from ds_jedai_spark.io.bucketed import drop_table_and_location
    from ds_jedai_spark.operators import dedup
    from ds_jedai_spark.plans.pipeline_plans import TAU_JACCARD, _corpus
    from ds_jedai_spark.streaming import geostream as gs
    from tests.conftest import SF_SMALL

    corpus = _corpus(spark, SF_SMALL)
    docs_dir = str(tmp_path / "docs_idem")
    corpus.where(F.col("doc_id") % 2 == 0).repartition(4).write.mode(
        "overwrite"
    ).parquet(docs_dir)
    index_sh = dedup.pin_shingles(corpus.where(F.col("doc_id") % 2 == 1))

    for table, idem in (("t_ing_app", False), ("t_ing_idem", True)):
        drop_table_and_location(spark, table)
        stream = gs.event_stream(spark, docs_dir, maxFilesPerTrigger="1")
        gs.stream_incremental_dedup(
            stream, index_sh, TAU_JACCARD, table, idempotent=idem
        )
    app = spark.table("t_ing_app").select("d1", "d2", "jaccard")
    idem = spark.table("t_ing_idem").select("d1", "d2", "jaccard")
    assert "_batch_id" in spark.table("t_ing_idem").columns
    assert sorted(map(tuple, app.collect())) == sorted(
        map(tuple, idem.collect())
    )
    assert app.count() > 0


def test_stream_validate_matches_batch_expectations(spark):
    """The streaming expectations monitor (complete-mode global agg)
    converges to the exact batch validate_wide row once the documents
    source drains."""
    from ds_jedai_spark.io.synthetic import register_views
    from ds_jedai_spark.operators.validate import validate_wide
    from ds_jedai_spark.plans.pipeline_plans import DQ_RULES
    from ds_jedai_spark.plans.streaming_plans import stream_quality_row
    from tests.conftest import SF_SMALL

    got = stream_quality_row(spark, SF_SMALL).first().asDict()
    register_views(spark, SF_SMALL)
    want = validate_wide(spark.table("documents"), DQ_RULES).first().asDict()
    assert got == want
    assert got["total"] > 0
    assert got["lang_domain"] > 0  # es/zh rows exist on purpose
