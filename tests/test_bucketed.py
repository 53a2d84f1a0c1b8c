"""Bucketed tile layout: join from co-bucketed tables is shuffle-free and
produces the identical pair set as the online tile join."""

import pytest
from pyspark.sql import functions as F

from ds_jedai_spark.io.bucketed import bucketed_tile_join, persist_tiled
from ds_jedai_spark.io.synthetic import load_sql, source_box_sql, target_box_sql
from ds_jedai_spark.operators.spatial_join import tile_join

SF = "/root/testdata/sf0.001"
THETA = (1.0, 1.0)


@pytest.fixture(scope="module")
def tables(spark):
    src = load_sql(spark, SF, source_box_sql())
    tgt = load_sql(spark, SF, target_box_sql())
    persist_tiled(src, "bt_src", THETA, buckets=8)
    persist_tiled(tgt, "bt_tgt", THETA, buckets=8)
    yield "bt_src", "bt_tgt"
    spark.sql("DROP TABLE IF EXISTS bt_src")
    spark.sql("DROP TABLE IF EXISTS bt_tgt")


def test_bucketed_join_matches_online_tile_join(spark, tables):
    got = {
        (r.s_id, r.t_id)
        for r in bucketed_tile_join(spark, *tables, THETA)
        .select("s_id", "t_id")
        .collect()
    }
    src = load_sql(spark, SF, source_box_sql())
    tgt = load_sql(spark, SF, target_box_sql())
    want = {
        (r.s_id, r.t_id)
        for r in tile_join(src, tgt, theta=THETA).select("s_id", "t_id").collect()
    }
    assert got == want and len(want) > 0


def test_bucketed_join_plan_has_no_exchange(spark, tables):
    # Force the non-broadcast path to prove bucketing removes the shuffle.
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760b")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = bucketed_tile_join(spark, *tables, THETA)
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange hashpartitioning" not in plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
