"""Physical-plan regression tests: the optimizations we rely on at scale
must actually appear in the plan — column pruning to the key columns,
broadcast hash join for the tile join at this size, no Python (BatchEval)
in the closed-form verification path."""

import pytest

from ds_jedai_spark.io.synthetic import load_sql, source_box_sql, target_box_sql
from ds_jedai_spark.operators.relate import with_relations
from ds_jedai_spark.operators.spatial_join import tile_join

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def cand(spark):
    source = load_sql(spark, SF, source_box_sql())
    target = load_sql(spark, SF, target_box_sql())
    return tile_join(source, target, theta=(1.0, 1.0))


def plan_of(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_scan_prunes_to_key_columns(cand):
    plan = plan_of(cand)
    # Only the integer keys are read from parquet — geometry is derived.
    assert "ReadSchema: struct<p_partkey:bigint>" in plan
    assert "ReadSchema: struct<o_orderkey:bigint>" in plan


def test_tile_join_is_broadcast_hash_join(cand):
    plan = plan_of(cand)
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan


def test_closed_form_verification_stays_jvm_side(cand):
    plan = plan_of(with_relations(cand))
    # No Python evaluation nodes: relations are pure column expressions.
    # (WholeStageCodegen spans only render after AQE finalizes the plan,
    # so the positive assertion is the absence of Python eval nodes.)
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan


def test_single_shuffle_free_tile_join(cand):
    # Broadcast path: no shuffle exchange at all in the candidate plan.
    assert "ShuffleExchange" not in plan_of(cand).replace(
        "AQEShuffleRead", ""
    ).replace("ShuffleQueryStage", "")
