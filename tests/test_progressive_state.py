"""Golden tests for the stateful progressive scans (the reference's
WeightedPairTest pattern: exact dequeue order, including dynamic-update
reordering — src/test/scala/WeightedPairTest.scala:58-80)."""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from conftest import SF_SMALL

from ds_jedai_spark.operators.progressive_state import dynamic_progressive, early_stopping


def _cand_df(spark, rows):
    return spark.createDataFrame(rows, "s_id long, t_id long, wv double, q boolean")


def test_dynamic_boost_reorders(spark):
    # (s1,t1) qualifies first and boosts (s1,t2): 2.0 -> 4.0, overtaking
    # (s2,t3) at 2.5. Expected verification order: (1,1), (1,2), (2,3).
    rows = [(1, 1, 3.0, True), (1, 2, 2.0, False), (2, 3, 2.5, False)]
    out = dynamic_progressive(
        _cand_df(spark, rows), "wv", "q", budget=10, num_parts=1
    ).orderBy("verified_rank")
    got = [(r.s_id, r.t_id, r.w) for r in out.collect()]
    assert got == [(1, 1, 3.0), (1, 2, 4.0), (2, 3, 2.5)]


def test_dynamic_budget_caps_output(spark):
    rows = [(i, i, float(i), False) for i in range(1, 21)]
    out = dynamic_progressive(_cand_df(spark, rows), "wv", "q", budget=5, num_parts=1)
    assert out.count() == 5


def test_early_stopping_stops_after_violations(spark):
    # batch_size=2: first batch 2 matches; then all-zero batches violate
    # precision 0.5*2=1; stop after 1 violating batch -> 4 rows out.
    rows = [
        (1, 1, 10.0, True),
        (1, 2, 9.0, True),
        (2, 1, 8.0, False),
        (2, 2, 7.0, False),
        (3, 1, 6.0, False),
        (3, 2, 5.0, False),
    ]
    out = early_stopping(
        _cand_df(spark, rows),
        "wv",
        "q",
        batch_size=2,
        max_violations=1,
        precision_level=0.5,
        num_parts=1,
    )
    assert out.count() == 4


def test_stateful_plans_run_on_testdata(spark):
    from ds_jedai_spark.plans.progressive_plans import (
        dynamic_progressive_js,
        early_stopping_js,
    )

    assert dynamic_progressive_js(spark, SF_SMALL).count() > 0
    assert early_stopping_js(spark, SF_SMALL).count() > 0


def _geom_cand(spark):
    """Candidates with real geometry columns: lazy in-scan verification
    must agree with precomputing the relation flags first."""
    import itertools

    boxes_s = [(i, 2.0 * (i % 5), 2.0 * (i // 5)) for i in range(1, 13)]
    boxes_t = [(100 + i, 0.5 * i, 0.25 * i) for i in range(1, 13)]
    rows = []
    for (si, sx, sy), (ti, tx, ty) in itertools.product(boxes_s, boxes_t):
        s_ring = [[sx, sy], [sx + 3, sy], [sx + 3, sy + 3], [sx, sy + 3], [sx, sy]]
        t_ring = [[tx, ty], [tx + 2, ty], [tx + 2, ty + 2], [tx, ty + 2], [tx, ty]]
        rows.append(
            (si, ti, float(si % 7 + 1), "POLYGON", [s_ring], "POLYGON", [t_ring])
        )
    return spark.createDataFrame(
        rows,
        "s_id long, t_id long, wv double, s_gtype string, "
        "s_coords array<array<array<double>>>, t_gtype string, "
        "t_coords array<array<array<double>>>",
    )


def test_dynamic_lazy_verify_equals_precomputed(spark):
    from ds_jedai_spark.operators.relate_general import with_general_relations

    cand = _geom_cand(spark)
    lazy = dynamic_progressive(
        cand, "wv", None, budget=40, num_parts=4, relation="intersects"
    )
    pre = dynamic_progressive(
        with_general_relations(cand), "wv", "r_intersects", budget=40, num_parts=4
    )
    key = ["s_id", "t_id", "w", "verified_rank"]
    assert sorted(map(tuple, lazy.select(key).collect())) == sorted(
        map(tuple, pre.select(key).collect())
    )


def test_early_stopping_lazy_verify_equals_precomputed(spark):
    from ds_jedai_spark.operators.relate_general import with_general_relations

    cand = _geom_cand(spark)
    lazy = early_stopping(
        cand, "wv", None, batch_size=10, num_parts=2, relation="overlaps"
    )
    pre = early_stopping(
        with_general_relations(cand), "wv", "r_overlaps", batch_size=10, num_parts=2
    )
    key = ["s_id", "t_id", "w", "verified_rank"]
    assert sorted(map(tuple, lazy.select(key).collect())) == sorted(
        map(tuple, pre.select(key).collect())
    )
