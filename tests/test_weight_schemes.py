"""Weighting-scheme + local-budget operator unit tests (tiny in-memory data).

Mirrors the reference's WeightedPairTest golden-ordering style
(reference: src/test/scala/WeightedPairTest.scala:9-80).
"""

import pytest
from pyspark.sql import functions as F

from ds_jedai_spark.operators import progressive as prog


@pytest.fixture(scope="module")
def cand(spark):
    # (s_id, t_id, main weight a, secondary weight b)
    rows = [
        (1, 10, 2.0, 1.0),
        (1, 11, 2.0, 3.0),  # ties on a, wins on b
        (2, 10, 5.0, 0.1),
        (2, 11, 1.0, 9.0),
        (3, 12, 2.0, 2.0),
    ]
    return spark.createDataFrame(rows, ["s_id", "t_id", "a", "b"])


def test_composite_breaks_ties_with_secondary(cand):
    got = prog.composite_top_budget(cand, "a", "b", 3).collect()
    assert [(r.s_id, r.t_id) for r in got] == [(2, 10), (1, 11), (3, 12)]


def test_hybrid_orders_by_product(cand):
    got = prog.hybrid_top_budget(cand, "a", "b", 2).collect()
    # products: 2, 6, 0.5, 9, 4 -> top-2 = (2,11), (1,11)
    assert [(r.s_id, r.t_id) for r in got] == [(2, 11), (1, 11)]


def test_thin_multi_lexicographic(cand):
    got = prog.thin_multi_top_budget(cand, "a", "b", "CAST(t_id AS DOUBLE)", 5)
    ids = [(r.s_id, r.t_id) for r in got.collect()]
    # a DESC, then b DESC, then t_id DESC
    assert ids == [(2, 10), (1, 11), (3, 12), (1, 10), (2, 11)]


def test_local_budget_proportional_split(spark):
    # Partition A has 3 source entities, B has 1 -> budget 4 splits ceil(3)=3 / ceil(1)=1.
    source = spark.createDataFrame(
        [(1, 0.0), (2, 1.0), (3, 2.0), (4, 50.0)], ["id", "minx"]
    ).withColumn("miny", F.lit(0.0))
    cand = spark.createDataFrame(
        [(s, t, float(s * 10 + t), 0.0 if s < 4 else 50.0)
         for s in (1, 2, 3, 4) for t in (1, 2)],
        ["s_id", "t_id", "wv", "s_minx"],
    ).withColumn("s_miny", F.lit(0.0))
    pid = "CAST(floor({p}minx / 8.0) AS BIGINT)"
    got = prog.local_budget_top(
        cand, source, "wv", 4, pid.format(p="s_"), pid.format(p="")
    ).collect()
    by_pair = {(r.s_id, r.t_id) for r in got}
    # Partition A (s 1-3): local budget ceil(4*3/4)=3 -> top-3 of its 6 pairs.
    # Partition B (s=4): ceil(4*1/4)=1 -> its single best pair.
    assert by_pair == {(3, 2), (3, 1), (2, 2), (4, 2)}
