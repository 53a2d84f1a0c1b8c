"""iterative.fresh_stats_checkpoint: the Catalyst-stats reset that keeps
iterative self-join loops flat-cost (see iterative.py's docstring for
the measured exponential stall it prevents)."""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from ds_jedai_spark.iterative import fresh_stats_checkpoint


def _digits(df) -> int:
    return len(str(
        df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()))


def test_fresh_stats_checkpoint_resets_and_preserves_rows(spark):
    df = spark.range(100).selectExpr("id", "CAST(id % 7 AS DOUBLE) AS v")
    big = df.crossJoin(df.selectExpr("id AS i2")).where("id >= i2")
    pinned = fresh_stats_checkpoint(big)
    # rows and schema survive
    assert pinned.count() == big.count()
    assert pinned.schema == big.schema
    assert sorted(r.id for r in pinned.collect()) == sorted(
        r.id for r in big.collect())
    # stats are the session default, not the join-product estimate
    assert _digits(pinned) == len(str(2**63 - 1))


def test_iterated_self_join_stats_stay_flat(spark):
    """The failure mode: localCheckpoint inherits the origin estimate
    and a self-joining loop SQUARES it per round (digits double —
    measured 26 -> 2439 in six rounds on the CC loop). With the fresh
    pin, digits stay constant for any number of rounds."""
    labels = fresh_stats_checkpoint(
        spark.range(50).select(F.col("id").alias("node"),
                               F.col("id").alias("label")))
    naive = labels
    base_digits = None
    naive_digits = []
    for _ in range(4):
        def round_of(cur):
            hop = cur.select(F.col("node").alias("label"),
                             F.col("label").alias("ll"))
            return (cur.join(hop, on="label", how="left")
                    .select("node",
                            F.least(F.col("label"),
                                    F.coalesce("ll", "label"))
                            .alias("label")))

        labels = fresh_stats_checkpoint(round_of(labels))
        naive = round_of(naive).localCheckpoint()
        if base_digits is None:
            base_digits = _digits(labels)
        assert _digits(labels) == base_digits
        naive_digits.append(_digits(naive))
    # the naive form really does compound (the property we guard against)
    assert naive_digits[-1] > naive_digits[0]
