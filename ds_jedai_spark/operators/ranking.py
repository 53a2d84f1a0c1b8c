"""Distributed total-order ranking — no single-task window anywhere.

A global ``row_number() OVER (ORDER BY ...)`` compiles to a
SinglePartition exchange: one task sees every row. This module implements
the equivalent rank as two parallel phases (the scheme proven for
vocabulary ids in textops.vocab and reused by the PGR metric):

1. ``repartitionByRange`` on the sort key — partition i sorts wholly
   before partition i+1 — then ``row_number`` within each partition
   (partition-local window, plan-shape tested).
2. Per-partition counts -> cumulative offsets computed driver-side from
   a <= numPartitions-row collect (the same per-partition count pass
   RDD.zipWithIndex makes) and broadcast-joined back onto the ranked
   rows. Driver work and transfer are O(numPartitions), never O(rows),
   and no unpartitioned WindowExec appears in any plan.

The ranked frame is pinned with an eager localCheckpoint: it feeds both
the offset aggregate and the final join, and repartitionByRange samples
its boundaries nondeterministically — unpinned recomputation could assign
different (part, rn) per consumer (see also the persist() cache-miss note
in dedup._pin).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def shuffle_parts(df: DataFrame) -> int:
    """spark.sql.shuffle.partitions, tolerating non-numeric settings such
    as 'auto' on managed platforms (falls back to defaultParallelism)."""
    spark = df.sparkSession
    try:
        return int(spark.conf.get("spark.sql.shuffle.partitions"))
    except ValueError:
        return spark.sparkContext.defaultParallelism


def ranked_local(df: DataFrame, asc_cols: list[str]) -> DataFrame:
    """Phase 1 (pre-checkpoint): range-partitioned, partition-local
    row_number as columns ``part`` and ``rank``."""
    return (
        df.repartitionByRange(shuffle_parts(df), *asc_cols)
        .withColumn("part", F.spark_partition_id())
        .withColumn(
            "rank",
            F.row_number()
            .over(Window.partitionBy("part").orderBy(*asc_cols))
            .cast("long"),
        )
    )


def global_rank(df: DataFrame, *, asc_cols: list[str]) -> DataFrame:
    """Append ``rank`` = row_number() OVER (ORDER BY asc_cols), computed
    distributedly. Requires the sort key to be unique per row (ties would
    otherwise rank nondeterministically across runs)."""
    local = ranked_local(df, asc_cols).localCheckpoint()
    counts = sorted(
        (r["part"], r["cnt"])
        for r in local.groupBy("part").agg(F.count(F.lit(1)).alias("cnt")).collect()
    )
    offs, acc = [], 0
    for part, cnt in counts:
        offs.append((part, acc))
        acc += cnt
    offsets = df.sparkSession.createDataFrame(
        offs or [(0, 0)], "part int, off long"
    )
    return (
        local.join(F.broadcast(offsets), "part")
        .withColumn("rank", F.col("off") + F.col("rank"))
        .drop("part", "off")
    )
