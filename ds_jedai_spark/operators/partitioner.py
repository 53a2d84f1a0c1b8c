"""Sampled spatial partitioner: quantile grid + duplication + ref-point dedup.

Re-expresses the reference's GridPartitioner (reference:
src/main/scala/utils/readers/GridPartitioner.scala:16-93): the reference
samples the source through Sedona and builds a QUADTREE/KDBTREE; here the
equivalent sampled structure is a KDB-style non-uniform grid whose x/y
cuts are approxQuantiles of source envelope centers, so each slice holds
~equal source mass. Outermost borders extend to +/-infinity
(GridPartitioner.scala:36-63).

Duplication (GridPartitioner.scala:73-80) is a broadcast join of each
envelope against the tiny cell table (every overlapping cell); global
exactly-once pairs come from the reference-point rule (LinkerT.scala:30-41)
evaluated against the CELL borders: a pair is kept only in the unique cell
containing the bottom-left corner of the envelope intersection.

Scale notes: the cell table is O(partitions) rows — always broadcast; the
only shuffle is the pid equi-join, whose keys are balanced by construction
(quantile cuts equalize source mass per slice). This is the coarse
partitioning layer; within a cell the tile-grid join or a plain loop does
refinement. At 1000 executors, raise nx*ny to ~4x the core count.
"""

from __future__ import annotations

import itertools

from pyspark.sql import DataFrame, SparkSession, functions as F

INF = float("inf")


def quantile_cuts(source: DataFrame, nx: int, ny: int) -> tuple[list, list]:
    """Interior x/y cuts at envelope-center quantiles (sampled, like the
    reference's Sedona ``analyze()`` + partitioner build)."""
    centers = source.select(
        ((F.col("minx") + F.col("maxx")) / 2).alias("cx"),
        ((F.col("miny") + F.col("maxy")) / 2).alias("cy"),
    )
    qx = [i / nx for i in range(1, nx)]
    qy = [i / ny for i in range(1, ny)]
    xs, ys = centers.stat.approxQuantile(["cx", "cy"], sorted(set(qx + qy)), 0.001)
    probs = sorted(set(qx + qy))
    xcuts = [v for p, v in zip(probs, xs) if p in set(qx)]
    ycuts = [v for p, v in zip(probs, ys) if p in set(qy)]
    # Dedup in case of repeated quantile values on tiny inputs.
    return sorted(set(xcuts)), sorted(set(ycuts))


def cell_table(
    spark: SparkSession, xcuts: list, ycuts: list
) -> DataFrame:
    """One row per grid cell with half-open borders; outer cells infinite."""
    xb = [-INF] + list(xcuts) + [INF]
    yb = [-INF] + list(ycuts) + [INF]
    rows = [
        (i * (len(yb) - 1) + j, xb[i], xb[i + 1], yb[j], yb[j + 1])
        for i, j in itertools.product(range(len(xb) - 1), range(len(yb) - 1))
    ]
    return spark.createDataFrame(
        rows, ["pid", "cell_minx", "cell_maxx", "cell_miny", "cell_maxy"]
    )


def _distribute(
    df: DataFrame, cells: DataFrame, p: str, extra: tuple[str, ...] = ()
) -> DataFrame:
    """Duplicate each row into every overlapping cell (broadcast join)."""
    overlap = (
        (F.col("minx") <= F.col("cell_maxx"))
        & (F.col("maxx") >= F.col("cell_minx"))
        & (F.col("miny") <= F.col("cell_maxy"))
        & (F.col("maxy") >= F.col("cell_miny"))
    )
    cols = [
        F.col(c).alias(f"{p}{c}")
        for c in ("id", "minx", "miny", "maxx", "maxy") + extra
    ]
    joined = df.join(F.broadcast(cells), overlap)
    if p == "s_":
        return joined.select("pid", *cols)
    return joined.select(
        "pid", "cell_minx", "cell_maxx", "cell_miny", "cell_maxy", *cols
    )


def partitioned_join(
    source: DataFrame,
    target: DataFrame,
    nx: int = 8,
    ny: int = 8,
    source_extra: tuple[str, ...] = (),
    target_extra: tuple[str, ...] = (),
) -> DataFrame:
    """Envelope-intersecting pairs via the sampled spatial partitioner —
    each pair exactly once (same output contract as tile_join)."""
    spark = source.sparkSession
    xcuts, ycuts = quantile_cuts(source, nx, ny)
    cells = cell_table(spark, xcuts, ycuts)

    s = _distribute(source, cells, "s_", source_extra)
    t = _distribute(target, cells, "t_", target_extra)

    envelope_overlap = (
        (F.col("s_minx") <= F.col("t_maxx"))
        & (F.col("t_minx") <= F.col("s_maxx"))
        & (F.col("s_miny") <= F.col("t_maxy"))
        & (F.col("t_miny") <= F.col("s_maxy"))
    )
    rx = F.greatest("s_minx", "t_minx")
    ry = F.greatest("s_miny", "t_miny")
    ref_in_cell = (
        (rx >= F.col("cell_minx"))
        & (rx < F.col("cell_maxx"))
        & (ry >= F.col("cell_miny"))
        & (ry < F.col("cell_maxy"))
    )
    return (
        s.join(t, on="pid", how="inner")
        .where(envelope_overlap & ref_in_cell)
        .drop("pid", "cell_minx", "cell_maxx", "cell_miny", "cell_maxy")
    )
