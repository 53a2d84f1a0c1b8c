"""Spatial aggregation: grid-cell density (the heatmap / choropleth
primitive every spatial SQL exposes as ST_SnapToGrid + GROUP BY).

The reference has no aggregation surface beyond its interlinking
counters (its GridPartitioner cells exist only to route joins,
utils/readers/GridPartitioner.scala); this is a beyond-parity operator
for the analytics side of the engine: one pure-JVM groupBy over the
row-format envelope columns — floor-snapped cell indices as the keys,
whole-stage codegen end to end, ONE shuffle (the aggregation's own,
with map-side partial aggregation), no Python anywhere. At 100 TB this
is the textbook Spark aggregation: linear scan, combiner-reduced
shuffle whose volume is the number of DISTINCT cells, not rows.

Anchoring: each entity lands in exactly ONE cell by its envelope
CENTER ((minx+maxx)/2, (miny+maxy)/2) — the standard choice for
density (a count, not a coverage: every entity counted once, no
double-counting of boundary spanners). Lattice inputs with
power-of-two cell sizes floor exactly and therefore compare exactly
across engines (the io/synthetic exactness contract).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def grid_density(df: DataFrame, cell: float = 1.0) -> DataFrame:
    """(cell_x, cell_y, n) — entity count per ``cell``-sized grid cell,
    keyed by the floor-snapped envelope center."""
    c = float(cell)
    if not c > 0:
        raise ValueError(f"grid_density: cell must be > 0, got {cell!r}")
    return (
        df.groupBy(
            F.floor(((F.col("minx") + F.col("maxx")) / 2.0) / c)
            .alias("cell_x"),
            F.floor(((F.col("miny") + F.col("maxy")) / 2.0) / c)
            .alias("cell_y"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
    )


def grid_density_sql(src_cte: str, cell: float) -> str:
    """The identical aggregation as oracle SQL over a source subquery
    exposing minx/miny/maxx/maxy — shared text, so the gate compares
    the engine, not formula transcription."""
    c = float(cell)
    return (
        f"SELECT CAST(floor(((minx + maxx) / 2.0) / {c!r}) AS BIGINT) "
        f"AS cell_x, "
        f"CAST(floor(((miny + maxy) / 2.0) / {c!r}) AS BIGINT) "
        f"AS cell_y, "
        f"count(*) AS n FROM ({src_cte}) GROUP BY 1, 2"
    )
