"""Quantile-grid partitioner equivalence: same pairs as brute force,
each exactly once (the reference's IntersectionMatrixTest pattern —
optimized path == naive path)."""

import pytest
from pyspark.sql import functions as F

from ds_jedai_spark.io.synthetic import load_sql, source_box_sql, target_box_sql
from ds_jedai_spark.operators.partitioner import (
    cell_table,
    partitioned_join,
    quantile_cuts,
)
from ds_jedai_spark.operators.spatial_join import brute_force_join

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def datasets(spark):
    return (
        load_sql(spark, SF, source_box_sql()),
        load_sql(spark, SF, target_box_sql()),
    )


def pair_counts(df):
    return {
        (r.s_id, r.t_id): r["cnt"]
        for r in df.groupBy("s_id", "t_id").agg(F.count(F.lit(1)).alias("cnt")).collect()
    }


def test_partitioned_equals_brute_force_exactly_once(datasets):
    source, target = datasets
    got = pair_counts(partitioned_join(source, target, nx=4, ny=4))
    want = pair_counts(brute_force_join(source, target))
    assert got == want  # same pair set AND multiplicity 1 everywhere
    assert all(c == 1 for c in want.values())


def test_cell_table_covers_plane(spark, datasets):
    source, _ = datasets
    xcuts, ycuts = quantile_cuts(source, 4, 4)
    cells = cell_table(spark, xcuts, ycuts).collect()
    assert len(cells) == (len(xcuts) + 1) * (len(ycuts) + 1)
    assert min(c.cell_minx for c in cells) == float("-inf")
    assert max(c.cell_maxx for c in cells) == float("inf")


def test_distance_join_equals_brute_force(spark):
    """distance_join (expanded-MBR tiles + exact filter) == brute-force
    distance predicate on a deterministic lattice point set."""
    import itertools

    from pyspark.sql import functions as F

    from ds_jedai_spark.operators.spatial_join import distance_join

    pts = [
        (i, ((i * 37) % 41) / 2.0, ((i * 53) % 41) / 2.0) for i in range(120)
    ]
    df = spark.createDataFrame(
        [(i, x, y, x, y) for i, x, y in pts],
        "id long, minx double, miny double, maxx double, maxy double",
    )
    r = 2.5
    got = {
        (row.s_id, row.t_id)
        for row in distance_join(df, df, radius=r, theta=(1.0, 1.0)).collect()
    }
    want = {
        (a[0], b[0])
        for a, b in itertools.product(pts, pts)
        if (a[1] - b[1]) ** 2 + (a[2] - b[2]) ** 2 <= r * r
    }
    assert got == want
