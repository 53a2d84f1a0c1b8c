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
