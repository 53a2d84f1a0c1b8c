"""DBSCAN scale probe: wall-clock + structure at 15k -> 150k -> 600k
points on local[32], keeping DENSITY constant (the domain grows with
sqrt(n)), which is the realistic scale-up: more area, same sensor
density. Constant density keeps the eps-graph's average degree flat, so
edges grow LINEARLY with n and the label-propagation round count grows
with the largest cluster's eps-graph DIAMETER — the quantity the
operator docstring calls out as DBSCAN's real 100 TB bound.

Run: python scripts/dbscan_scale_probe.py [eps] [minpts]
Prints one line per size; record results in PLANS.md, not here.
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from ds_jedai_spark.session import get_spark  # noqa: E402


def synth_points(spark, n: int, side: float):
    """n pseudo-random lattice points over [0, side)^2 — the testdata
    generators' multiplicative-hash style, no files involved."""
    cells = int(side * 16)
    return spark.range(n).select(
        F.col("id"),
        (F.expr(f"CAST((id * 2654435761) % {cells} AS DOUBLE) / 16.0")
         ).alias("minx"),
        (F.expr(f"CAST((id * 3267000013) % {cells} AS DOUBLE) / 16.0")
         ).alias("miny"),
    ).selectExpr("id", "minx", "miny", "minx AS maxx", "miny AS maxy")


def main() -> None:
    eps = float(sys.argv[1]) if len(sys.argv) > 1 else 1.0
    minpts = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    spark = get_spark("dbscan_scale_probe")
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    from ds_jedai_spark.operators.clustering import dbscan
    from ds_jedai_spark.operators.spatial_join import distance_join

    base_n, base_side = 15_000, 97.5625
    for mult in (1, 10, 40):
        n = base_n * mult
        side = base_side * (mult ** 0.5)
        pts = synth_points(spark, n, side).localCheckpoint()
        t0 = time.perf_counter()
        edges = distance_join(pts, pts, eps).count()
        t_graph = time.perf_counter() - t0
        t0 = time.perf_counter()
        out = dbscan(pts, eps=eps, min_pts=minpts, max_iter=400)
        labeled = out.where(F.col("cluster") >= 0).count()
        t_total = time.perf_counter() - t0
        nclust = (out.where(F.col("cluster") >= 0)
                  .select("cluster").distinct().count())
        print(
            f"n={n} side={side:.1f} eps={eps} minpts={minpts} "
            f"edges={edges} graph_s={t_graph:.1f} "
            f"clusters={nclust} labeled={labeled} "
            f"dbscan_s={t_total:.1f}",
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
