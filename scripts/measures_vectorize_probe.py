"""Areal-measures vectorization probe (r17): wall-clock of
with_measures over ~2M synthetic polygons, vectorized Arrow-buffer pass
vs the legacy exact per-row path (vectorize=False), plus a result
differential on a 50k sample.

The polygons are single-ring 12-gons (building-footprint-scale vertex
counts — the overwhelmingly common case at pipeline scale) with a
1-in-50 salting of two-ring holed boxes so the per-row fallback branch
stays exercised inside the vectorized run.

Run: python scripts/measures_vectorize_probe.py [n]
Prints one JSON line; record results in PLANS.md, not here.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from ds_jedai_spark.operators.measures import with_measures  # noqa: E402
from ds_jedai_spark.session import get_spark  # noqa: E402


def synth_polys(spark, n: int):
    """n single-ring lattice triangles, every 50th a two-ring holed box
    (multi-ring rows exercise the vectorized pass's per-row branch)."""
    base = spark.range(n).selectExpr(
        "id",
        "CAST((id * 2654435761) % 102400 AS DOUBLE) / 16.0 AS x",
        "CAST((id * 3267000013) % 102400 AS DOUBLE) / 16.0 AS y",
        "1.0 + CAST(id % 64 AS DOUBLE) / 16.0 AS w",
        "1.0 + CAST((id * 7) % 64 AS DOUBLE) / 16.0 AS h",
    )
    # closed 12-gon around (x, y): 13 points, radius w
    ring = (
        "transform(sequence(0, 12), i -> array("
        "x + w * cos(2.0 * pi() * (i % 12) / 12.0), "
        "y + w * sin(2.0 * pi() * (i % 12) / 12.0)))"
    )
    tri = base.where("id % 50 != 0").selectExpr(
        "id", "'POLYGON' AS gtype",
        f"array({ring}) AS coords",
        "x - w AS minx", "y - w AS miny", "x + w AS maxx", "y + w AS maxy",
    )
    holed = base.where("id % 50 = 0").selectExpr(
        "id", "'POLYGON' AS gtype",
        "array("
        "array(array(x, y), array(x + w, y), array(x + w, y + h),"
        " array(x, y + h), array(x, y)), "
        "array(array(x + w / 4.0, y + h / 4.0),"
        " array(x + w / 2.0, y + h / 4.0),"
        " array(x + w / 2.0, y + h / 2.0),"
        " array(x + w / 4.0, y + h / 2.0),"
        " array(x + w / 4.0, y + h / 4.0))"
        ") AS coords",
        "x AS minx", "y AS miny", "x + w AS maxx", "y + h AS maxy",
    )
    return tri.unionByName(holed)


def timed(df) -> tuple[float, object]:
    t0 = time.monotonic()
    row = df.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.round(F.col("area") * 4096)).cast("long").alias("a4096"),
        F.sum(F.round(F.col("centroid_x") * 1e6)).cast("long").alias("cx6"),
    ).collect()[0]
    return time.monotonic() - t0, row


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    spark = get_spark("measures-vectorize-probe")
    polys = synth_polys(spark, n).localCheckpoint()

    # warm both paths once (JVM/Arrow init), then measure
    timed(with_measures(polys.limit(10000)))
    timed(with_measures(polys.limit(10000), vectorize=False))

    t_fast, r_fast = timed(with_measures(polys))
    t_slow, r_slow = timed(with_measures(polys, vectorize=False))
    assert (r_fast.n, r_fast.a4096, r_fast.cx6) == \
        (r_slow.n, r_slow.a4096, r_slow.cx6), (r_fast, r_slow)

    print(json.dumps({
        "probe": "measures_vectorize", "n": n,
        "vectorized_sec": round(t_fast, 2),
        "per_row_sec": round(t_slow, 2),
        "speedup": round(t_slow / t_fast, 2),
        "agg_equal": True,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
