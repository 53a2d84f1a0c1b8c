"""Tile join vs the Sedona-SQL-equivalent baseline plan.

BASELINE.md defines the measured baseline as the reference's own
comparison system: a Spark SQL theta join `SELECT ... FROM s, t WHERE
<predicate>` (experiments/SedonaExp.scala:92-102), which Spark plans as a
broadcast-nested-loop / cartesian filter without a spatial index. This
script times both paths on the same data and prints one JSON line —
the engine's claim is tile join >= baseline parity.

Usage: python scripts/bench_baseline.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    from ds_jedai_spark.io.synthetic import load_sql, source_box_sql, target_box_sql
    from ds_jedai_spark.operators.spatial_join import brute_force_join, tile_join
    from ds_jedai_spark.session import get_spark

    spark = get_spark("bench_baseline")
    spark.range(1_000_000).selectExpr("sum(id)").collect()  # warmup

    source = load_sql(spark, sf_dir, source_box_sql())
    target = load_sql(spark, sf_dir, target_box_sql())

    t0 = time.perf_counter()
    n_tile = tile_join(source, target).count()
    tile_s = round(time.perf_counter() - t0, 3)

    t0 = time.perf_counter()
    n_base = brute_force_join(source, target).count()
    base_s = round(time.perf_counter() - t0, 3)

    assert n_tile == n_base, f"result mismatch: {n_tile} != {n_base}"
    print(
        json.dumps(
            {
                "metric": "tile_join_vs_theta_baseline",
                "pairs": n_tile,
                "tile_join_sec": tile_s,
                "baseline_sec": base_s,
                "speedup": round(base_s / tile_s, 2) if tile_s else None,
                "sf_dir": sf_dir,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
