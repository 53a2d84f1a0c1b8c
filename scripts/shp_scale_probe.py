"""Intra-file parallelism proof for the shapefile reader.

Builds ONE large .shp (default 8M point records, ~224 MB — the format
caps at 2 GB, so this is a representative single-file size), then reads
it back at three split granularities: whole-file (1 task — what a naive
non-splittable reader gets), the default 64 MB, and 8 MB. Same rows out
of every run (asserted); the wall-clock ratio is the payoff of the
.shx-planned byte-range splits. Prints one JSON line.

Run on a quiet box:  python scripts/shp_scale_probe.py [n_records]
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 8_000_000
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    from pyspark.sql import functions as F

    from ds_jedai_spark.io.shapefile import export_shapefile, read_shapefile
    from ds_jedai_spark.session import get_spark

    spark = get_spark("shp_scale_probe")
    d = tempfile.mkdtemp(prefix="shp_scale_")
    out = os.path.join(d, "big")
    pts = spark.range(n).select(
        F.col("id").cast("string").alias("id"),
        F.lit("POINT").alias("gtype"),
        F.array(F.array(F.array(
            (F.col("id") % 4096).cast("double") / 16.0,
            ((F.col("id") * 31) % 4096).cast("double") / 16.0,
        ))).alias("coords"),
    ).coalesce(1)
    t0 = time.perf_counter()
    export_shapefile(pts, out)
    w_write = time.perf_counter() - t0
    shp = next(str(p) for p in Path(out).glob("*.shp"))
    size = os.path.getsize(shp)

    walls = {}
    counts = {}
    for name, split in (("one_task", size + 100),
                        ("default_64mb", 64 << 20),
                        ("split_8mb", 8 << 20)):
        t0 = time.perf_counter()
        counts[name] = read_shapefile(
            spark, shp, id_field=None, split_bytes=split
        ).count()
        walls[name] = round(time.perf_counter() - t0, 2)
    assert len(set(counts.values())) == 1 and counts["one_task"] == n, counts

    # bbox short-circuit leg (r15): 13-vertex polygons, then a ~1%
    # window read. The record-header box check skips vertex decode for
    # non-matching records, so the bbox read should beat the full read
    # by far more than the row-count ratio alone would at the filter
    # stage (the exact filter runs on decoded rows either way).
    npoly = max(100_000, n // 8)
    polys = spark.range(npoly).select(
        F.col("id").cast("string").alias("id"),
        F.lit("POLYGON").alias("gtype"),
        # closing vertex appended EXACTLY (i=12 trig would land a few
        # ulp off the i=0 vertex and fail the ring-closure check)
        F.expr(
            "array(concat(transform(sequence(0, 11), i -> array("
            "cast(id % 4096 as double) / 16.0 + 0.5 * cos(i * pi() / 6.0),"
            "cast((id * 31) % 4096 as double) / 16.0"
            " + 0.5 * sin(i * pi() / 6.0))), "
            "array(array(cast(id % 4096 as double) / 16.0 + 0.5, "
            "cast((id * 31) % 4096 as double) / 16.0))))"
        ).alias("coords"),
    ).coalesce(1)
    outp = os.path.join(d, "bigpoly")
    export_shapefile(polys, outp)
    shpp = next(str(p) for p in Path(outp).glob("*.shp"))
    box = (0.0, 0.0, 25.6, 25.6)  # 1% of the 256x256 extent
    t0 = time.perf_counter()
    n_full = read_shapefile(spark, shpp, id_field=None).count()
    w_poly_full = round(time.perf_counter() - t0, 2)
    t0 = time.perf_counter()
    n_box = read_shapefile(spark, shpp, id_field=None, bbox=box).count()
    w_poly_bbox = round(time.perf_counter() - t0, 2)
    assert n_full == npoly and 0 < n_box < n_full, (n_full, n_box)

    print(json.dumps({
        "records": n,
        "shp_bytes": size,
        "write_sec": round(w_write, 2),
        "read_sec": walls,
        "speedup_8mb_vs_one_task": round(
            walls["one_task"] / walls["split_8mb"], 2),
        "poly_records": npoly,
        "poly_full_sec": w_poly_full,
        "poly_bbox_sec": w_poly_bbox,
        "poly_bbox_rows": n_box,
        "speedup_bbox_vs_full": round(w_poly_full / w_poly_bbox, 2),
        "cpus": cpus,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
