"""Intra-file parallelism proof for the GeoPackage reader — the third
leg of the reader-probe triad (shp_scale_probe, fgb_scale_probe).

Builds ONE large .gpkg via the engine sink (default 2M point features;
SQLite is single-writer so the write leg is the documented driver
funnel), then reads it back at three split granularities: whole-table
(1 split — what a naive reader gets), the default 250k rows, and 50k
rows. Same rows out of every run (asserted); the wall-clock ratio is
the payoff of rowid-range splits over read-only SQLite connections.
Prints one JSON line.

Run on a quiet box:  python scripts/gpkg_scale_probe.py [n_records]
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
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    from pyspark.sql import functions as F

    from ds_jedai_spark.io.geopackage import (
        export_geopackage,
        read_geopackage,
    )
    from ds_jedai_spark.session import get_spark

    spark = get_spark("gpkg_scale_probe")
    d = tempfile.mkdtemp(prefix="gpkg_scale_")
    out = os.path.join(d, "big.gpkg")
    pts = spark.range(n).select(
        F.col("id").cast("string").alias("id"),
        F.lit("POINT").alias("gtype"),
        F.array(F.array(F.array(
            (F.col("id") % 4096).cast("double") / 16.0,
            ((F.col("id") * 31) % 4096).cast("double") / 16.0,
        ))).alias("coords"),
    )
    t0 = time.perf_counter()
    export_geopackage(pts, out)
    w_write = time.perf_counter() - t0
    size = os.path.getsize(out)

    walls = {}
    counts = {}
    for name, rows in (("one_split", n + 1),
                       ("default_250k", 250_000),
                       ("rows_50k", 50_000)):
        t0 = time.perf_counter()
        counts[name] = read_geopackage(
            spark, out, id_field=None, split_rows=rows
        ).count()
        walls[name] = round(time.perf_counter() - t0, 2)
    assert len(set(counts.values())) == 1 and counts["one_split"] == n, \
        counts

    # sharded-sink leg (r15): one spec-conformant .gpkg per partition,
    # assembled executor-side in parallel — the scale alternative to
    # the single-writer driver funnel timed above.
    from ds_jedai_spark.io.geopackage import export_geopackage_sharded

    outs = os.path.join(d, "shards")
    t0 = time.perf_counter()
    export_geopackage_sharded(pts.repartition(cpus), outs)
    w_sharded = time.perf_counter() - t0
    t0 = time.perf_counter()
    n_back = read_geopackage(spark, outs, id_field=None).count()
    w_corpus_read = time.perf_counter() - t0
    assert n_back == n, (n_back, n)

    print(json.dumps({
        "records": n,
        "gpkg_bytes": size,
        "write_sec": round(w_write, 2),
        "read_sec": walls,
        "speedup_250k_vs_one_split": round(
            walls["one_split"] / walls["default_250k"], 2),
        "sharded_write_sec": round(w_sharded, 2),
        "sharded_write_speedup": round(w_sharded and w_write / w_sharded,
                                       2),
        "corpus_read_sec": round(w_corpus_read, 2),
        "cpus": cpus,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
