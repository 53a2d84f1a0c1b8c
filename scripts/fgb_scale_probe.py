"""Intra-file parallelism + bbox-pushdown proof for the FlatGeobuf
reader.

Builds ONE large .fgb via the engine sink (default 2M point features —
the sink is the driver-side interop funnel, so the write is the slow
leg by design), then reads it back at three split granularities:
whole-file (1 task — a naive non-splittable reader), the default 8 MB,
and 2 MB. Same rows out of every run (asserted). A fourth read pushes
a ~1%-area bbox into the scan and reports rows + wall — the packed
R-tree skip working at size. Prints one JSON line.

Run on a quiet box:  python scripts/fgb_scale_probe.py [n_records]
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

    from ds_jedai_spark.io.flatgeobuf import (
        export_flatgeobuf,
        read_flatgeobuf,
    )
    from ds_jedai_spark.session import get_spark

    spark = get_spark("fgb_scale_probe")
    d = tempfile.mkdtemp(prefix="fgb_scale_")
    out = os.path.join(d, "big.fgb")
    pts = spark.range(n).select(
        F.col("id").cast("string").alias("id"),
        F.lit("POINT").alias("gtype"),
        F.array(F.array(F.array(
            (F.col("id") % 4096).cast("double") / 16.0,
            ((F.col("id") * 31) % 4096).cast("double") / 16.0,
        ))).alias("coords"),
        ((F.col("id") % 4096).cast("double") / 16.0).alias("minx"),
        (((F.col("id") * 31) % 4096).cast("double") / 16.0).alias("miny"),
        ((F.col("id") % 4096).cast("double") / 16.0).alias("maxx"),
        (((F.col("id") * 31) % 4096).cast("double") / 16.0).alias("maxy"),
    )
    t0 = time.perf_counter()
    export_flatgeobuf(pts, out)
    w_write = time.perf_counter() - t0
    size = os.path.getsize(out)

    # the DISTRIBUTED sink: same rows, one shard per partition, written
    # by the executors in parallel
    from ds_jedai_spark.io.flatgeobuf import export_flatgeobuf_sharded

    shard_dir = os.path.join(d, "shards")
    t0 = time.perf_counter()
    export_flatgeobuf_sharded(pts.repartition(cpus), shard_dir)
    w_sharded = time.perf_counter() - t0
    t0 = time.perf_counter()
    n_corpus = read_flatgeobuf(spark, shard_dir, id_field=None).count()
    r_corpus = time.perf_counter() - t0
    assert n_corpus == n, (n_corpus, n)

    walls = {}
    counts = {}
    for name, split in (("one_task", size + 100),
                        ("default_8mb", 8 << 20),
                        ("split_2mb", 2 << 20)):
        t0 = time.perf_counter()
        counts[name] = read_flatgeobuf(
            spark, out, id_field=None, split_bytes=split
        ).count()
        walls[name] = round(time.perf_counter() - t0, 2)
    assert len(set(counts.values())) == 1 and counts["one_task"] == n, counts

    # ~1% of the 256x256 extent
    box = (100.0, 100.0, 125.6, 125.6)
    t0 = time.perf_counter()
    bbox_rows = read_flatgeobuf(spark, out, id_field=None,
                                bbox=box).count()
    bbox_sec = round(time.perf_counter() - t0, 2)

    print(json.dumps({
        "records": n,
        "fgb_bytes": size,
        "write_sec": round(w_write, 2),
        "sharded_write_sec": round(w_sharded, 2),
        "corpus_read_sec": round(r_corpus, 2),
        "read_sec": walls,
        "speedup_8mb_vs_one_task": round(
            walls["one_task"] / walls["default_8mb"], 2),
        "bbox_rows": bbox_rows,
        "bbox_sec": bbox_sec,
        "cpus": cpus,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
