"""Stage-level spill evidence for the giant_counts scale decades.

The x100 -> x1000 decade factor measured superlinear (8.2x then 18.5x in
r12); the attributed cause — the exploded-tile shuffle crossing the
in-memory -> spill transition on this box — was asserted from wall
clocks, not measured. This script measures it: it runs giant_counts at
clone factors {100, 1000} under multiple spark.sql.shuffle.partitions
settings, captures per-stage shuffle and spill bytes from the Spark
status REST API, and records wall + summed metrics per run.

Also tests the obvious knob: with a fixed executor-memory pool, more
shuffle partitions = smaller per-task sorts = fewer/no spills, at the
price of more, smaller tasks. On a real cluster memory scales with the
data so the wall moves; here the knob either flattens the decade factor
or proves the box constant.

Writes SPILL_EVIDENCE.json at the repo root and prints one JSON line.
Run only on a quiet box (single-shot walls; JVM probes bracket each run
so a loaded-box measurement is visibly flagged).

Usage: python scripts/spill_evidence.py [clones=100,1000] [parts=32,256]
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _rest(spark, path: str):
    base = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId
    with urllib.request.urlopen(f"{base}/api/v1/applications/{app}{path}") as r:
        return json.load(r)


def _completed_stages(spark) -> dict[int, dict]:
    return {
        s["stageId"]: s
        for s in _rest(spark, "/stages?status=complete")
    }


_METRICS = (
    "memoryBytesSpilled", "diskBytesSpilled",
    "shuffleWriteBytes", "shuffleReadBytes",
    "shuffleWriteRecords", "shuffleReadRecords",
    "executorRunTime",
)


def _probe(spark) -> float:
    t0 = time.perf_counter()
    spark.range(0, 5 * 10**9, 1, 32).selectExpr("sum(id % 1000)").collect()
    return time.perf_counter() - t0


def run_one(spark, clones: int, parts: int) -> dict:
    from bench_scale import _cloned_boxes
    from ds_jedai_spark.model.tiles import compute_theta
    from ds_jedai_spark.operators.relate import with_relations
    from ds_jedai_spark.operators.spatial_join import tile_join
    from ds_jedai_spark.plans.giant import counts_agg

    spark.conf.set("spark.sql.shuffle.partitions", str(parts))
    p0 = _probe(spark)
    cs, ct = _cloned_boxes(spark, SF_DIR, clones=clones)
    theta = compute_theta(cs)
    # snapshot AFTER the probe / clone-span / theta jobs so the summed
    # metrics cover exactly the counts query's stages
    before = set(_completed_stages(spark))
    t0 = time.perf_counter()
    v = counts_agg(with_relations(tile_join(cs, ct, theta=theta))).first(
    ).verifications
    wall = time.perf_counter() - t0
    p1 = _probe(spark)
    after = _completed_stages(spark)
    new = [s for sid, s in after.items() if sid not in before]
    total = {m: sum(int(s.get(m, 0) or 0) for s in new) for m in _METRICS}
    top = sorted(new, key=lambda s: -int(s.get("diskBytesSpilled", 0) or 0))
    rec = {
        "clones": clones,
        "shuffle_partitions": parts,
        "wall_sec": round(wall, 1),
        "verifications": int(v),
        "stages": len(new),
        "probe_before_sec": round(p0, 2),
        "probe_after_sec": round(p1, 2),
        **{m: total[m] for m in _METRICS},
        "top_spill_stages": [
            {
                "stageId": s["stageId"],
                "name": (s.get("name") or "")[:60],
                "numTasks": s.get("numTasks"),
                "diskBytesSpilled": int(s.get("diskBytesSpilled", 0) or 0),
                "memoryBytesSpilled": int(s.get("memoryBytesSpilled", 0) or 0),
                "shuffleWriteBytes": int(s.get("shuffleWriteBytes", 0) or 0),
                "shuffleReadBytes": int(s.get("shuffleReadBytes", 0) or 0),
            }
            for s in top[:4]
        ],
    }
    print(json.dumps(rec), flush=True)
    return rec


def main() -> None:
    clones = [int(c) for c in
              (sys.argv[1].split(",") if len(sys.argv) > 1 else (100, 1000))]
    parts = [int(p) for p in
             (sys.argv[2].split(",") if len(sys.argv) > 2 else (32, 256))]

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("spill_evidence")
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.driver.memory",
                os.environ.get("SPARK_DRIVER_MEMORY", "48g"))
        .config("spark.ui.enabled", "true")  # the status REST API
        .config("spark.ui.retainedStages", "5000")
        .config("spark.driver.host", "127.0.0.1")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("WARN")
    _probe(spark)  # codegen warm-up

    runs = []
    for c in clones:
        for p in parts:
            runs.append(run_one(spark, c, p))

    out = {"sf_dir": SF_DIR, "cpus": cpus, "runs": runs}
    Path(__file__).resolve().parents[1].joinpath(
        "SPILL_EVIDENCE.json"
    ).write_text(json.dumps(out, indent=1))
    print(json.dumps({"written": "SPILL_EVIDENCE.json",
                      "n_runs": len(runs)}))
    spark.stop()


if __name__ == "__main__":
    main()
