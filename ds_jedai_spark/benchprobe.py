"""Box-speed canary probes shared by bench.py and the calibration tool.

Two FIXED workloads whose cost is a property of the BOX, not the engine:

* ``jvm_probe`` — modular sum over range(5e9) in 32 partitions: pure
  whole-stage codegen, no I/O, no Python; ~150 ms of real compute per
  task so task-dispatch jitter doesn't dominate (~0.6 s quiet, ~11 %
  quiet-box spread).
* ``py_probe`` — a 32-group applyInPandas scan (3.2 M rows through
  Arrow, a real pandas reduction per group, ~0.4 s quiet): exercises
  Python-worker dispatch + Arrow round-trips + pandas compute — the
  resource the stateful applyInPandas queries are bound on, which the
  JVM probe is blind to (BENCH_r11's exhibit).

``PROBE_VERSION`` stamps both the calibration artifact
(CALIBRATION.json, written by scripts/calibrate_box.py) and the bench
run that consumes it; bench.py only reports a box-speed ratio when the
versions MATCH, so a change to the probe workload can never be
misread as a change in box speed (the failure mode of r14's inline
pinned constants — see ADVICE r14).
"""

from __future__ import annotations

import time

PROBE_VERSION = "r15-range5e9-pandas3.2m"


def jvm_probe(spark) -> float:
    t0 = time.perf_counter()
    spark.range(0, 5 * 10**9, 1, 32).selectExpr("sum(id % 1000)").collect()
    return time.perf_counter() - t0


def _py_probe_fn(pdf):
    import pandas as pd

    s = pdf["id"].to_numpy()
    return pd.DataFrame(
        {"g": [int(pdf["g"].iloc[0])], "v": [float((s * s % 1000).sum())]}
    )


def py_probe(spark) -> float:
    t0 = time.perf_counter()
    (
        spark.range(0, 3_200_000, 1, 32)
        .selectExpr("id", "id % 32 AS g")
        .groupBy("g")
        .applyInPandas(_py_probe_fn, "g long, v double")
        .selectExpr("sum(v)")
        .collect()
    )
    return time.perf_counter() - t0
