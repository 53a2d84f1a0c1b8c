"""Record the box-speed calibration artifact (CALIBRATION.json).

Runs the two fixed canary probes (ds_jedai_spark/benchprobe.py) many
times on an otherwise-idle box and writes their medians + spread to
CALIBRATION.json at the repo root. bench.py reads the artifact and —
only when its PROBE_VERSION matches the running probe code — publishes
``box_vs_calibration`` ratios (this run's probe medians / the
calibrated quiet medians), turning the run's canaries into an absolute
box-speed reading a reader can verify and normalize totals by.

Re-run this whenever the probe workload changes (bump PROBE_VERSION in
benchprobe.py first) or when moving to a new reference box:

    python scripts/calibrate_box.py [reps=9]

The artifact is committed next to the BENCH_r{N}.json files so every
published ratio is reproducible from the repo alone — no inline magic
numbers (ADVICE r14).
"""

from __future__ import annotations

import datetime
import json
import os
import platform
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from ds_jedai_spark.benchprobe import PROBE_VERSION, jvm_probe, py_probe  # noqa: E402
from ds_jedai_spark.session import get_spark  # noqa: E402


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 9
    spark = get_spark("ds_jedai_spark_calibrate")
    # warm-up (codegen + Python worker pool spin-up), not recorded
    jvm_probe(spark)
    py_probe(spark)
    jvm = sorted(jvm_probe(spark) for _ in range(reps))
    py = sorted(py_probe(spark) for _ in range(reps))
    out = {
        "probe_version": PROBE_VERSION,
        "reps": reps,
        "jvm_probe_quiet": round(jvm[reps // 2], 3),
        "py_probe_quiet": round(py[reps // 2], 3),
        "jvm_probe_spread": [round(jvm[0], 3), round(jvm[-1], 3)],
        "py_probe_spread": [round(py[0], 3), round(py[-1], 3)],
        "recorded_utc": datetime.datetime.now(datetime.timezone.utc)
        .strftime("%Y-%m-%dT%H:%M:%SZ"),
        "host": {
            "platform": platform.platform(),
            "cpus": os.cpu_count(),
            "spark_master": spark.sparkContext.master,
        },
    }
    path = Path(__file__).resolve().parents[1] / "CALIBRATION.json"
    path.write_text(json.dumps(out, indent=2) + "\n")
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
