"""Capture .explain("formatted") for every bench.py headline query.

Usage: python scripts/capture_plans.py <suffix> [query ...]

Writes plans/$SPARK_GRAFT_PLAN_ROUND (default r18)/<name>_<suffix>.txt for each headline query (or the
named subset). The DataFrame is built exactly as bench.py builds it
(same build_headline list), so the captured plan is the benched plan.
Iterative queries (dbscan, knn_exact, the stateful scans) execute
intermediate jobs during construction — the file then holds the plan of
the FINAL returned frame, which is what the bench times end-to-end.
"""
from __future__ import annotations

import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def explain_formatted(df) -> str:
    jqe = df._jdf.queryExecution()
    jvm = df.sparkSession._jvm
    mode = jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    return jqe.explainString(mode)


def main() -> None:
    suffix = sys.argv[1] if len(sys.argv) > 1 else "before"
    only = set(sys.argv[2:])
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from ds_jedai_spark.session import get_spark
    import bench

    spark = get_spark("ds_jedai_spark_plan_capture")
    round_dir = os.environ.get("SPARK_GRAFT_PLAN_ROUND", "r18")
    out_dir = Path(__file__).resolve().parent.parent / "plans" / round_dir
    out_dir.mkdir(parents=True, exist_ok=True)

    headline = bench.build_headline(spark)
    for name, fn in headline:
        if only and name not in only:
            continue
        spark.sparkContext.setJobDescription(f"capture_plans: {name}")
        try:
            df = fn(spark, sf_dir)
            text = explain_formatted(df)
        except Exception as e:  # keep going; record the failure
            text = f"CAPTURE ERROR: {e!r}\n"
        (out_dir / f"{name}_{suffix}.txt").write_text(text)
        print(f"wrote {name}_{suffix}.txt ({len(text)} bytes)")
    spark.stop()


if __name__ == "__main__":
    main()
