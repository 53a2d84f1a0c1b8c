"""Command-line entry point mirroring the reference's spark-submit UX.

    python -m ds_jedai_spark.cli -conf conf.yaml [-export PATH]

Prints the same summary the reference logs (reference:
experiments/GiantExp.scala:104-127 — verifications, qualifying pairs, the
9 relation counts, total time).
"""

from __future__ import annotations

import argparse
import sys
import time


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="ds_jedai_spark")
    ap.add_argument("-conf", required=True, help="YAML configuration file")
    ap.add_argument("-export", default=None, help="override exportPath")
    ap.add_argument("-budget", type=int, default=None, help="override budget")
    args = ap.parse_args(argv)

    from ds_jedai_spark import api
    from ds_jedai_spark.config import load_config
    from ds_jedai_spark.session import get_spark

    cfg = load_config(args.conf)
    if args.export:
        cfg.export_path = args.export
    if args.budget:
        cfg.budget = args.budget

    spark = get_spark("ds_jedai_spark_cli")
    t0 = time.perf_counter()
    result = api.run(spark, cfg)
    rows = result.collect()
    dt = time.perf_counter() - t0

    if cfg.relation == "DE9IM":
        r = rows[0].asDict()
        for k, v in r.items():
            print(f"{k.upper()}: {v}")
    else:
        print(f"{cfg.relation} pairs: {len(rows)}")
        for row in rows[:20]:
            print(f"  {row.s_id}\t{row.t_id}")
    print(f"TOTAL TIME: {dt:.2f}s")
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
