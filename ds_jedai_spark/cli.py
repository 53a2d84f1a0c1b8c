"""Command-line entry point mirroring the reference's spark-submit UX.

    python -m ds_jedai_spark.cli -conf conf.yaml [-export PATH]
    python -m ds_jedai_spark.cli -pipeline <query|list> [-data DIR] [-limit N]

The first form prints the same summary the reference logs (reference:
experiments/GiantExp.scala:104-127 — verifications, qualifying pairs, the
9 relation counts, total time). The second runs any named engine query
(the driver-gate surface: spatial, progressive, dedup/ANN/text/media,
streaming) against a testdata directory — the beyond-reference pipeline
operators are first-class from the shell, not just from the gate.
"""

from __future__ import annotations

import argparse
import os
import sys
import time


def _run_pipeline(name: str, data_dir: str, limit: int) -> int:
    from ds_jedai_spark.plans import gate
    from ds_jedai_spark.session import get_spark

    if name == "list":
        for q in gate.QUERIES:
            print(q)
        return 0
    if name not in gate.QUERIES:
        print(f"unknown query {name!r}; use '-pipeline list'", file=sys.stderr)
        return 2
    if not data_dir:
        print("-pipeline needs -data DIR (or set $TESTDATA_DIR)", file=sys.stderr)
        return 2

    spark = get_spark("ds_jedai_spark_cli")
    t0 = time.perf_counter()
    df = gate.QUERIES[name](spark, data_dir)
    # take/count instead of collect: a pair query at scale would ship
    # millions of rows to the driver just to print `limit` of them.
    rows = df.take(limit + 1)
    total = len(rows) if len(rows) <= limit else df.count()
    dt = time.perf_counter() - t0
    print("\t".join(df.columns))
    for row in rows[:limit]:
        print("\t".join(str(v) for v in row))
    if total > limit:
        print(f"... ({total} rows total)")
    print(f"TOTAL TIME: {dt:.2f}s")
    spark.stop()
    return 0


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="ds_jedai_spark")
    ap.add_argument("-conf", default=None, help="YAML configuration file")
    ap.add_argument("-export", default=None, help="override exportPath")
    ap.add_argument("-budget", type=int, default=None, help="override budget")
    ap.add_argument(
        "-pipeline",
        default=None,
        help="run a named engine query ('list' to enumerate) instead of -conf",
    )
    ap.add_argument(
        "-data",
        default=os.environ.get("TESTDATA_DIR"),
        help="testdata dir for -pipeline (default: $TESTDATA_DIR)",
    )
    ap.add_argument("-limit", type=int, default=20, help="rows to print (-pipeline)")
    args = ap.parse_args(argv)

    if args.pipeline is not None:
        return _run_pipeline(args.pipeline, args.data, args.limit)
    if args.conf is None:
        ap.error("one of -conf or -pipeline is required")

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
    if cfg.relation == "DE9IM":
        # Counts run: the result is a single summary row.
        r = result.collect()[0].asDict()
        dt = time.perf_counter() - t0
        for k, v in r.items():
            print(f"{k.upper()}: {v}")
    else:
        # Pair query: take/count instead of collect — at scale the
        # qualifying-pair set is millions of rows and only 20 print.
        rows = result.take(21)
        total = len(rows) if len(rows) <= 20 else result.count()
        dt = time.perf_counter() - t0
        print(f"{cfg.relation} pairs: {total}")
        for row in rows[:20]:
            print(f"  {row.s_id}\t{row.t_id}")
    print(f"TOTAL TIME: {dt:.2f}s")
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
