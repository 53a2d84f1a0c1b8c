"""Z-order layout probe: how much of a bbox query does the layout let
parquet pruning skip, natural vs z-ordered, at sf0.1 scale?

Writes the source-box centers (20k rows at sf0.1) both ways, then
reports footer-level pruning (row groups / rows touched) and the
measured filtered-scan wall time for a ~3.5%-area bbox. The footer
numbers are the scale story: at 100 TB the rows_fraction IS the I/O
bill. Run: python scripts/zorder_probe.py [sf_dir]
"""
from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from ds_jedai_spark.io import layout  # noqa: E402
from ds_jedai_spark.io.synthetic import load_sql, source_box_sql  # noqa: E402
from ds_jedai_spark.session import get_spark  # noqa: E402

BBOX = "cx >= 20.0e0 AND cx <= 44.0e0 AND cy >= 30.0e0 AND cy <= 54.0e0"


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("zorder_probe")
    src = load_sql(spark, sf_dir, source_box_sql()).selectExpr(
        "id", "(minx + maxx) / 2.0e0 AS cx", "(miny + maxy) / 2.0e0 AS cy"
    )
    base = tempfile.mkdtemp(prefix="zorder_probe_")
    nat = os.path.join(base, "natural")
    zed = os.path.join(base, "zordered")
    src.repartition(32).write.parquet(nat)
    layout.write_zordered(
        src, zed, x_col="cx", y_col="cy",
        bounds=(0.0, 0.0, 128.0, 128.0), files=32,
    )
    out = {}
    for name, path in (("natural", nat), ("zorder", zed)):
        stats = layout.scan_stats(path, "cx", "cy")
        frac = layout.pruned_fraction(stats, (20.0, 30.0, 44.0, 54.0))
        t = []
        for _ in range(3):
            t0 = time.perf_counter()
            n = spark.read.parquet(path).where(BBOX).count()
            t.append(time.perf_counter() - t0)
        out[name] = {**frac, "rows_match": n, "scan_best_s": round(min(t), 3)}
    out["io_ratio"] = round(
        out["natural"]["rows_fraction"]
        / max(out["zorder"]["rows_fraction"], 1e-9), 1
    )
    # Granularity asymptotics: the touched fraction approaches the bbox
    # area fraction as files shrink toward real 128 MB row groups (a
    # 100 TB layer has ~10^6 of them, not 32) — report 256 files too.
    fine = os.path.join(base, "zordered_fine")
    layout.write_zordered(
        src, fine, x_col="cx", y_col="cy",
        bounds=(0.0, 0.0, 128.0, 128.0), files=256,
    )
    out["zorder_256files"] = layout.pruned_fraction(
        layout.scan_stats(fine, "cx", "cy"), (20.0, 30.0, 44.0, 54.0)
    )
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
