"""Generate fixtures/geo_source_wkb.parquet — the GeoParquet/WKB twin
of fixtures/wkt_source.tsv.

The file carries the SAME entities as the WKT fixture, geometry encoded
as little-endian ISO WKB in a binary `geometry` column, plus the
fixture's ground-truth columns (gtype/valid/minx..maxy) that only the
DuckDB oracle reads. Rows the WKT fixture marks invalid get deliberately
undecodable bytes so the WKB validity filter is exercised end-to-end.
The parquet footer carries GeoParquet `geo` metadata (primary_column =
"geometry"), so the reader's auto-detection path is what the gate runs.

Run from the repo root:  python scripts/make_wkb_fixture.py
"""

from __future__ import annotations

import csv
import json
import sys
from pathlib import Path

import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from ds_jedai_spark.model.geometry import format_wkb, parse_wkt  # noqa: E402

SRC = Path(__file__).resolve().parents[1] / "fixtures" / "wkt_source.tsv"
OUT = Path(__file__).resolve().parents[1] / "fixtures" / "geo_source_wkb.parquet"


def main() -> None:
    rows = list(csv.DictReader(SRC.open(), delimiter="\t"))
    ids, wkbs, gtypes, valids = [], [], [], []
    envs = {k: [] for k in ("minx", "miny", "maxx", "maxy")}
    for r in rows:
        parsed = parse_wkt(r["wkt"])
        valid = int(r["valid"])
        assert (parsed is not None) == bool(valid), r["id"]
        ids.append(int(r["id"]))
        # invalid rows: a truncated header — undecodable on purpose
        wkbs.append(format_wkb(*parsed) if parsed else b"\x01\x02")
        gtypes.append(r["gtype"] if valid else None)
        valids.append(valid)
        for k in envs:
            envs[k].append(float(r[k]) if valid else None)

    geo_meta = {
        "version": "1.0.0",
        "primary_column": "geometry",
        "columns": {"geometry": {"encoding": "WKB",
                                 "geometry_types": []}},
    }
    table = pa.table(
        {
            "id": pa.array(ids, pa.int64()),
            "geometry": pa.array(wkbs, pa.binary()),
            "gtype": pa.array(gtypes, pa.string()),
            "valid": pa.array(valids, pa.int32()),
            **{k: pa.array(v, pa.float64()) for k, v in envs.items()},
        }
    )
    table = table.replace_schema_metadata(
        {b"geo": json.dumps(geo_meta).encode("utf-8")}
    )
    pq.write_table(table, OUT)
    print(f"wrote {OUT} ({len(rows)} rows)")


if __name__ == "__main__":
    main()
