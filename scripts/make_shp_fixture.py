"""Generate fixtures/shp_source/ — the ESRI Shapefile twin of
fixtures/wkt_source.tsv — plus fixtures/shp_source_truth.parquet.

The spec allows ONE shape type per .shp (plus nulls), so the fixture is
a DIRECTORY of four shapefiles (points/lines/polys/mpoints, each with
.shx/.dbf sidecars and the polys file a .prj), which also exercises the
reader's multi-file directory scan. Every entity of the WKT fixture is
written to the file of its kind; rows the WKT fixture marks invalid
become deliberately corrupt records (bad counts / truncation / a null
shape) that the reader must drop.

Ground truth (id/gtype/valid/minx..maxy) goes to a sidecar parquet only
the DuckDB oracle reads. Shapefile gtype truth applies the format's
inherent promotions — the format cannot represent a single-part
MULTILINESTRING or a single-shell MULTIPOLYGON distinctly (OGR promotes
the same way), so truth gtype is LINESTRING/POLYGON there.

Self-checking: each written record is re-parsed with the engine's
parse_shape and asserted equal to the expected (gtype, envelope).

Run from the repo root:  python scripts/make_shp_fixture.py
"""

from __future__ import annotations

import csv
import shutil
import struct
import sys
from pathlib import Path

import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from ds_jedai_spark.io.shapefile import (  # noqa: E402
    dbf_bytes,
    parse_shape,
    shape_content,
    shapefile_bytes,
)
from ds_jedai_spark.io.shapefile import WGS84_PRJ  # noqa: E402
from ds_jedai_spark.model.geometry import parse_wkt, regroup_rings  # noqa: E402

SRC = Path(__file__).resolve().parents[1] / "fixtures" / "wkt_source.tsv"
OUT_DIR = Path(__file__).resolve().parents[1] / "fixtures" / "shp_source"
TRUTH = Path(__file__).resolve().parents[1] / "fixtures" / "shp_source_truth.parquet"


def pack_points(pts) -> bytes:
    import struct as _s

    return b"".join(_s.pack("<dd", x, y) for x, y in pts)


def bbox(parts):
    xs = [p[0] for part in parts for p in part]
    ys = [p[1] for part in parts for p in part]
    return min(xs), min(ys), max(xs), max(ys)


CORRUPT = [
    # null shape (placeholder record, spec-legal, engine drops it)
    struct.pack("<i", 0),
    # polygon with a 3-point "ring" (unclosed, too few)
    struct.pack("<i", 5) + struct.pack("<4d", 0, 0, 1, 1)
    + struct.pack("<ii", 1, 3) + struct.pack("<i", 0)
    + pack_points([(0, 0), (1, 0), (1, 1)]),
    # truncated point array: header claims 8 points, bytes carry 2
    struct.pack("<i", 5) + struct.pack("<4d", 0, 0, 1, 1)
    + struct.pack("<ii", 1, 8) + struct.pack("<i", 0)
    + pack_points([(0, 0), (1, 0)]),
    # non-monotonic part index
    struct.pack("<i", 3) + struct.pack("<4d", 0, 0, 1, 1)
    + struct.pack("<ii", 2, 4) + struct.pack("<ii", 2, 1)
    + pack_points([(0, 0), (1, 0), (1, 1), (0, 1)]),
]


def write_shapefile(path_stem: Path, shape_type: int,
                    records: list[bytes], ids: list[str],
                    prj: str | None = None) -> None:
    """Fixture-side writer over the package byte builders
    (io/shapefile.shapefile_bytes / dbf_bytes) — kept here so the
    fixture can also write DELIBERATELY CORRUPT records, which the
    package sink never produces."""
    shp, shx = shapefile_bytes(shape_type, records)
    path_stem.with_suffix(".shp").write_bytes(shp)
    path_stem.with_suffix(".shx").write_bytes(shx)
    path_stem.with_suffix(".dbf").write_bytes(
        dbf_bytes([("id", 16)], [(i,) for i in ids])
    )
    if prj:
        path_stem.with_suffix(".prj").write_text(prj)


def promote(gtype: str, parts) -> str:
    """Shapefile-representable gtype (the format's inherent promotions)."""
    if gtype == "MULTILINESTRING" and len(parts) == 1:
        return "LINESTRING"
    if gtype == "MULTIPOLYGON":
        groups = regroup_rings(parts)
        return "POLYGON" if len(groups) == 1 else "MULTIPOLYGON"
    return gtype


def main() -> None:
    rows = list(csv.DictReader(SRC.open(), delimiter="\t"))
    kinds = {"points": [], "lines": [], "polys": [], "mpoints": []}
    kind_of = {"POINT": "points", "LINESTRING": "lines",
               "MULTILINESTRING": "lines", "POLYGON": "polys",
               "MULTIPOLYGON": "polys", "MULTIPOINT": "mpoints"}
    truth = {k: [] for k in
             ("id", "gtype", "valid", "minx", "miny", "maxx", "maxy")}
    n_corrupt = 0
    for r in rows:
        parsed = parse_wkt(r["wkt"])
        valid = int(r["valid"])
        assert (parsed is not None) == bool(valid), r["id"]
        truth["id"].append(int(r["id"]))
        truth["valid"].append(valid)
        if parsed is None:
            # corrupt record, cycling through the malformation zoo
            kinds["polys"].append((r["id"], CORRUPT[n_corrupt % len(CORRUPT)],
                                   None))
            n_corrupt += 1
            truth["gtype"].append(None)
            for k in ("minx", "miny", "maxx", "maxy"):
                truth[k].append(None)
            continue
        gtype, parts = parsed
        want = promote(gtype, parts)
        content = shape_content(gtype, parts)
        got = parse_shape(content)
        assert got is not None and got[0] == want, (r["id"], want, got)
        assert bbox(got[1]) == bbox(parts), r["id"]
        kinds[kind_of[gtype]].append((r["id"], content, want))
        truth["gtype"].append(want)
        for k, v in zip(("minx", "miny", "maxx", "maxy"), bbox(parts)):
            truth[k].append(float(v))

    if OUT_DIR.exists():
        shutil.rmtree(OUT_DIR)
    OUT_DIR.mkdir(parents=True)
    type_code = {"points": 1, "lines": 3, "polys": 5, "mpoints": 8}
    for kind, recs in kinds.items():
        if not recs:
            continue
        write_shapefile(
            OUT_DIR / kind, type_code[kind],
            [c for _, c, _ in recs], [i for i, _, _ in recs],
            prj=WGS84_PRJ if kind == "polys" else None,
        )
    pq.write_table(
        pa.table({
            "id": pa.array(truth["id"], pa.int64()),
            "gtype": pa.array(truth["gtype"], pa.string()),
            "valid": pa.array(truth["valid"], pa.int32()),
            **{k: pa.array(truth[k], pa.float64())
               for k in ("minx", "miny", "maxx", "maxy")},
        }),
        TRUTH,
    )
    n_valid = sum(truth["valid"])
    print(f"wrote {OUT_DIR} ({len(rows)} rows, {n_valid} valid, "
          f"{n_corrupt} corrupt) and {TRUTH}")


if __name__ == "__main__":
    main()
