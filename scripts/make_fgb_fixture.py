"""Generate fixtures/geo_source.fgb — the FlatGeobuf twin of
fixtures/wkt_source.tsv.

Same entity set; features are written in ORIGINAL row order (the spec
requires a valid packed R-tree, not Hilbert order — exercising the
reader against a non-engine feature order), the header geometry_type is
Unknown (0) so every feature carries its own type, and the WKT
fixture's invalid rows become CORRUPT features cycling a malformation
zoo (truncated flatbuffer, empty geometry table, open ring, odd xy
count, absent geometry) that are still correctly FRAMED (valid size
prefix) so subsequent features keep parsing. ids live in an `id`
String property; the CRS is EPSG:4326 so metadata is exercised
end-to-end.

The oracle needs no sidecar: the valid entity set (ids, gtypes,
envelopes) is EXACTLY the WKT fixture's ground-truth columns —
FlatGeobuf has no gtype promotions.

Run from the repo root:  python scripts/make_fgb_fixture.py
"""

from __future__ import annotations

import csv
import struct
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from ds_jedai_spark.io.flatgeobuf import (  # noqa: E402
    COLTYPE_STRING,
    MAGIC,
    _FBuilder,
    _feature_bytes,
    _header_bytes,
    _pack_rtree,
)
from ds_jedai_spark.model.geometry import parse_wkt  # noqa: E402

SRC = Path(__file__).resolve().parents[1] / "fixtures" / "wkt_source.tsv"
OUT = Path(__file__).resolve().parents[1] / "fixtures" / "geo_source.fgb"


def _props(rid: str) -> bytes:
    raw = rid.encode()
    return struct.pack("<HI", 0, len(raw)) + raw


def _corrupt(kind: int, rid: str) -> bytes:
    """Framed-but-broken feature payloads (the malformation zoo)."""
    if kind == 0:  # truncated flatbuffer: root offset past the buffer
        return struct.pack("<I", 4096) + b"\x00" * 12
    if kind == 1:  # feature with NO geometry table at all
        bld = _FBuilder()
        pv = bld.vector("<B", list(_props(rid)), 1)
        bld.start()
        bld.slot_offset(1, pv)
        return bld.finish(bld.end())
    if kind == 2:  # open ring polygon
        return _feature_bytes(
            "POLYGON",
            [[[0.0, 0.0], [4.0, 0.0], [4.0, 4.0], [1.0, 1.0]]],
            _props(rid),
        )
    if kind == 3:  # odd xy count (hand-built: 3 doubles)
        bld = _FBuilder()
        xy = bld.vector("<d", [1.0, 2.0, 3.0], 8)
        bld.start()
        bld.slot_scalar(6, "<B", 2, 0)  # LineString
        bld.slot_offset(1, xy)
        g = bld.end()
        bld.start()
        bld.slot_offset(0, g)
        return bld.finish(bld.end())
    # kind 4: one-point linestring
    bld = _FBuilder()
    xy = bld.vector("<d", [1.0, 2.0], 8)
    bld.start()
    bld.slot_scalar(6, "<B", 2, 0)
    bld.slot_offset(1, xy)
    g = bld.end()
    bld.start()
    bld.slot_offset(0, g)
    return bld.finish(bld.end())


def main() -> None:
    rows = list(csv.DictReader(SRC.open(), delimiter="\t"))
    feats: list[tuple[float, float, float, float, bytes]] = []
    n_bad = 0
    for row in rows:
        parsed = parse_wkt(row["wkt"])
        if parsed is None:
            feats.append((0.0, 0.0, 0.0, 0.0,
                          _corrupt(n_bad % 5, row["id"])))
            n_bad += 1
            continue
        gtype, parts = parsed
        flat = [p for part in parts for p in part]
        env = (min(p[0] for p in flat), min(p[1] for p in flat),
               max(p[0] for p in flat), max(p[1] for p in flat))
        feats.append((*env, _feature_bytes(gtype, parts,
                                           _props(row["id"]))))

    hdr = _header_bytes(
        len(feats), 0, [("id", COLTYPE_STRING)],
        (min(f[0] for f in feats), min(f[1] for f in feats),
         max(f[2] for f in feats), max(f[3] for f in feats)),
        ("EPSG", 4326), 16, "geo_source",
    )
    items, off = [], 0
    for f in feats:
        items.append((f[0], f[1], f[2], f[3], off))
        off += 4 + len(f[4])
    index = _pack_rtree(items, 16)
    with OUT.open("wb") as out:
        out.write(MAGIC)
        out.write(struct.pack("<I", len(hdr)))
        out.write(hdr)
        out.write(index)
        for f in feats:
            out.write(struct.pack("<I", len(f[4])))
            out.write(f[4])
    print(f"wrote {OUT} ({len(feats)} features, {n_bad} corrupt, "
          f"{OUT.stat().st_size} bytes)")


if __name__ == "__main__":
    main()
