"""Deterministic WKT fixture for the end-to-end reader oracle query.

Writes fixtures/wkt_source.tsv: one row per geometry with the WKT text the
engine must parse PLUS the ground-truth columns the DuckDB oracle reads
directly (gtype, validity flag, envelope). The engine side never sees the
truth columns (read_wkt_delimited projects id/wkt only), so a correctness
match proves the whole chain: delimited scan -> WKT parse -> validity
filter -> envelope derivation -> tile join -> counts.

All coordinates are integer multiples of 1/16 (the repo exactness
contract) so envelope floats round-trip bit-exactly through the TSV.
"""

from __future__ import annotations

import os

N = 420
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "fixtures", "wkt_source.tsv")


def u(k: int, mul: int, mod: int) -> int:
    return (k * mul) % mod


def pt(k: int, i: int) -> tuple[float, float]:
    """i-th lattice point for key k, in [0, 64) with /16 granularity."""
    x = u(k + 31 * i, 2654435761, 1024) / 16.0
    y = u(k + 17 * i, 2246822519, 1024) / 16.0
    return x, y


def fmt(v: float) -> str:
    return repr(v)


def wkt_point(p):
    return f"POINT ({fmt(p[0])} {fmt(p[1])})"


def ring_txt(pts):
    return ", ".join(f"{fmt(x)} {fmt(y)}" for x, y in pts)


INVALID = [
    "POINT EMPTY",
    "LINESTRING (5)",
    "POLYGON ((0 0, 1 0, 1 1))",          # unclosed / short ring
    "FOO (1 2)",
    "MULTIPOLYGON (((0 0, 2 0, 2 2)))",   # unclosed ring
    "GEOMETRYCOLLECTION (POINT (1 1))",   # dropped at load, like reference
]


def make_row(k: int):
    if k % 29 == 0:
        return INVALID[k % len(INVALID)], "INVALID", 0, (0.0, 0.0, 0.0, 0.0)
    kind = k % 7
    x, y = pt(k, 0)
    if kind == 0:
        return wkt_point((x, y)), "POINT", 1, (x, y, x, y)
    if kind == 1:
        pts = [(x, y), pt(k, 1), pt(k, 2)]
        xs, ys = [p[0] for p in pts], [p[1] for p in pts]
        return (f"LINESTRING ({ring_txt(pts)})", "LINESTRING", 1,
                (min(xs), min(ys), max(xs), max(ys)))
    if kind == 2:
        w, h = (1 + u(k, 13, 40)) / 16.0, (1 + u(k, 19, 40)) / 16.0
        ring = [(x, y), (x + w, y), (x + w, y + h), (x, y + h), (x, y)]
        return (f"POLYGON (({ring_txt(ring)}))", "POLYGON", 1,
                (x, y, x + w, y + h))
    if kind == 3:
        # Box with an interior hole: envelope is the outer ring's.
        outer = [(x, y), (x + 2.0, y), (x + 2.0, y + 2.0), (x, y + 2.0), (x, y)]
        hx, hy = x + 0.5, y + 0.5
        hole = [(hx, hy), (hx + 0.5, hy), (hx + 0.5, hy + 0.5), (hx, hy + 0.5),
                (hx, hy)]
        return (f"POLYGON (({ring_txt(outer)}), ({ring_txt(hole)}))",
                "POLYGON", 1, (x, y, x + 2.0, y + 2.0))
    if kind == 4:
        pts = [(x, y), pt(k, 3), pt(k, 4)]
        xs, ys = [p[0] for p in pts], [p[1] for p in pts]
        body = ", ".join(f"({fmt(px)} {fmt(py)})" for px, py in pts)
        return (f"MULTIPOINT ({body})", "MULTIPOINT", 1,
                (min(xs), min(ys), max(xs), max(ys)))
    if kind == 5:
        a, b = pt(k, 5), pt(k, 6)
        c, d = pt(k, 7), pt(k, 8)
        xs = [a[0], b[0], c[0], d[0]]
        ys = [a[1], b[1], c[1], d[1]]
        return (f"MULTILINESTRING (({ring_txt([a, b])}), ({ring_txt([c, d])}))",
                "MULTILINESTRING", 1, (min(xs), min(ys), max(xs), max(ys)))
    # kind == 6: two boxes
    x2, y2 = pt(k, 9)
    w = (1 + u(k, 23, 24)) / 16.0
    r1 = [(x, y), (x + w, y), (x + w, y + w), (x, y + w), (x, y)]
    r2 = [(x2, y2), (x2 + w, y2), (x2 + w, y2 + w), (x2, y2 + w), (x2, y2)]
    return (f"MULTIPOLYGON ((({ring_txt(r1)})), (({ring_txt(r2)})))",
            "MULTIPOLYGON", 1,
            (min(x, x2), min(y, y2), max(x + w, x2 + w), max(y + w, y2 + w)))


GEO_OUT = os.path.join(os.path.dirname(OUT), "geo_source.geojson")
NT_OUT = os.path.join(os.path.dirname(OUT), "nt_source.nt")
NT_PRED = "<http://www.opengis.net/ont/geosparql#asWKT>"


def geojson_geometry(wkt: str):
    """GeoJSON geometry for a fixture WKT via the engine's own parser
    (identical coordinates; grouping rebuilt from the fixture's shapes:
    POLYGON parts are rings of one polygon, MULTIPOLYGON parts are
    single-ring polygons — true for every row this generator emits)."""
    import sys

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from ds_jedai_spark.model.geometry import parse_wkt

    parsed = parse_wkt(wkt)
    if parsed is None:
        return None
    gtype, parts = parsed
    if gtype == "POINT":
        return {"type": "Point", "coordinates": parts[0][0]}
    if gtype == "LINESTRING":
        return {"type": "LineString", "coordinates": parts[0]}
    if gtype == "POLYGON":
        return {"type": "Polygon", "coordinates": parts}
    if gtype == "MULTIPOINT":
        return {"type": "MultiPoint", "coordinates": [p[0] for p in parts]}
    if gtype == "MULTILINESTRING":
        return {"type": "MultiLineString", "coordinates": parts}
    if gtype == "MULTIPOLYGON":
        return {"type": "MultiPolygon", "coordinates": [[r] for r in parts]}
    return None


def main():
    import json

    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    with open(OUT, "w") as f, open(GEO_OUT, "w") as g, open(NT_OUT, "w") as t:
        f.write("id\twkt\tgtype\tvalid\tminx\tminy\tmaxx\tmaxy\n")
        for k in range(1, N + 1):
            wkt, gtype, valid, env = make_row(k)
            f.write(f"{k}\t{wkt}\t{gtype}\t{valid}\t"
                    f"{fmt(env[0])}\t{fmt(env[1])}\t{fmt(env[2])}\t{fmt(env[3])}\n")
            feat = {
                "type": "Feature",
                "geometry": geojson_geometry(wkt) if valid else None,
                "properties": {
                    "id": k, "gtype": gtype, "valid": valid,
                    "minx": env[0], "miny": env[1],
                    "maxx": env[2], "maxy": env[3],
                },
            }
            g.write(json.dumps(feat) + "\n")
            t.write(f'<http://example.org/e{k}> {NT_PRED} "{wkt}" .\n')
    print(f"wrote {OUT}")
    print(f"wrote {GEO_OUT}")
    print(f"wrote {NT_OUT}")


if __name__ == "__main__":
    main()
