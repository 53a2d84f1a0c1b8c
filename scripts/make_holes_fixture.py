"""Deterministic hole/concave/multipolygon WKT fixture for the
end-to-end exact-relate oracle gate (the IntersectionMatrixTest.scala
pattern: reference src/test/scala/IntersectionMatrixTest.scala:29-38
exercises relate over non-convex WKT; this fixture drives the engine's
full chain — delimited scan -> WKT parse -> validity filter -> tile
join -> relate_general/relate_poly -> 11 counters — against truth that
is known BY CONSTRUCTION, not computed by any relate algorithm).

Layout: one source geometry and one target geometry per grid cell, cells
128 units apart, so every cross-cell pair is envelope-disjoint and the
tile join yields exactly the within-cell pairs. Each within-cell pair's
envelopes DO intersect by construction — including the cases where the
geometries themselves are disjoint (target in a hole, target in a
concavity): exactly the pairs an envelope approximation gets wrong and
the exact polygon classifier must get right.

The truth relation flags per target row are hand-derived from the
template geometry (where the target was PLACED: in the hole, in the
solid ring, straddling the hole edge, equal to the hole ring, ...) under
the standard DE-9IM definitions — the engine side never sees them
(read_wkt_delimited projects id+wkt only); only the DuckDB oracle reads
them. Flag orientation is relation(source, target): f_contains = source
contains target.

All coordinates are small integers (a subset of the repo's 1/16-lattice
exactness contract), so envelopes round-trip bit-exactly.
"""

from __future__ import annotations

import os

OUT_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "fixtures"
)
CELL = 128

# base geometries as (gtype, parts); parts = rings / chains / point lists
DONUT = ("POLYGON", [
    [(0, 0), (16, 0), (16, 16), (0, 16), (0, 0)],
    [(4, 4), (12, 4), (12, 12), (4, 12), (4, 4)],
])
CSHAPE = ("POLYGON", [
    [(0, 0), (12, 0), (12, 4), (4, 4), (4, 8), (12, 8), (12, 12), (0, 12),
     (0, 0)],
])
MPOLY = ("MULTIPOLYGON", [
    [(0, 0), (6, 0), (6, 6), (0, 6), (0, 0)],
    [(10, 0), (16, 0), (16, 6), (10, 6), (10, 0)],
])
DONUT2 = ("POLYGON", [
    [(0, 0), (20, 0), (20, 16), (0, 16), (0, 0)],
    [(3, 3), (7, 3), (7, 13), (3, 13), (3, 3)],
    [(13, 3), (17, 3), (17, 13), (13, 13), (13, 3)],
])


def box(x1, y1, x2, y2):
    return ("POLYGON", [[(x1, y1), (x2, y1), (x2, y2), (x1, y2), (x1, y1)]])


def pt(x, y):
    return ("POINT", [[(x, y)]])


def line(*pts):
    return ("LINESTRING", [list(pts)])


def mpt(*pts):
    return ("MULTIPOINT", [[p] for p in pts])


# (source, target, true relations of (source, target));
# 'disjoint' listed explicitly; everything absent is False.
TEMPLATES = [
    # -- donut: the hole is EXTERIOR even though the envelope covers it
    (DONUT, pt(8, 8), {"disjoint"}),                       # point in hole
    (DONUT, box(5, 5, 7, 7), {"disjoint"}),                # box in hole
    (DONUT, box(1, 1, 3, 3),                               # box in solid ring
     {"intersects", "contains", "covers"}),
    (DONUT, box(4, 4, 12, 12),                             # box == hole ring
     {"intersects", "touches"}),
    (DONUT, box(2, 6, 6, 10),                              # straddles hole edge
     {"intersects", "overlaps"}),
    (DONUT, DONUT,                                         # equal (with hole)
     {"intersects", "contains", "within", "covers", "coveredby", "equals"}),
    (DONUT, box(-2, -2, 18, 18),                           # target ⊃ donut
     {"intersects", "within", "coveredby"}),
    (DONUT, pt(4, 8), {"intersects", "touches", "covers"}),  # on hole boundary
    (DONUT, pt(8, 2), {"intersects", "contains", "covers"}),  # in solid
    (DONUT, line((8, -2), (8, 18)),                        # through solid+hole
     {"intersects", "crosses"}),
    (DONUT, line((0, 0), (16, 0)),                         # along outer edge
     {"intersects", "covers", "touches"}),
    (DONUT, box(16, 4, 20, 8), {"intersects", "touches"}),  # external touch
    # -- concave C: the notch is exterior inside the envelope
    (CSHAPE, box(6, 5, 10, 7), {"disjoint"}),              # box in notch
    (CSHAPE, box(2, 5, 6, 7), {"intersects", "overlaps"}),  # straddles wall
    (CSHAPE, line((2, -2), (2, 14)), {"intersects", "crosses"}),
    (CSHAPE, pt(8, 6), {"disjoint"}),                      # point in notch
    (CSHAPE, CSHAPE,
     {"intersects", "contains", "within", "covers", "coveredby", "equals"}),
    (CSHAPE, box(4, 4, 12, 8), {"intersects", "touches"}),  # notch closure
    # -- multipolygon: the gap is exterior inside the envelope
    (MPOLY, box(7, 2, 9, 4), {"disjoint"}),                # box in gap
    (MPOLY, box(4, 2, 12, 4), {"intersects", "overlaps"}),  # spans the gap
    (MPOLY, pt(12, 3), {"intersects", "contains", "covers"}),  # in 2nd part
    (MPOLY, box(11, 1, 15, 5),                             # box in 2nd part
     {"intersects", "contains", "covers"}),
    (MPOLY, ("MULTIPOLYGON", [
        [(1, 1), (5, 1), (5, 5), (1, 5), (1, 1)],
        [(11, 1), (15, 1), (15, 5), (11, 5), (11, 1)],
    ]), {"intersects", "contains", "covers"}),             # one in each part
    (MPOLY, box(6, 0, 10, 6), {"intersects", "touches"}),  # fills the gap
    # -- two holes
    (DONUT2, mpt((5, 8), (15, 8)), {"disjoint"}),          # one in each hole
    (DONUT2, mpt((10, 8), (5, 8)),                         # solid + hole mix
     {"intersects", "crosses"}),
    (DONUT2, line((1, 8), (19, 8)), {"intersects", "crosses"}),
    (DONUT2, box(3, 3, 7, 13), {"intersects", "touches"}),  # box == hole 1
]

RELS = ("intersects", "contains", "within", "covers", "coveredby",
        "equals", "touches", "overlaps", "crosses", "disjoint")


def shift(geom, dx):
    gtype, parts = geom
    return gtype, [[(x + dx, y) for x, y in part] for part in parts]


def wkt(geom):
    gtype, parts = geom

    def ring(part):
        return "(" + ", ".join(f"{x} {y}" for x, y in part) + ")"

    if gtype == "POINT":
        (x, y), = parts[0]
        return f"POINT ({x} {y})"
    if gtype == "LINESTRING":
        return "LINESTRING " + ring(parts[0])
    if gtype == "MULTIPOINT":
        return "MULTIPOINT (" + ", ".join(
            f"({p[0][0]} {p[0][1]})" for p in parts) + ")"
    if gtype == "POLYGON":
        return "POLYGON (" + ", ".join(ring(p) for p in parts) + ")"
    if gtype == "MULTIPOLYGON":
        return "MULTIPOLYGON (" + ", ".join(
            f"({ring(p)})" for p in parts) + ")"
    raise ValueError(gtype)


def env(geom):
    xs = [x for part in geom[1] for x, _ in part]
    ys = [y for part in geom[1] for _, y in part]
    return min(xs), min(ys), max(xs), max(ys)


def main() -> None:
    src_rows, tgt_rows = [], []
    for i, (src, tgt, rels) in enumerate(TEMPLATES):
        assert ("disjoint" in rels) != ("intersects" in rels), (i, rels)
        s, t = shift(src, i * CELL), shift(tgt, i * CELL)
        # within-cell envelopes must intersect (the adversarial premise)
        sx1, sy1, sx2, sy2 = env(s)
        tx1, ty1, tx2, ty2 = env(t)
        assert sx1 <= tx2 and tx1 <= sx2 and sy1 <= ty2 and ty1 <= sy2, i
        src_rows.append((i, wkt(s), 1, *env(s)))
        flags = [1 if r in rels else 0 for r in RELS]
        tgt_rows.append((1000 + i, wkt(t), 1, *env(t), *flags))
    n = len(TEMPLATES)
    # invalid rows exercise the validity filter inside this same chain:
    # the engine must drop them during ingest; the oracle filters valid=1
    src_rows.append((n, "POLYGON ((0 0, 1 0, 1 1))", 0, 0, 0, 0, 0))
    tgt_rows.append((1000 + n, wkt(shift(pt(8, 8), n * CELL)), 1,
                     *env(shift(pt(8, 8), n * CELL)),
                     *[0] * 9, 1))  # its source is invalid -> never joined
    src_rows.append((n + 1, wkt(shift(DONUT, (n + 1) * CELL)), 1,
                     *env(shift(DONUT, (n + 1) * CELL))))
    tgt_rows.append((1000 + n + 1, "LINESTRING (5)", 0, 0, 0, 0, 0,
                     *[0] * 10))  # invalid target in a valid source's cell

    with open(os.path.join(OUT_DIR, "wkt_holes_source.tsv"), "w") as f:
        f.write("id\twkt\tvalid\tminx\tminy\tmaxx\tmaxy\n")
        for r in src_rows:
            f.write("\t".join(str(v) for v in r) + "\n")
    with open(os.path.join(OUT_DIR, "wkt_holes_target.tsv"), "w") as f:
        f.write("id\twkt\tvalid\tminx\tminy\tmaxx\tmaxy\t"
                + "\t".join(f"f_{r}" for r in RELS) + "\n")
        for r in tgt_rows:
            f.write("\t".join(str(v) for v in r) + "\n")
    print(f"wrote {len(src_rows)} sources / {len(tgt_rows)} targets")


if __name__ == "__main__":
    main()
