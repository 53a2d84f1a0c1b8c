"""DE-9IM relations for line segments vs boxes — exact closed forms.

Extends the box/point algebra (operators/relate.py) with the line
dimension, so CROSSES has real support (the reference evaluates it via
JTS relate; model/IM.scala:13).

Exactness argument (separating-axis theorem for a segment vs an axis-
aligned box): the only candidate separating axes are the two box normals
(covered by the bbox-overlap test) and the segment normal (covered by the
signs of the corner cross-products f(c) = dx*(cy-y1) - dy*(cx-x1)).
Therefore, with S the closed segment and B the closed box:

    intersects  =  bbox_overlap AND min_f <= 0 <= max_f
    interiors   =  strict bbox_overlap AND min_f < 0 < max_f
    coveredBy   =  both endpoints inside the closed box
    within      =  coveredBy AND interiors-intersect
    crosses     =  interiors-intersect AND NOT coveredBy   (line vs area)
    touches     =  intersects AND NOT interiors-intersect
    contains / equals / overlaps = false (dimension mismatch)

All terms are products/comparisons of lattice coordinates (exact doubles),
so the same text evaluates identically in Spark and DuckDB.

Segment columns: {s}x1,{s}y1,{s}x2,{s}y2 (+ envelope {s}minx..{s}maxy);
box columns: {t}minx..{t}maxy.
"""

from __future__ import annotations

LINE_RELATIONS = ("intersects", "crosses", "touches", "within", "coveredby", "disjoint")


def seg_box_predicates(s: str = "s_", t: str = "t_") -> dict[str, str]:
    x1, y1, x2, y2 = f"{s}x1", f"{s}y1", f"{s}x2", f"{s}y2"
    sminx, sminy = f"{s}minx", f"{s}miny"
    smaxx, smaxy = f"{s}maxx", f"{s}maxy"
    bx1, by1, bx2, by2 = f"{t}minx", f"{t}miny", f"{t}maxx", f"{t}maxy"

    dx, dy = f"({x2} - {x1})", f"({y2} - {y1})"

    def corner_f(cx: str, cy: str) -> str:
        return f"({dx} * ({cy} - {y1}) - {dy} * ({cx} - {x1}))"

    fs = [
        corner_f(bx1, by1),
        corner_f(bx2, by1),
        corner_f(bx1, by2),
        corner_f(bx2, by2),
    ]
    fmin = f"least({', '.join(fs)})"
    fmax = f"greatest({', '.join(fs)})"

    bbox = (
        f"({sminx} <= {bx2} AND {bx1} <= {smaxx} AND {sminy} <= {by2} AND {by1} <= {smaxy})"
    )
    strict_bbox = (
        f"({sminx} < {bx2} AND {bx1} < {smaxx} AND {sminy} < {by2} AND {by1} < {smaxy})"
    )

    intersects = f"({bbox} AND {fmin} <= 0 AND {fmax} >= 0)"
    ii = f"({strict_bbox} AND {fmin} < 0 AND {fmax} > 0)"
    coveredby = (
        f"({x1} >= {bx1} AND {x1} <= {bx2} AND {y1} >= {by1} AND {y1} <= {by2} AND "
        f"{x2} >= {bx1} AND {x2} <= {bx2} AND {y2} >= {by1} AND {y2} <= {by2})"
    )

    return {
        "intersects": intersects,
        "ii": ii,
        "coveredby": coveredby,
        "within": f"({coveredby} AND {ii})",
        "crosses": f"({ii} AND NOT {coveredby})",
        "touches": f"({intersects} AND NOT {ii})",
        "disjoint": f"(NOT {intersects})",
    }
