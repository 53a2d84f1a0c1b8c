"""Exact DE-9IM relations for arbitrary simple polygons (with holes) and
polylines vs polygons — rational arithmetic, no geometry library.

Replaces the envelope fallback the general verifier used for
non-rectangular polygons (the reference's base EntityT.relate quirk,
SURVEY.md §2.11, which this engine upgrades to real predicates).

Method: every edge of one geometry is SPLIT at its exact intersection
parameters with every edge of the other (fractions.Fraction — no float
error), then each sub-segment is classified by its midpoint as
interior / boundary / exterior of the other region via exact even-odd
ray casting. The (has_in, has_on, has_out) triples decide the DE-9IM
flags; nested-without-contact cases use an exact interior sample point
(ear-triangle centroid).

Even-odd semantics make one code path serve POLYGON-with-holes and
MULTIPOLYGON (flattened ring lists, standard validity assumed).
Complexity O(|A|·|B|) per pair — this is the engine's slow path, reached
only after tile filtering; boxes/points/segments keep their closed forms.
"""

from __future__ import annotations

from fractions import Fraction

FPt = tuple[Fraction, Fraction]


def _fpt(p) -> FPt:
    return (Fraction(float(p[0])), Fraction(float(p[1])))


def _rings(parts) -> list[list[FPt]]:
    out = []
    for part in parts:
        r = [_fpt(p) for p in part]
        if r[0] != r[-1]:
            r.append(r[0])
        out.append(r)
    return out


def _chains(parts) -> list[list[FPt]]:
    return [[_fpt(p) for p in part] for part in parts]


def _edges(rings: list[list[FPt]]) -> list[tuple[FPt, FPt]]:
    return [
        (r[i], r[i + 1]) for r in rings for i in range(len(r) - 1)
        if r[i] != r[i + 1]
    ]


def _orient(a: FPt, b: FPt, c: FPt) -> Fraction:
    return (b[0] - a[0]) * (c[1] - a[1]) - (b[1] - a[1]) * (c[0] - a[0])


def _on_seg(p: FPt, a: FPt, b: FPt) -> bool:
    if _orient(a, b, p) != 0:
        return False
    return (
        min(a[0], b[0]) <= p[0] <= max(a[0], b[0])
        and min(a[1], b[1]) <= p[1] <= max(a[1], b[1])
    )


def point_location(p: FPt, rings: list[list[FPt]]) -> int:
    """2 interior, 1 boundary, 0 exterior — exact even-odd over all rings."""
    x, y = p
    crossings = 0
    for r in rings:
        for i in range(len(r) - 1):
            a, b = r[i], r[i + 1]
            if a == b:
                continue
            if _on_seg(p, a, b):
                return 1
            if (a[1] > y) != (b[1] > y):
                # x-coordinate of the edge at height y, exactly
                xi = a[0] + (y - a[1]) * (b[0] - a[0]) / (b[1] - a[1])
                if xi > x:
                    crossings += 1
    return 2 if crossings % 2 == 1 else 0


def _seg_cut_params(s: tuple[FPt, FPt], edges) -> set[Fraction]:
    """Exact parameters t in [0,1] where segment s meets any edge."""
    (p, q) = s
    d = (q[0] - p[0], q[1] - p[1])
    ts: set[Fraction] = {Fraction(0), Fraction(1)}
    for (a, b) in edges:
        e = (b[0] - a[0], b[1] - a[1])
        denom = d[0] * e[1] - d[1] * e[0]
        if denom != 0:
            # lines cross at s-param t, edge-param u
            t = ((a[0] - p[0]) * e[1] - (a[1] - p[1]) * e[0]) / denom
            u = ((a[0] - p[0]) * d[1] - (a[1] - p[1]) * d[0]) / denom
            if 0 <= t <= 1 and 0 <= u <= 1:
                ts.add(t)
        else:
            # parallel: collinear overlap contributes the projected endpoints
            if _orient(p, q, a) == 0:
                for c in (a, b):
                    if d[0] != 0:
                        t = (c[0] - p[0]) / d[0]
                    elif d[1] != 0:
                        t = (c[1] - p[1]) / d[1]
                    else:
                        continue
                    if 0 <= t <= 1:
                        ts.add(t)
    return ts


def classify_boundary(
    segs: list[tuple[FPt, FPt]], rings: list[list[FPt]]
) -> tuple[bool, bool, bool]:
    """(has_interior, has_boundary, has_exterior) of the segment set with
    respect to the region — via exact sub-segment midpoint location."""
    edges = _edges(rings)
    has_in = has_on = has_out = False
    for s in segs:
        if s[0] == s[1]:
            continue
        ts = sorted(_seg_cut_params(s, edges))
        (p, q) = s
        for t0, t1 in zip(ts, ts[1:]):
            if t0 == t1:
                continue
            tm = (t0 + t1) / 2
            m = (p[0] + (q[0] - p[0]) * tm, p[1] + (q[1] - p[1]) * tm)
            loc = point_location(m, rings)
            if loc == 2:
                has_in = True
            elif loc == 1:
                has_on = True
            else:
                has_out = True
        if not has_on:
            # Point contacts (vertex touches) live at the cut params
            # themselves, between sub-segments — midpoints miss them.
            for t in ts:
                c = (p[0] + (q[0] - p[0]) * t, p[1] + (q[1] - p[1]) * t)
                if point_location(c, rings) == 1:
                    has_on = True
                    break
        if has_in and has_on and has_out:
            break
    return has_in, has_on, has_out


def interior_point(rings: list[list[FPt]]) -> FPt | None:
    """An exact point strictly inside the region (ear-triangle centroids,
    shrunk toward the vertex until one lands in the interior)."""
    for r in rings:
        n = len(r) - 1
        for i in range(n):
            a, v, b = r[(i - 1) % n], r[i], r[(i + 1) % n]
            cand = ((a[0] + v[0] + b[0]) / 3, (a[1] + v[1] + b[1]) / 3)
            for _ in range(12):
                if point_location(cand, rings) == 2:
                    return cand
                cand = ((cand[0] + v[0]) / 2, (cand[1] + v[1]) / 2)
    return None


def relate_line_polygon(line_parts, poly_parts) -> dict[str, bool]:
    """Exact line × polygon flags (dim 1 vs dim 2)."""
    rings = _rings(poly_parts)
    chains = _chains(line_parts)
    segs = [
        (c[i], c[i + 1]) for c in chains for i in range(len(c) - 1)
    ]
    has_in, has_on, has_out = classify_boundary(segs, rings)
    d = {k: False for k in _ALL}
    inter = has_in or has_on
    d["intersects"] = inter
    d["coveredby"] = inter and not has_out
    d["within"] = d["coveredby"] and has_in
    d["crosses"] = has_in and has_out
    d["touches"] = inter and not has_in
    d["disjoint"] = not inter
    return d


def relate_polygon_polygon(pa, pb) -> dict[str, bool]:
    """Exact polygon × polygon flags (simple polygons w/ holes, multi)."""
    ra, rb = _rings(pa), _rings(pb)
    a_in, a_on, a_out = classify_boundary(_edges(ra), rb)
    b_in, b_on, b_out = classify_boundary(_edges(rb), ra)
    ip_a, ip_b = interior_point(ra), interior_point(rb)
    loc_a = point_location(ip_a, rb) if ip_a else 0
    loc_b = point_location(ip_b, ra) if ip_b else 0

    contact = a_in or a_on or b_in or b_on
    inter = contact or loc_a == 2 or loc_b == 2
    ii = a_in or b_in or loc_a == 2 or loc_b == 2
    covers = inter and not b_out and loc_b != 0
    coveredby = inter and not a_out and loc_a != 0

    d = {k: False for k in _ALL}
    d["intersects"] = inter
    d["disjoint"] = not inter
    d["covers"] = covers
    d["coveredby"] = coveredby
    d["contains"] = covers and ii
    d["within"] = coveredby and ii
    d["equals"] = covers and coveredby
    d["touches"] = inter and not ii
    d["overlaps"] = ii and not covers and not coveredby
    return d


_ALL = (
    "intersects", "contains", "within", "covers", "coveredby",
    "equals", "touches", "overlaps", "crosses", "disjoint",
)
