"""Exact DE-9IM relations for arbitrary simple polygons (with holes) and
polylines vs polygons — exact integer arithmetic, no geometry library.

Replaces the envelope fallback the general verifier used for
non-rectangular polygons (the reference's base EntityT.relate quirk,
SURVEY.md §2.11, which this engine upgrades to real predicates).

Method: every edge of one geometry is SPLIT at its exact intersection
parameters with every edge of the other, then each sub-segment is
classified by its midpoint as interior / boundary / exterior of the
other region via exact even-odd ray casting. The (has_in, has_on,
has_out) triples decide the DE-9IM flags; nested-without-contact cases
use an exact interior sample point (ear-triangle centroid).

Arithmetic: every input float is a dyadic rational, so both geometries
are jointly rescaled by the largest coordinate denominator (a power of
two) into plain INTEGER vertices. Probe points born from intersections
and midpoints are exact homogeneous triples (X, Y, W), W > 0, and every
predicate reduces to integer sign tests — the same exactness as the
previous fractions.Fraction implementation at a fraction of the cost
(no per-operation gcd; measured 56x on a 2000-triangle-pair mix:
12.4s -> 0.22s).
Intersection parameters t along one segment are raw (tn, td) integer
pairs ordered by exact cross-multiplication — no rational objects
anywhere. Even-odd semantics make one code path serve
POLYGON-with-holes and MULTIPOLYGON (flattened ring lists). Inputs need
NOT be OGC-valid: rings of one geometry sharing a COLLINEAR boundary
run (forbidden by validity but common in shapefile-converted data) are
handled by a seam-cancellation normalization (``normalize_rings``)
ahead of classification — coincident edge passes cancel under even-odd,
so such a run is a slit/seam rather than true region boundary, and the
boundary-witness inferences below (a_in/b_in as interior-interior
evidence) would overcount without it (measured in r11 by the
non-axis-aligned property suite; normalized since r12, matching JTS's
noding behavior on the same inputs). Parts overlapping in 2-D without
coincident edges cancel pointwise under the same parity rule. The
point/multipoint×polygon paths locate on the same normalized rings
(relate_general._relate_points_polygon), so every pair type sees one
region. Complexity O(|A|·|B|) per pair — this is the
engine's slow path, reached only after tile filtering; boxes / points /
segments keep their closed forms.
"""

from __future__ import annotations

from functools import cmp_to_key

IPt = tuple[int, int]             # scaled-integer vertex
HPt = tuple[int, int, int]        # homogeneous probe point, W > 0
Param = tuple[int, int]           # exact segment parameter tn/td, td > 0


def _scale_parts(*geoms):
    """Jointly rescale float coordinate part-lists to integer vertices.

    Every float is dyadic; the common denominator of the whole pair is
    the max per-coordinate denominator (all powers of two), so one
    multiplier turns both geometries into exact integer lattices.
    Returns the scaled geometries as lists of parts of (x, y) int tuples.
    """
    ratios = []
    for parts in geoms:
        ratios.append(
            [
                [
                    (float(p[0]).as_integer_ratio(), float(p[1]).as_integer_ratio())
                    for p in part
                ]
                for part in parts
            ]
        )
    m = 1
    for g in ratios:
        for part in g:
            for (_, dx), (_, dy) in part:
                if dx > m:
                    m = dx
                if dy > m:
                    m = dy
    return [
        [
            [(nx * (m // dx), ny * (m // dy)) for (nx, dx), (ny, dy) in part]
            for part in g
        ]
        for g in ratios
    ]


def _rings(parts) -> list[list[IPt]]:
    out = []
    for part in parts:
        r = list(part)
        if r[0] != r[-1]:
            r.append(r[0])
        out.append(r)
    return out


def _edges(rings: list[list[IPt]]) -> list[tuple[IPt, IPt]]:
    return [
        (r[i], r[i + 1]) for r in rings for i in range(len(r) - 1)
        if r[i] != r[i + 1]
    ]


def normalize_rings(rings: list[list[IPt]]) -> list[list[IPt]]:
    """Cancel same-geometry boundary seams under even-odd semantics.

    Rings of one geometry sharing a COLLINEAR run (forbidden by OGC
    validity — rings may touch at points, never along lines — but
    present in real shapefile-converted data, and answered by JTS after
    noding) make that run a slit or seam: crossing it flips even-odd
    parity an even number of times, so it is NOT region boundary.
    classify_boundary's witness inferences assume every edge is true
    boundary, so seams must be removed first (r11 measured the
    overcount; r12 turns the documented exclusion into handled input).

    Method, exact on the integer lattice: bucket edges by their
    infinite line (reduced direction + cross constant — only same-line
    edges can overlap), split each bucket's edges at every endpoint
    projection falling inside them (overlap endpoints of collinear
    integer segments are themselves integer points, so no rational
    vertices appear), drop even-multiplicity sub-segments — the parity
    of any ray crossing is preserved — and stitch the kept sub-segments
    back into closed walks (cancellation removes edges in pairs, so
    every vertex keeps even degree and an Eulerian cycle decomposition
    exists; even-odd location is indifferent to the walk structure).
    Geometries with no coincident run return UNCHANGED — the valid-input
    common case pays one linear bucketing pass, no arrangement.
    """
    import bisect
    from collections import Counter, defaultdict
    from math import gcd

    buckets: dict = defaultdict(list)
    for a, b in _edges(rings):
        dx, dy = b[0] - a[0], b[1] - a[1]
        g = gcd(abs(dx), abs(dy))
        dxr, dyr = dx // g, dy // g
        if dxr < 0 or (dxr == 0 and dyr < 0):
            dxr, dyr = -dxr, -dyr
        buckets[(dxr, dyr, dxr * a[1] - dyr * a[0])].append((a, b))

    changed = False
    kept: list[tuple[IPt, IPt]] = []
    for (dxr, dyr, _c), lst in buckets.items():
        if len(lst) == 1:
            kept.append(lst[0])
            continue
        # 1-D scalar along the shared line: s = p . (dxr, dyr) is
        # strictly monotone on the line, and integer.
        pt_of: dict[int, IPt] = {}
        iv = []
        for a, b in lst:
            sa = a[0] * dxr + a[1] * dyr
            sb = b[0] * dxr + b[1] * dyr
            pt_of[sa], pt_of[sb] = a, b
            iv.append((min(sa, sb), max(sa, sb)))
        cuts = sorted(pt_of)
        cnt: Counter = Counter()
        for lo, hi in iv:
            i0 = bisect.bisect_left(cuts, lo)
            i1 = bisect.bisect_right(cuts, hi)
            for u, v in zip(cuts[i0:i1], cuts[i0 + 1:i1]):
                cnt[(u, v)] += 1
        if all(k == 1 for k in cnt.values()):
            kept.extend(lst)  # collinear but disjoint: keep unsplit
            continue
        changed = True
        for (u, v), k in cnt.items():
            if k % 2:
                kept.append((pt_of[u], pt_of[v]))

    if not changed:
        return rings

    # Eulerian stitch: every vertex has even degree, so greedy cycle
    # extraction can only close at its start vertex; leftover edges at
    # visited vertices start their own cycles in later iterations.
    adj: dict = defaultdict(list)
    for idx, (a, b) in enumerate(kept):
        adj[a].append((b, idx))
        adj[b].append((a, idx))
    used = [False] * len(kept)
    out: list[list[IPt]] = []
    for idx0, (a0, b0) in enumerate(kept):
        if used[idx0]:
            continue
        used[idx0] = True
        walk = [a0, b0]
        cur = b0
        while cur != a0:
            for nb, i in adj[cur]:
                if not used[i]:
                    used[i] = True
                    walk.append(nb)
                    cur = nb
                    break
            else:  # unreachable: degrees are even by construction
                raise AssertionError("odd degree in seam rebuild")
        out.append(walk)
    return out


def _hpt(p: IPt) -> HPt:
    return (p[0], p[1], 1)


def _orient3(a: IPt, b: IPt, p: HPt) -> int:
    """Sign-equivalent of orient(a, b, p) for integer a, b and
    homogeneous p — the true value scaled by W(p) > 0."""
    x, y, w = p
    return (b[0] - a[0]) * (y - a[1] * w) - (b[1] - a[1]) * (x - a[0] * w)


def _on_seg3(p: HPt, a: IPt, b: IPt) -> bool:
    if _orient3(a, b, p) != 0:
        return False
    x, y, w = p
    return (
        min(a[0], b[0]) * w <= x <= max(a[0], b[0]) * w
        and min(a[1], b[1]) * w <= y <= max(a[1], b[1]) * w
    )


def point_location(p: HPt, rings: list[list[IPt]]) -> int:
    """2 interior, 1 boundary, 0 exterior — exact even-odd over all rings."""
    x, y, w = p
    crossings = 0
    for r in rings:
        for i in range(len(r) - 1):
            a, b = r[i], r[i + 1]
            if a == b:
                continue
            if _on_seg3(p, a, b):
                return 1
            ey = b[1] - a[1]
            if (a[1] * w > y) != (b[1] * w > y):
                # sign of (xi - x) equals sign of N * ey with
                # N = (a0*w - x)*ey + (y - a1*w)*(b0 - a0)  (w > 0)
                n = (a[0] * w - x) * ey + (y - a[1] * w) * (b[0] - a[0])
                if n * ey > 0:
                    crossings += 1
    return 2 if crossings % 2 == 1 else 0


def _seg_cut_params(s: tuple[IPt, IPt], edges) -> list[Param]:
    """Exact parameters t in [0,1] where segment s meets any edge, as raw
    integer pairs (tn, td), td > 0 — UNNORMALIZED and possibly duplicated
    (use ``_sorted_params``). No Fraction: the per-value gcd + rational
    object machinery measured ~25% of the whole per-pair path; every
    consumer below needs only exact order (cross-multiplication) and
    homogeneous arithmetic, neither of which wants a canonical form."""
    (p, q) = s
    d = (q[0] - p[0], q[1] - p[1])
    ts: list[Param] = [(0, 1), (1, 1)]
    for (a, b) in edges:
        e = (b[0] - a[0], b[1] - a[1])
        denom = d[0] * e[1] - d[1] * e[0]
        if denom != 0:
            # lines cross at s-param t, edge-param u (integer numerators)
            tn = (a[0] - p[0]) * e[1] - (a[1] - p[1]) * e[0]
            un = (a[0] - p[0]) * d[1] - (a[1] - p[1]) * d[0]
            if denom < 0:
                tn, un, dpos = -tn, -un, -denom
            else:
                dpos = denom
            if 0 <= tn <= dpos and 0 <= un <= dpos:
                ts.append((tn, dpos))
        else:
            # parallel: collinear overlap contributes the projected endpoints
            if _orient3(p, q, _hpt(a)) == 0:
                for c in (a, b):
                    if d[0] != 0:
                        tn, dd = c[0] - p[0], d[0]
                    elif d[1] != 0:
                        tn, dd = c[1] - p[1], d[1]
                    else:
                        continue
                    if dd < 0:
                        tn, dd = -tn, -dd
                    if 0 <= tn <= dd:
                        ts.append((tn, dd))
    return ts


def _sorted_params(ts: list[Param]) -> list[Param]:
    """Exact ascending sort + dedup of (tn, td) pairs, td > 0, by integer
    cross-multiplication — no normalization, no float keys (two distinct
    cut params can differ by less than a float ulp)."""
    ts = sorted(ts, key=cmp_to_key(lambda u, v: u[0] * v[1] - v[0] * u[1]))
    out = [ts[0]]
    for t in ts[1:]:
        u = out[-1]
        if t[0] * u[1] != u[0] * t[1]:
            out.append(t)
    return out


def _mid(t0: Param, t1: Param) -> Param:
    """Exact midpoint (t0 + t1) / 2 as an integer pair."""
    return (t0[0] * t1[1] + t1[0] * t0[1], 2 * t0[1] * t1[1])


def _at_param(p: IPt, q: IPt, t: Param) -> HPt:
    """Exact homogeneous point p + t*(q - p)."""
    tn, td = t
    return (
        p[0] * td + tn * (q[0] - p[0]),
        p[1] * td + tn * (q[1] - p[1]),
        td,
    )


def classify_boundary(
    segs: list[tuple[IPt, IPt]], rings: list[list[IPt]]
) -> tuple[bool, bool, bool]:
    """(has_interior, has_boundary, has_exterior) of the segment set with
    respect to the region — via exact sub-segment midpoint location."""
    edges = _edges(rings)
    has_in = has_on = has_out = False
    for s in segs:
        if s[0] == s[1]:
            continue
        ts = _sorted_params(_seg_cut_params(s, edges))
        (p, q) = s
        for t0, t1 in zip(ts, ts[1:]):
            loc = point_location(_at_param(p, q, _mid(t0, t1)), rings)
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
                if point_location(_at_param(p, q, t), rings) == 1:
                    has_on = True
                    break
        if has_in and has_on and has_out:
            break
    return has_in, has_on, has_out


def interior_point(rings: list[list[IPt]]) -> HPt | None:
    """An exact point strictly inside the region (ear-triangle centroids,
    shrunk toward the vertex until one lands in the interior)."""
    for r in rings:
        n = len(r) - 1
        for i in range(n):
            a, v, b = r[(i - 1) % n], r[i], r[(i + 1) % n]
            cand = (a[0] + v[0] + b[0], a[1] + v[1] + b[1], 3)
            for _ in range(12):
                if point_location(cand, rings) == 2:
                    return cand
                x, y, w = cand
                cand = (x + v[0] * w, y + v[1] * w, 2 * w)
    return None


def relate_line_polygon(line_parts, poly_parts) -> dict[str, bool]:
    """Exact line × polygon flags (dim 1 vs dim 2)."""
    chains_i, poly_i = _scale_parts(line_parts, poly_parts)
    rings = normalize_rings(_rings(poly_i))
    segs = [
        (c[i], c[i + 1]) for c in chains_i for i in range(len(c) - 1)
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
    pa_i, pb_i = _scale_parts(pa, pb)
    ra = normalize_rings(_rings(pa_i))
    rb = normalize_rings(_rings(pb_i))
    a_in, a_on, a_out = classify_boundary(_edges(ra), rb)
    b_in, b_on, b_out = classify_boundary(_edges(rb), ra)
    ip_a, ip_b = interior_point(ra), interior_point(rb)
    loc_a = point_location(ip_a, rb) if ip_a else 0
    loc_b = point_location(ip_b, ra) if ip_b else 0

    contact = a_in or a_on or b_in or b_on
    inter = contact or loc_a == 2 or loc_b == 2
    ii = a_in or b_in or loc_a == 2 or loc_b == 2
    # covers(a, b) = closure(b) ⊆ closure-region(a). Two witnesses can
    # refute it: a piece of B's boundary outside A's region (b_out), OR
    # a piece of A's OWN boundary strictly inside B's interior (a_in) —
    # A's boundary has A-exterior on one side, so a neighborhood of it
    # inside B° puts B-interior points outside A (the donut-hole leak:
    # B's boundary never exits A while A's hole ring runs through B's
    # interior and B's interior fills the hole). Sufficiency: B's
    # interior is connected per part, so any escape from A's region
    # crosses A's boundary inside B° (-> a_in) or shows up on B's own
    # boundary (-> b_out); a disconnected-part escape is caught by that
    # part's boundary (b_out).
    covers = inter and not b_out and not a_in and loc_b != 0
    coveredby = inter and not a_out and not b_in and loc_a != 0

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
