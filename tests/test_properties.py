"""Property-based tests (hypothesis): WKT round-trip and the internal
consistency laws of the DE-9IM predicate algebra on random lattice boxes."""

from hypothesis import given, settings, strategies as st

from ds_jedai_spark.model.geometry import format_wkt, parse_wkt
from ds_jedai_spark.operators.relate_general import relate_pair
from conftest import fuzz_examples

lattice = st.integers(min_value=-50, max_value=50).map(lambda v: v / 16.0)


@st.composite
def boxes(draw):
    x1, x2 = sorted((draw(lattice), draw(lattice)))
    y1, y2 = sorted((draw(lattice), draw(lattice)))
    if x1 == x2:
        x2 = x1 + 1 / 16.0
    if y1 == y2:
        y2 = y1 + 1 / 16.0
    ring = [[x1, y1], [x2, y1], [x2, y2], [x1, y2], [x1, y1]]
    return [ring]


@st.composite
def points(draw):
    return [[[draw(lattice), draw(lattice)]]]


@given(boxes())
@settings(max_examples=fuzz_examples(200), deadline=None)
def test_wkt_roundtrip_polygon(parts):
    w = format_wkt("POLYGON", parts)
    parsed = parse_wkt(w)
    assert parsed is not None
    gtype, back = parsed
    assert gtype == "POLYGON" and back == parts


@given(points())
@settings(max_examples=fuzz_examples(100), deadline=None)
def test_wkt_roundtrip_point(parts):
    parsed = parse_wkt(format_wkt("POINT", parts))
    assert parsed is not None and parsed[1] == parts


@given(boxes(), boxes())
@settings(max_examples=fuzz_examples(300), deadline=None)
def test_relation_algebra_laws(a, b):
    ab = relate_pair("POLYGON", a, "POLYGON", b)
    ba = relate_pair("POLYGON", b, "POLYGON", a)
    # symmetry of symmetric relations
    for r in ("intersects", "equals", "touches", "overlaps", "disjoint"):
        assert ab[r] == ba[r], r
    # converse pairs
    assert ab["within"] == ba["contains"]
    assert ab["coveredby"] == ba["covers"]
    # implications
    if ab["contains"]:
        assert ab["covers"]
    if ab["within"]:
        assert ab["coveredby"]
    if ab["equals"]:
        assert ab["covers"] and ab["coveredby"] and ab["intersects"]
    # exclusivity / totality
    assert ab["disjoint"] != ab["intersects"]
    if ab["touches"]:
        assert ab["intersects"] and not ab["overlaps"] and not ab["equals"]
    if ab["overlaps"]:
        assert ab["intersects"] and not ab["covers"] and not ab["coveredby"]


@given(points(), boxes())
@settings(max_examples=fuzz_examples(200), deadline=None)
def test_point_box_laws(p, b):
    pb = relate_pair("POINT", p, "POLYGON", b)
    bp = relate_pair("POLYGON", b, "POINT", p)
    assert pb["intersects"] == bp["intersects"]
    assert pb["within"] == bp["contains"]
    # a point can never overlap (dim mismatch) nor cover a box
    assert not pb["overlaps"] and not pb["covers"]
    if pb["intersects"]:
        assert pb["coveredby"]  # point in closed box is covered


@st.composite
def polylines(draw):
    """1-3 lattice segments, possibly sharing endpoints (a MULTILINESTRING
    parts list); degenerate zero-length segments excluded."""
    n = draw(st.integers(min_value=1, max_value=3))
    parts = []
    for _ in range(n):
        a = (draw(lattice), draw(lattice))
        b = (draw(lattice), draw(lattice))
        if a == b:
            b = (b[0] + 1 / 16.0, b[1])
        parts.append([list(a), list(b)])
    return parts


@given(polylines(), polylines())
@settings(max_examples=fuzz_examples(300), deadline=None)
def test_line_line_algebra_laws(pa, pb):
    """Internal consistency of the exact line-line path (rational
    sub-segment coverage): argument-swap duality, symmetry of the
    symmetric relations, and the subsumption ladder."""
    ab = relate_pair("MULTILINESTRING", pa, "MULTILINESTRING", pb)
    ba = relate_pair("MULTILINESTRING", pb, "MULTILINESTRING", pa)
    for sym in ("intersects", "disjoint", "equals", "touches", "overlaps", "crosses"):
        assert ab[sym] == ba[sym], (sym, pa, pb)
    assert ab["within"] == ba["contains"] and ab["contains"] == ba["within"]
    assert ab["coveredby"] == ba["covers"] and ab["covers"] == ba["coveredby"]
    assert ab["disjoint"] != ab["intersects"]
    if ab["within"]:
        assert ab["coveredby"]
    if ab["contains"]:
        assert ab["covers"]
    if ab["equals"]:
        assert ab["coveredby"] and ab["covers"]
    if ab["touches"]:
        assert ab["intersects"] and not ab["within"] and not ab["overlaps"]
    for r in ("equals", "touches", "overlaps", "crosses", "within", "contains"):
        if ab[r]:
            assert ab["intersects"], (r, pa, pb)


@st.composite
def triangles(draw):
    from hypothesis import assume

    pts = [(draw(lattice), draw(lattice)) for _ in range(3)]
    area2 = (pts[1][0] - pts[0][0]) * (pts[2][1] - pts[0][1]) - (
        pts[1][1] - pts[0][1]
    ) * (pts[2][0] - pts[0][0])
    assume(area2 != 0)
    ring = [list(p) for p in pts] + [list(pts[0])]
    return [ring]


@given(triangles(), triangles())
@settings(max_examples=fuzz_examples(200), deadline=None)
def test_polygon_polygon_algebra_laws(pa, pb):
    """Same consistency laws through the rational-arithmetic
    polygon-polygon path (relate_poly)."""
    ab = relate_pair("POLYGON", pa, "POLYGON", pb)
    ba = relate_pair("POLYGON", pb, "POLYGON", pa)
    for sym in ("intersects", "disjoint", "equals", "touches", "overlaps", "crosses"):
        assert ab[sym] == ba[sym], (sym, pa, pb)
    assert ab["within"] == ba["contains"] and ab["covers"] == ba["coveredby"]
    assert ab["disjoint"] != ab["intersects"]
    if ab["within"]:
        assert ab["coveredby"]
    if ab["equals"]:
        assert ab["coveredby"] and ab["covers"] and ab["within"] and ab["contains"]
    if ab["touches"]:
        assert ab["intersects"] and not ab["overlaps"] and not ab["within"]
    assert not ab["crosses"]  # equal-dimension area pairs can never cross
    for r in ("equals", "touches", "overlaps", "within", "contains"):
        if ab[r]:
            assert ab["intersects"], (r, pa, pb)


@given(polylines(), triangles())
@settings(max_examples=fuzz_examples(200), deadline=None)
def test_line_polygon_algebra_laws(pl, tri):
    """Mixed-dimension laws through the rational line-polygon classifier:
    swap duality, dimension constraints (a 1-D geometry can never
    contain/cover a 2-D region; equals is impossible), and subsumption."""
    ab = relate_pair("MULTILINESTRING", pl, "POLYGON", tri)
    ba = relate_pair("POLYGON", tri, "MULTILINESTRING", pl)
    for sym in ("intersects", "disjoint", "touches", "overlaps", "crosses", "equals"):
        assert ab[sym] == ba[sym], (sym, pl, tri)
    assert ab["within"] == ba["contains"] and ab["coveredby"] == ba["covers"]
    assert ab["disjoint"] != ab["intersects"]
    assert not ab["equals"] and not ab["overlaps"]  # dim(a) != dim(b)
    assert not ab["contains"] and not ab["covers"]  # 1-D cannot cover 2-D
    if ab["within"]:
        assert ab["coveredby"]
    if ab["touches"]:
        assert ab["intersects"] and not ab["within"] and not ab["crosses"]
    for r in ("touches", "crosses", "within", "coveredby"):
        if ab[r]:
            assert ab["intersects"], (r, pl, tri)


@given(
    st.integers(min_value=0, max_value=500),
    st.integers(min_value=2, max_value=64),
    st.data(),
)
@settings(max_examples=fuzz_examples(300), deadline=None)
def test_chunk_schedule_laws(n, chunk, data):
    """The closed-form chunk schedule of textops.chunk_documents (same
    integer formulas, driver-side): chunks tile [0, n) with no gaps,
    consecutive starts differ by exactly stride, every non-last chunk is
    full-size, and the forced single chunk of an empty doc is empty."""
    overlap = data.draw(st.integers(min_value=0, max_value=chunk - 1))
    stride = chunk - overlap
    nch = max(1, (n - overlap + stride - 1) // stride)
    chunks = [
        (i * stride, min(i * stride + chunk, n)) for i in range(nch)
    ]
    covered = set()
    for s, e in chunks:
        covered.update(range(s, e))
    assert covered == set(range(n))
    assert all(
        b - a == stride
        for (a, _), (b, _) in zip(chunks, chunks[1:])
    )
    for s, e in chunks[:-1]:
        assert e - s == chunk
    if n == 0:
        assert chunks == [(0, 0)]


@st.composite
def donuts(draw):
    """Axis-aligned donut: outer lattice rect + a hole strictly inside.
    Returns (parts, outer, hole) with rects as (x1, y1, x2, y2)."""
    x1 = draw(st.integers(-40, 20)) / 16.0
    y1 = draw(st.integers(-40, 20)) / 16.0
    w = draw(st.integers(4, 24)) / 16.0
    h = draw(st.integers(4, 24)) / 16.0
    x2, y2 = x1 + w, y1 + h
    hx1 = x1 + draw(st.integers(1, int(w * 16) - 2)) / 16.0
    hy1 = y1 + draw(st.integers(1, int(h * 16) - 2)) / 16.0
    hx2 = hx1 + draw(st.integers(1, int((x2 - hx1) * 16) - 1)) / 16.0
    hy2 = hy1 + draw(st.integers(1, int((y2 - hy1) * 16) - 1)) / 16.0
    parts = [
        [[x1, y1], [x2, y1], [x2, y2], [x1, y2], [x1, y1]],
        [[hx1, hy1], [hx2, hy1], [hx2, hy2], [hx1, hy2], [hx1, hy1]],
    ]
    return parts, (x1, y1, x2, y2), (hx1, hy1, hx2, hy2)


def _rect_loc(p, rect):
    """2 interior / 1 boundary / 0 exterior of a closed rect — pure
    interval comparison, no ray casting (independent of the engine)."""
    x, y = p
    x1, y1, x2, y2 = rect
    if not (x1 <= x <= x2 and y1 <= y <= y2):
        return 0
    if x in (x1, x2) or y in (y1, y2):
        return 1
    return 2


@given(donuts(), points())
@settings(max_examples=fuzz_examples(300), deadline=None)
def test_point_vs_donut_matches_interval_algebra(donut, pt):
    """POLYGON-with-hole vs POINT across the whole lattice space: the
    engine's region classification must equal the interval-algebra
    truth (interior = inside outer AND strictly outside hole; boundary
    = on either ring; the hole's inside is EXTERIOR)."""
    parts, outer, hole = donut
    p = tuple(pt[0][0])
    lo, lh = _rect_loc(p, outer), _rect_loc(p, hole)
    if lo in (0, 1):
        want = lo                      # outer ring decides
    elif lh == 1:
        want = 1                       # on the hole ring
    elif lh == 2:
        want = 0                       # inside the hole: exterior
    else:
        want = 2
    d = relate_pair("POLYGON", parts, "POINT", pt)
    assert d["contains"] == (want == 2)
    assert d["touches"] == (want == 1)
    assert d["covers"] == (want in (1, 2))
    assert d["disjoint"] == (want == 0)
    assert d["intersects"] == (want != 0)


@given(donuts(), donuts(), points())
@settings(max_examples=fuzz_examples(300), deadline=None)
def test_point_vs_multipolygon_matches_interval_algebra(d1, d2, pt):
    """MULTIPOLYGON (two independent donut parts, arbitrary relative
    placement — may overlap, under even-odd the overlap is exterior) vs
    POINT: engine == interval-algebra truth via NEIGHBORHOOD even-odd
    parity. The two donuts may share collinear ring runs (up to being
    identical); under even-odd those seams cancel (r12
    seam-normalization), so the truth is derived from the REGION, not
    the raw rings: sample the strict-containment parity in the four
    quadrants around p (all lattice coordinates are multiples of 1/16,
    so a 2^-20 offset stays inside p's arrangement cell and every
    comparison is exact float arithmetic) — interior iff all four
    parities are odd, exterior iff all even, boundary otherwise."""
    parts = d1[0] + d2[0]
    p = tuple(pt[0][0])
    rects = [d1[1], d1[2], d2[1], d2[2]]

    def par(q):
        return sum(
            1 for (x1, y1, x2, y2) in rects
            if x1 < q[0] < x2 and y1 < q[1] < y2
        ) % 2

    eps = 2.0 ** -20
    quad = [par((p[0] + sx * eps, p[1] + sy * eps))
            for sx in (-1, 1) for sy in (-1, 1)]
    if all(v == 1 for v in quad):
        want = 2
    elif all(v == 0 for v in quad):
        want = 0
    else:
        want = 1
    d = relate_pair("MULTIPOLYGON", parts, "POINT", pt)
    assert d["contains"] == (want == 2)
    assert d["touches"] == (want == 1)
    assert d["covers"] == (want in (1, 2))
    assert d["disjoint"] == (want == 0)
    assert d["intersects"] == (want != 0)


def _rects_strict_overlap(a, b):
    """Open-interior intersection of two rects (strict interval overlap)."""
    ax1, ay1, ax2, ay2 = a
    bx1, by1, bx2, by2 = b
    return ax1 < bx2 and bx1 < ax2 and ay1 < by2 and by1 < ay2


def _rects_touch_or_overlap(a, b):
    ax1, ay1, ax2, ay2 = a
    bx1, by1, bx2, by2 = b
    return ax1 <= bx2 and bx1 <= ax2 and ay1 <= by2 and by1 <= ay2


def _rect_inside(a, b):
    """Closed rect a within closed rect b."""
    ax1, ay1, ax2, ay2 = a
    bx1, by1, bx2, by2 = b
    return bx1 <= ax1 and ax2 <= bx2 and by1 <= ay1 and ay2 <= by2


def _donut_rect_flags(outer, hole, t):
    r"""Independent DE-9IM of (donut s, rect t) by pure interval algebra:
    s interior = outer° \ closure(hole), s closure = closure(outer) \
    hole°. No ray casting, no segment classification."""
    tx1, ty1, tx2, ty2 = t
    ox1, oy1, ox2, oy2 = outer
    # t° ∩ s° nonempty: the open rect R = t° ∩ outer° exists and is not
    # entirely inside closure(hole) (a rect R inside the closed hole has
    # its bounds within the hole's bounds)
    ii = False
    if _rects_strict_overlap(t, outer):
        r = (max(tx1, ox1), max(ty1, oy1), min(tx2, ox2), min(ty2, oy2))
        ii = not _rect_inside(r, hole)
    # closure ∩ closure: C = t̄ ∩ outer̄ nonempty and not entirely inside
    # the OPEN hole
    inter = False
    if _rects_touch_or_overlap(t, outer):
        c = (max(tx1, ox1), max(ty1, oy1), min(tx2, ox2), min(ty2, oy2))
        hx1, hy1, hx2, hy2 = hole
        c_in_open_hole = (hx1 < c[0] and c[2] < hx2
                          and hy1 < c[1] and c[3] < hy2)
        inter = not c_in_open_hole
    # covers(s, t): t̄ ⊆ outer̄ and t̄ misses the open hole
    covers = _rect_inside(t, outer) and not _rects_strict_overlap(t, hole)
    # coveredby(s, t): closure(s) ⊆ t̄ — a rect containing the annulus
    # closure must contain outer's corners, hence all of outer̄
    coveredby = _rect_inside(outer, t)
    d = {
        "intersects": inter,
        "disjoint": not inter,
        "covers": covers,
        "coveredby": coveredby,
        "contains": covers and ii,
        "within": coveredby and ii,
        "equals": covers and coveredby,
        "touches": inter and not ii,
        "overlaps": ii and not covers and not coveredby,
        "crosses": False,
    }
    return d


@st.composite
def rects(draw):
    x1 = draw(st.integers(-48, 44)) / 16.0
    y1 = draw(st.integers(-48, 44)) / 16.0
    w = draw(st.integers(1, 40)) / 16.0
    h = draw(st.integers(1, 40)) / 16.0
    return (x1, y1, x1 + w, y1 + h)


def _rect_parts(r):
    x1, y1, x2, y2 = r
    return [[[x1, y1], [x2, y1], [x2, y2], [x1, y2], [x1, y1]]]


@given(donuts(), rects())
@settings(max_examples=fuzz_examples(300), deadline=None)
def test_rect_vs_donut_full_de9im_matches_interval_algebra(donut, t):
    """POLYGON-with-hole vs rectangle POLYGON: ALL TEN DE-9IM flags from
    the exact sub-segment classifier (relate_poly) must equal pure
    interval algebra over (outer, hole, target) — the independent model
    covering boundary-touching, hole-straddling, annulus-inside,
    hole-inside and containment cases across the lattice space."""
    parts, outer, hole = donut
    want = _donut_rect_flags(outer, hole, t)
    got = relate_pair("POLYGON", parts, "POLYGON", _rect_parts(t))
    assert got == want, (outer, hole, t, got, want)


@given(rects(), rects(), rects())
@settings(max_examples=fuzz_examples(300), deadline=None)
def test_rect_vs_disjoint_multipolygon_matches_interval_algebra(a, b, t):
    """Two-part MULTIPOLYGON (disjoint, non-touching rects) vs rect:
    union algebra — II if either part strictly overlaps; covered iff
    inside ONE part (a connected rect cannot span a gap); s ⊆ t̄ iff
    both parts are."""
    from hypothesis import assume

    ax1, ay1, ax2, ay2 = a
    # shift b fully right of a with a gap so the parts never touch
    w = b[2] - b[0]
    bx1 = ax2 + 1 / 16.0 + (b[0] % 2)  # small deterministic gap
    b = (bx1, b[1], bx1 + w, b[3])
    assume(not _rects_touch_or_overlap(a, b))
    parts = _rect_parts(a) + _rect_parts(b)
    ii = _rects_strict_overlap(t, a) or _rects_strict_overlap(t, b)
    inter = _rects_touch_or_overlap(t, a) or _rects_touch_or_overlap(t, b)
    covers = _rect_inside(t, a) or _rect_inside(t, b)
    coveredby = _rect_inside(a, t) and _rect_inside(b, t)
    want = {
        "intersects": inter,
        "disjoint": not inter,
        "covers": covers,
        "coveredby": coveredby,
        "contains": covers and ii,
        "within": coveredby and ii,
        "equals": covers and coveredby,
        "touches": inter and not ii,
        "overlaps": ii and not covers and not coveredby,
        "crosses": False,
    }
    got = relate_pair("MULTIPOLYGON", parts, "POLYGON", _rect_parts(t))
    assert got == want, (a, b, t, got, want)


def _donut_point_loc(p, outer, hole):
    lo = _rect_loc(p, outer)
    if lo in (0, 1):
        return lo
    lh = _rect_loc(p, hole)
    if lh == 1:
        return 1
    return 0 if lh == 2 else 2


@st.composite
def hsegments(draw):
    cy = draw(st.integers(-48, 48)) / 16.0
    x1 = draw(st.integers(-48, 40)) / 16.0
    x2 = x1 + draw(st.integers(1, 48)) / 16.0
    return (x1, x2, cy)


@given(donuts(), hsegments())
@settings(max_examples=fuzz_examples(300), deadline=None)
def test_hsegment_vs_donut_matches_arrangement(donut, seg):
    """Horizontal LINESTRING vs polygon-with-hole: flags from a 1-D
    arrangement (cut the segment at the rects' x-bounds, classify each
    open piece by its midpoint and each cut point directly) must equal
    the engine's sub-segment classifier. Covers collinear-on-boundary,
    through-the-hole, chord, and tangent cases."""
    parts, outer, hole = donut
    tx1, tx2, cy = seg
    cuts = sorted(
        {tx1, tx2}
        | {x for x in (outer[0], outer[2], hole[0], hole[2])
           if tx1 < x < tx2}
    )
    locs_pts = [_donut_point_loc((x, cy), outer, hole) for x in cuts]
    locs_mid = [
        _donut_point_loc(((a + b) / 2.0, cy), outer, hole)
        for a, b in zip(cuts, cuts[1:])
    ]
    has_in = 2 in locs_mid
    has_out = 0 in locs_mid
    has_on = 1 in locs_mid or 1 in locs_pts
    inter = has_in or has_on
    line_coveredby = inter and not has_out
    want = {
        "intersects": inter,
        "disjoint": not inter,
        # orientation (s=polygon, t=line): polygon covers/contains the
        # line when the line is covered by / within the polygon
        "covers": line_coveredby,
        "contains": line_coveredby and has_in,
        "within": False,
        "coveredby": False,
        "equals": False,
        "touches": inter and not has_in,
        "crosses": has_in and has_out,
        "overlaps": False,
    }
    got = relate_pair(
        "POLYGON", parts, "LINESTRING",
        [[[tx1, cy], [tx2, cy]]],
    )
    assert got == want, (outer, hole, seg, got, want)


def _de9im_flags_by_exact_sampling(loc_s, loc_t, bbox):
    """EXACT DE-9IM for axis-aligned regions whose boundaries lie on the
    1/16 lattice, by dense sampling: every nonempty piece of the joint
    arrangement contains a 1/32-offset cell center (2-D pieces: all
    region widths are >= 1/16), a lattice-edge midpoint (1-D boundary
    pieces lie ON lattice lines with length >= 1/16), or a lattice
    vertex (0-D crossing points sit on the lattice). Classifying those
    three sample families against both regions therefore decides every
    intersection-matrix cell exactly — no topology code at all."""
    x1, y1, x2, y2 = bbox
    nx = int(round((x2 - x1) * 16)) + 2
    ny = int(round((y2 - y1) * 16)) + 2
    cells = set()
    for i in range(-1, nx):
        for j in range(-1, ny):
            vx, vy = x1 + i / 16.0, y1 + j / 16.0
            for p in (
                (vx, vy),                          # lattice vertex
                (vx + 1 / 32.0, vy),               # horizontal edge mid
                (vx, vy + 1 / 32.0),               # vertical edge mid
                (vx + 1 / 32.0, vy + 1 / 32.0),    # cell center
            ):
                cells.add((loc_s(p), loc_t(p)))
    has = lambda a, b: (a, b) in cells  # noqa: E731
    ii = has(2, 2)
    inter = ii or has(2, 1) or has(1, 2) or has(1, 1)
    covers = inter and not has(0, 2) and not has(0, 1)
    coveredby = inter and not has(2, 0) and not has(1, 0)
    return {
        "intersects": inter,
        "disjoint": not inter,
        "covers": covers,
        "coveredby": coveredby,
        "contains": covers and ii,
        "within": coveredby and ii,
        "equals": covers and coveredby,
        "touches": inter and not ii,
        "overlaps": ii and not covers and not coveredby,
        "crosses": False,
    }


@st.composite
def small_donuts(draw):
    """Compact donuts (outer <= 12/16 wide) so the exact sampling grid
    stays small; placed near the origin so pairs overlap often."""
    x1 = draw(st.integers(-8, 8)) / 16.0
    y1 = draw(st.integers(-8, 8)) / 16.0
    w = draw(st.integers(4, 12)) / 16.0
    h = draw(st.integers(4, 12)) / 16.0
    x2, y2 = x1 + w, y1 + h
    hx1 = x1 + draw(st.integers(1, int(w * 16) - 2)) / 16.0
    hy1 = y1 + draw(st.integers(1, int(h * 16) - 2)) / 16.0
    hx2 = hx1 + draw(st.integers(1, int((x2 - hx1) * 16) - 1)) / 16.0
    hy2 = hy1 + draw(st.integers(1, int((y2 - hy1) * 16) - 1)) / 16.0
    parts = [
        [[x1, y1], [x2, y1], [x2, y2], [x1, y2], [x1, y1]],
        [[hx1, hy1], [hx2, hy1], [hx2, hy2], [hx1, hy2], [hx1, hy1]],
    ]
    return parts, (x1, y1, x2, y2), (hx1, hy1, hx2, hy2)


@given(small_donuts(), small_donuts())
@settings(max_examples=fuzz_examples(60), deadline=None)
def test_donut_vs_donut_full_de9im_matches_exact_sampling(da, db):
    """POLYGON-with-hole vs POLYGON-with-hole — the hardest
    polygon-polygon corner (shared hole boundaries, donut-in-hole,
    hole-straddling) — against the exact-sampling DE-9IM model."""
    pa, oa, ha = da
    pb, ob, hb = db
    bbox = (
        min(oa[0], ob[0]), min(oa[1], ob[1]),
        max(oa[2], ob[2]), max(oa[3], ob[3]),
    )
    want = _de9im_flags_by_exact_sampling(
        lambda p: _donut_point_loc(p, oa, ha),
        lambda p: _donut_point_loc(p, ob, hb),
        bbox,
    )
    got = relate_pair("POLYGON", pa, "POLYGON", pb)
    assert got == want, (oa, ha, ob, hb, got, want)


def _eo_loc(p, rings):
    """Independent even-odd locator for AXIS-ALIGNED rings: boundary if
    p lies on any edge, else parity of vertical-edge crossings of the
    rightward ray (half-open rule — exact off the boundary)."""
    px, py = p
    crossings = 0
    for r in rings:
        for (x1, y1), (x2, y2) in zip(r, r[1:]):
            if y1 == y2:  # horizontal edge
                if py == y1 and min(x1, x2) <= px <= max(x1, x2):
                    return 1
            else:  # vertical edge
                if px == x1 and min(y1, y2) <= py <= max(y1, y2):
                    return 1
                if x1 > px and (min(y1, y2) <= py < max(y1, y2)):
                    crossings += 1
    return 2 if crossings % 2 else 0


@st.composite
def rectilinear_shapes(draw):
    """A random concave rectilinear template (C / L / T / plus / donut)
    scaled and placed on the lattice near the origin."""
    kind = draw(st.integers(0, 5))
    ox = draw(st.integers(-8, 8)) / 16.0
    oy = draw(st.integers(-8, 8)) / 16.0
    u = draw(st.integers(1, 3)) / 16.0  # unit arm width

    def ring(pts):
        return [[ox + x * u, oy + y * u] for x, y in pts] + [
            [ox + pts[0][0] * u, oy + pts[0][1] * u]
        ]

    if kind == 0:    # C (opens right)
        parts = [ring([(0, 0), (3, 0), (3, 1), (1, 1), (1, 3), (3, 3),
                       (3, 4), (0, 4)])]
    elif kind == 1:  # L
        parts = [ring([(0, 0), (3, 0), (3, 1), (1, 1), (1, 4), (0, 4)])]
    elif kind == 2:  # T
        parts = [ring([(1, 0), (2, 0), (2, 3), (3, 3), (3, 4), (0, 4),
                       (0, 3), (1, 3)])]
    elif kind == 3:  # plus
        parts = [ring([(1, 0), (2, 0), (2, 1), (3, 1), (3, 2), (2, 2),
                       (2, 3), (1, 3), (1, 2), (0, 2), (0, 1), (1, 1)])]
    elif kind == 4:  # donut
        parts = [ring([(0, 0), (4, 0), (4, 4), (0, 4)]),
                 ring([(1, 1), (3, 1), (3, 3), (1, 3)])]
    else:            # island-in-hole (3-ring even-odd nesting)
        parts = [ring([(0, 0), (6, 0), (6, 6), (0, 6)]),
                 ring([(1, 1), (5, 1), (5, 5), (1, 5)]),
                 ring([(2, 2), (4, 2), (4, 4), (2, 4)])]
    xs = [x for part in parts for x, _ in part]
    ys = [y for part in parts for _, y in part]
    return parts, (min(xs), min(ys), max(xs), max(ys))


@given(rectilinear_shapes(), rectilinear_shapes())
@settings(max_examples=fuzz_examples(60), deadline=None)
def test_rectilinear_vs_rectilinear_full_de9im_matches_exact_sampling(
    sa, sb
):
    """Random concave rectilinear shapes (C/L/T/plus/donut) against each
    other: the exact-sampling DE-9IM model (with an independent
    crossing-number locator) must match the engine's sub-segment
    classifier — the concave polygon-polygon space beyond donuts."""
    pa, ea = sa
    pb, eb = sb
    bbox = (
        min(ea[0], eb[0]), min(ea[1], eb[1]),
        max(ea[2], eb[2]), max(ea[3], eb[3]),
    )
    want = _de9im_flags_by_exact_sampling(
        lambda p: _eo_loc(p, pa), lambda p: _eo_loc(p, pb), bbox,
    )
    got = relate_pair("POLYGON", pa, "POLYGON", pb)
    assert got == want, (pa, pb, got, want)


@given(small_donuts())
@settings(max_examples=fuzz_examples(100), deadline=None)
def test_wkt_roundtrip_polygon_with_hole(donut):
    parts = donut[0]
    parsed = parse_wkt(format_wkt("POLYGON", parts))
    assert parsed is not None and parsed == ("POLYGON", parts)


def _seg_rect_flags(p, q, rect):
    """Independent (rect polygon s, segment t) DE-9IM via exact rational
    Liang-Barsky clipping: the clip interval [t0, t1] of the segment
    inside the closed rect decides in/on/out, with collinear-edge runs
    and corner tangencies classified from the exact clip endpoints."""
    from fractions import Fraction as Fr

    x1, y1, x2, y2 = rect
    px, py = Fr(p[0]), Fr(p[1])
    dx, dy = Fr(q[0]) - px, Fr(q[1]) - py
    t0, t1 = Fr(0), Fr(1)
    for num, den in (
        (px - Fr(x1), -dx), (Fr(x2) - px, dx),
        (py - Fr(y1), -dy), (Fr(y2) - py, dy),
    ):
        # den * t <= num keeps s(t) inside this half-plane
        if den == 0:
            if num < 0:
                t0, t1 = Fr(1), Fr(0)  # entirely outside
                break
        elif den < 0:
            t0 = max(t0, num / den)
        else:
            t1 = min(t1, num / den)

    def on_bnd(t):
        x, y = px + t * dx, py + t * dy
        return (
            (x in (Fr(x1), Fr(x2)) and Fr(y1) <= y <= Fr(y2))
            or (y in (Fr(y1), Fr(y2)) and Fr(x1) <= x <= Fr(x2))
        )

    if t0 > t1:
        has_in = has_on = False
        has_out = True
    else:
        collinear_edge = (
            (dx == 0 and px in (Fr(x1), Fr(x2)))
            or (dy == 0 and py in (Fr(y1), Fr(y2)))
        )
        if collinear_edge:
            has_in = False
            has_on = True  # the whole clip lies on the edge
        else:
            has_in = t0 < t1
            has_on = on_bnd(t0) or on_bnd(t1)
        has_out = t0 > 0 or t1 < 1
    inter = has_in or has_on
    line_cov = inter and not has_out
    return {
        "intersects": inter,
        "disjoint": not inter,
        "covers": line_cov,
        "contains": line_cov and has_in,
        "within": False,
        "coveredby": False,
        "equals": False,
        "touches": inter and not has_in,
        "crosses": has_in and has_out,
        "overlaps": False,
    }


@st.composite
def segments(draw):
    a = (draw(lattice), draw(lattice))
    b = (draw(lattice), draw(lattice))
    if a == b:
        b = (b[0] + 1 / 16.0, b[1] + 1 / 16.0)
    return a, b


# ---------------------------------------------------------------------------
# Non-axis-aligned polygon x polygon: an independent EXACT truth model by
# rational arrangement sampling (the rotated/sheared input class the
# rectilinear suites above cannot reach).
#
# Model: build the arrangement of BOTH polygons' edge sets with
# fractions.Fraction arithmetic.  Every cell of the joint DE-9IM
# classification is witnessed by one of three exact sample families:
#   * arrangement vertices (polygon vertices + pairwise edge
#     intersections + collinear-overlap endpoints) — all 0-D pieces;
#   * midpoints of the sub-segments each edge is cut into — every 1-D
#     piece (sub-segments have constant location on their open part);
#   * a perpendicular offset of each midpoint by an exact safe epsilon
#     (half the rational distance to the nearest edge along the ray) —
#     every 2-D face, since every face of a segment arrangement is
#     adjacent to some sub-segment.
# Classifying those samples against both polygons with an exact even-odd
# locator decides every DE-9IM cell, hence all ten predicates, with no
# shared code with the engine (relate_poly uses scaled-integer
# homogeneous arithmetic; this model uses Fraction arithmetic and a
# different sampling scheme).  Reference contract:
# src/test/scala/IntersectionMatrixTest.scala:29-38 (optimized == naive
# on arbitrary WKT).
# ---------------------------------------------------------------------------

from fractions import Fraction as _Fr


def _fr_rings(parts):
    out = []
    for part in parts:
        r = [(_Fr(p[0]), _Fr(p[1])) for p in part]
        if r[0] != r[-1]:
            r.append(r[0])
        out.append(r)
    return out


def _fr_edges(rings):
    return [
        (r[i], r[i + 1])
        for r in rings
        for i in range(len(r) - 1)
        if r[i] != r[i + 1]
    ]


def _fr_cross(o, a, b):
    return (a[0] - o[0]) * (b[1] - o[1]) - (a[1] - o[1]) * (b[0] - o[0])


def _fr_on_seg(p, a, b):
    if _fr_cross(a, b, p) != 0:
        return False
    return (
        min(a[0], b[0]) <= p[0] <= max(a[0], b[0])
        and min(a[1], b[1]) <= p[1] <= max(a[1], b[1])
    )


def _fr_loc(p, rings):
    """2 interior / 1 boundary / 0 exterior — exact rational even-odd."""
    px, py = p
    crossings = 0
    for r in rings:
        for i in range(len(r) - 1):
            a, b = r[i], r[i + 1]
            if a == b:
                continue
            if _fr_on_seg(p, a, b):
                return 1
            if (a[1] > py) != (b[1] > py):
                xi = a[0] + (py - a[1]) * (b[0] - a[0]) / (b[1] - a[1])
                if xi > px:
                    crossings += 1
    return 2 if crossings % 2 else 0


def _fr_cut_params(p, q, edges):
    """Sorted exact params t in [0,1] where segment (p,q) meets any edge."""
    d = (q[0] - p[0], q[1] - p[1])
    ts = {_Fr(0), _Fr(1)}
    for a, b in edges:
        e = (b[0] - a[0], b[1] - a[1])
        den = d[0] * e[1] - d[1] * e[0]
        if den != 0:
            t = ((a[0] - p[0]) * e[1] - (a[1] - p[1]) * e[0]) / den
            u = ((a[0] - p[0]) * d[1] - (a[1] - p[1]) * d[0]) / den
            if 0 <= t <= 1 and 0 <= u <= 1:
                ts.add(t)
        elif _fr_cross(p, q, a) == 0:  # collinear overlap
            for c in (a, b):
                t = (
                    (c[0] - p[0]) / d[0] if d[0] != 0
                    else (c[1] - p[1]) / d[1]
                )
                if 0 <= t <= 1:
                    ts.add(t)
    return sorted(ts)


def _fr_side_sample(m, n, edges):
    """m + eps*n for an exact eps > 0 small enough that the open offset
    segment meets no edge — a representative of the adjacent face."""
    tmin = None
    for a, b in edges:
        e = (b[0] - a[0], b[1] - a[1])
        den = n[0] * e[1] - n[1] * e[0]
        if den != 0:
            t = ((a[0] - m[0]) * e[1] - (a[1] - m[1]) * e[0]) / den
            u = ((a[0] - m[0]) * n[1] - (a[1] - m[1]) * n[0]) / den
            if t > 0 and 0 <= u <= 1 and (tmin is None or t < tmin):
                tmin = t
        elif _fr_cross(a, b, m) == 0:  # edge along the ray's line
            nn = n[0] * n[0] + n[1] * n[1]
            for c in (a, b):
                t = ((c[0] - m[0]) * n[0] + (c[1] - m[1]) * n[1]) / nn
                if t > 0 and (tmin is None or t < tmin):
                    tmin = t
    eps = tmin / 2 if tmin is not None else _Fr(1)
    return (m[0] + eps * n[0], m[1] + eps * n[1])


def _fr_cancel_seams(rings):
    """Even-odd seam cancellation on Fraction rings: rings of ONE
    geometry sharing a collinear run make that run a slit/seam (crossing
    it flips parity twice), so it is not true region boundary. Split
    every edge at the endpoints of collinear overlapping edges, drop
    even-multiplicity sub-segments (ray-crossing parity is preserved),
    and stitch the rest back into closed walks. Independent of the
    engine's integer-lattice normalize_rings: Fraction arithmetic,
    pairwise O(E^2) collinearity scan, no line bucketing."""
    from collections import Counter, defaultdict

    edges = _fr_edges(rings)
    cnt = Counter()
    for p, q in edges:
        d = (q[0] - p[0], q[1] - p[1])
        ts = {_Fr(0), _Fr(1)}
        for a, b in edges:
            den = d[0] * (b[1] - a[1]) - d[1] * (b[0] - a[0])
            if den == 0 and _fr_cross(p, q, a) == 0:
                for c in (a, b):
                    t = (
                        (c[0] - p[0]) / d[0] if d[0] != 0
                        else (c[1] - p[1]) / d[1]
                    )
                    if 0 < t < 1:
                        ts.add(t)
        tl = sorted(ts)
        for t0, t1 in zip(tl, tl[1:]):
            u = (p[0] + t0 * d[0], p[1] + t0 * d[1])
            v = (p[0] + t1 * d[0], p[1] + t1 * d[1])
            cnt[(min(u, v), max(u, v))] += 1
    if all(k == 1 for k in cnt.values()):
        return rings
    kept = [k for k, v in cnt.items() if v % 2 == 1]
    adj = defaultdict(list)
    for idx, (a, b) in enumerate(kept):
        adj[a].append((b, idx))
        adj[b].append((a, idx))
    used = [False] * len(kept)
    walks = []
    for idx0, (a0, b0) in enumerate(kept):
        if used[idx0]:
            continue
        used[idx0] = True
        walk = [a0, b0]
        cur = b0
        while cur != a0:
            nxt = next((b, i) for b, i in adj[cur] if not used[i])
            used[nxt[1]] = True
            walk.append(nxt[0])
            cur = nxt[0]
        walks.append(walk)
    return walks


def _arrangement_de9im(pa, pb):
    """Independent exact DE-9IM flags of (polygon a, polygon b) — both
    arbitrary even-odd ring lists with rational vertices; same-geometry
    collinear seams cancel first (the even-odd REGION is what the flags
    describe, and a seam is not part of its boundary)."""
    ra = _fr_cancel_seams(_fr_rings(pa))
    rb = _fr_cancel_seams(_fr_rings(pb))
    all_edges = _fr_edges(ra) + _fr_edges(rb)
    cells = set()

    def visit(p):
        cells.add((_fr_loc(p, ra), _fr_loc(p, rb)))

    for p, q in all_edges:
        ts = _fr_cut_params(p, q, all_edges)
        d = (q[0] - p[0], q[1] - p[1])
        for t in ts:
            visit((p[0] + t * d[0], p[1] + t * d[1]))
        for t0, t1 in zip(ts, ts[1:]):
            tm = (t0 + t1) / 2
            m = (p[0] + tm * d[0], p[1] + tm * d[1])
            visit(m)
            visit(_fr_side_sample(m, (-d[1], d[0]), all_edges))
            visit(_fr_side_sample(m, (d[1], -d[0]), all_edges))

    has = cells.__contains__
    ii = has((2, 2))
    inter = ii or has((2, 1)) or has((1, 2)) or has((1, 1))
    covers = inter and not has((0, 2)) and not has((0, 1))
    coveredby = inter and not has((2, 0)) and not has((1, 0))
    return {
        "intersects": inter,
        "disjoint": not inter,
        "covers": covers,
        "coveredby": coveredby,
        "contains": covers and ii,
        "within": coveredby and ii,
        "equals": covers and coveredby,
        "touches": inter and not ii,
        "overlaps": ii and not covers and not coveredby,
        "crosses": False,
    }


# Template shapes in small-integer coordinates: convex (triangle, quad)
# exercise the convex fast path through relate_pair; concave (L, C) and
# the donut force the general scaled-integer classifier.
_POLY_TEMPLATES = [
    [[(0, 0), (4, 0), (0, 3)]],
    [[(0, 0), (5, 1), (6, 4), (1, 3)]],
    [[(0, 0), (4, 0), (4, 2), (2, 2), (2, 5), (0, 5)]],
    [[(0, 0), (6, 0), (6, 6), (0, 6)], [(2, 2), (4, 2), (4, 4), (2, 4)]],
    [[(0, 0), (3, 0), (3, 1), (1, 1), (1, 3), (3, 3), (3, 4), (0, 4)]],
]


def _apply_map16(m, parts, shift=(0, 0)):
    """Integer linear map + translation, divided by 16: every output
    coordinate is n/16 for integer n, hence an EXACT dyadic float — the
    engine's scaled-integer path and the Fraction truth model see
    bit-identical inputs."""
    a, b, c, d, tx, ty = m
    sx, sy = shift
    out = []
    for part in parts:
        ring = [
            [
                (a * (x + sx) + b * (y + sy) + tx) / 16.0,
                (c * (x + sx) + d * (y + sy) + ty) / 16.0,
            ]
            for x, y in part
        ]
        ring.append(list(ring[0]))
        out.append(ring)
    return out


@st.composite
def dyadic_maps(draw):
    from hypothesis import assume

    a = draw(st.integers(-8, 8))
    b = draw(st.integers(-8, 8))
    c = draw(st.integers(-8, 8))
    d = draw(st.integers(-8, 8))
    assume(a * d - b * c != 0)
    tx = draw(st.integers(-32, 32))
    ty = draw(st.integers(-32, 32))
    return (a, b, c, d, tx, ty)


@given(
    st.integers(0, len(_POLY_TEMPLATES) - 1), dyadic_maps(),
    st.integers(0, len(_POLY_TEMPLATES) - 1), dyadic_maps(),
)
@settings(max_examples=fuzz_examples(150), deadline=None)
def test_affine_polygon_pairs_match_arrangement_model(ia, ma, ib, mb):
    """Rotated/sheared/reflected polygon x polygon in general position:
    all ten DE-9IM flags from the engine (both the relate_pair dispatch
    — convex fast path included — and the general scaled-integer
    classifier directly) must equal the rational arrangement-sampling
    truth model."""
    from ds_jedai_spark.operators import relate_poly

    pa = _apply_map16(ma, _POLY_TEMPLATES[ia])
    pb = _apply_map16(mb, _POLY_TEMPLATES[ib])
    want = _arrangement_de9im(pa, pb)
    got = relate_pair("POLYGON", pa, "POLYGON", pb)
    assert got == want, (ma, mb, ia, ib, got, want)
    gen = relate_poly.relate_polygon_polygon(pa, pb)
    assert gen == want, ("general", ma, mb, ia, ib, gen, want)


@given(
    st.integers(0, len(_POLY_TEMPLATES) - 1),
    st.integers(0, len(_POLY_TEMPLATES) - 1),
    dyadic_maps(),
    st.integers(-6, 6),
    st.integers(-6, 6),
)
@settings(max_examples=fuzz_examples(150), deadline=None)
def test_sheared_contact_polygon_pairs_match_arrangement_model(
    ia, ib, m, dx, dy
):
    """Contact-rich non-axis-aligned pairs: both templates under the SAME
    affine map, the second shifted by integer template units — shared
    edges, shared vertices, edge-on-edge slides and containment survive
    the shear, exercising the degenerate branches of the general
    classifier off the axis-aligned lattice."""
    from ds_jedai_spark.operators import relate_poly

    pa = _apply_map16(m, _POLY_TEMPLATES[ia])
    pb = _apply_map16(m, _POLY_TEMPLATES[ib], shift=(dx, dy))
    want = _arrangement_de9im(pa, pb)
    got = relate_pair("POLYGON", pa, "POLYGON", pb)
    assert got == want, (m, ia, ib, dx, dy, got, want)
    gen = relate_poly.relate_polygon_polygon(pa, pb)
    assert gen == want, ("general", m, ia, ib, dx, dy, gen, want)


def _chain_flags_by_arrangement(chain_parts, poly_parts):
    """Independent line x polygon flags: classify the chain's exact
    sub-segment midpoints and cut points against the polygon (line-side
    classification fully determines the mixed-dimension flags).
    Same-geometry collinear seams of the polygon cancel first (r12) —
    the flags describe the even-odd REGION."""
    rings = _fr_cancel_seams(_fr_rings(poly_parts))
    edges = _fr_edges(rings)
    has_in = has_on = has_out = False
    for part in chain_parts:
        pts = [(_Fr(p[0]), _Fr(p[1])) for p in part]
        for p, q in zip(pts, pts[1:]):
            if p == q:
                continue
            ts = _fr_cut_params(p, q, edges)
            d = (q[0] - p[0], q[1] - p[1])
            for t0, t1 in zip(ts, ts[1:]):
                tm = (t0 + t1) / 2
                loc = _fr_loc((p[0] + tm * d[0], p[1] + tm * d[1]), rings)
                if loc == 2:
                    has_in = True
                elif loc == 1:
                    has_on = True
                else:
                    has_out = True
            if not has_on:
                for t in ts:
                    if _fr_loc((p[0] + t * d[0], p[1] + t * d[1]), rings) == 1:
                        has_on = True
                        break
    inter = has_in or has_on
    d = {
        k: False
        for k in (
            "intersects", "contains", "within", "covers", "coveredby",
            "equals", "touches", "overlaps", "crosses", "disjoint",
        )
    }
    d["intersects"] = inter
    d["coveredby"] = inter and not has_out
    d["within"] = d["coveredby"] and has_in
    d["crosses"] = has_in and has_out
    d["touches"] = inter and not has_in
    d["disjoint"] = not inter
    return d


@given(
    polylines(),
    st.integers(0, len(_POLY_TEMPLATES) - 1),
    dyadic_maps(),
)
@settings(max_examples=fuzz_examples(200), deadline=None)
def test_chain_vs_affine_polygon_matches_arrangement_model(
    chain, ip, m
):
    """Arbitrary lattice polylines vs rotated/sheared polygons (concave
    and holed included): the exact line-polygon classifier must match
    the rational sub-segment truth model."""
    poly = _apply_map16(m, _POLY_TEMPLATES[ip])
    want = _chain_flags_by_arrangement(chain, poly)
    got = relate_pair("MULTILINESTRING", chain, "POLYGON", poly)
    assert got == want, (chain, m, ip, got, want)


@given(
    polylines(),
    st.integers(0, len(_POLY_TEMPLATES) - 1),
    st.integers(0, len(_POLY_TEMPLATES) - 1),
    dyadic_maps(),
    st.integers(-4, 4),
    st.integers(-4, 4),
)
@settings(max_examples=fuzz_examples(120), deadline=None)
def test_chain_vs_seamed_multipolygon_matches_arrangement_model(
    chain, ia, ib, m, dx, dy
):
    """Polylines vs a sheared MULTIPOLYGON whose parts may share
    collinear boundary runs (seams): the engine's line x polygon path
    normalizes the polygon's rings (r12), and the truth model cancels
    seams in Fraction arithmetic — a chain riding exactly along a fused
    seam must classify as interior, not boundary."""
    pa = (_apply_map16(m, _POLY_TEMPLATES[ia])
          + _apply_map16(m, _POLY_TEMPLATES[ib], shift=(dx, dy)))
    want = _chain_flags_by_arrangement(chain, pa)
    got = relate_pair("MULTILINESTRING", chain, "MULTIPOLYGON", pa)
    assert got == want, (chain, m, ia, ib, dx, dy, got, want)


@given(boxes(), segments())
@settings(max_examples=fuzz_examples(400), deadline=None)
def test_segment_vs_box_matches_rational_clipping(box, seg):
    """Arbitrary (diagonal) lattice segments vs boxes: the engine's
    line-polygon path must match exact rational Liang-Barsky clipping —
    chords, tangents, corner grazes, collinear edge runs, containment."""
    (x1, y1), (x2a, y2a) = box[0][0], box[0][2]
    rect = (x1, y1, x2a, y2a)
    p, q = seg
    want = _seg_rect_flags(p, q, rect)
    got = relate_pair("POLYGON", box, "LINESTRING", [[list(p), list(q)]])
    assert got == want, (rect, seg, got, want)
    # same truth through the GENERAL scaled-integer classifier (the
    # path every non-rectangular polygon takes; relate_pair used the
    # rect closed form above)
    from ds_jedai_spark.operators import relate_poly

    raw = relate_poly.relate_line_polygon([[list(p), list(q)]], box)
    gen = dict(raw)
    gen["contains"], gen["within"] = raw["within"], raw["contains"]
    gen["covers"], gen["coveredby"] = raw["coveredby"], raw["covers"]
    assert gen == want, ("general", rect, seg, gen, want)


@given(points(), st.integers(0, len(_POLY_TEMPLATES) - 1), dyadic_maps())
@settings(max_examples=fuzz_examples(300), deadline=None)
def test_point_vs_affine_polygon_matches_rational_locator(pt, ip, m):
    """POINT vs rotated/sheared polygons (concave + holed): the engine's
    point classification must equal the rational even-odd locator, in
    both argument orders."""
    poly = _apply_map16(m, _POLY_TEMPLATES[ip])
    p = (_Fr(pt[0][0][0]), _Fr(pt[0][0][1]))
    loc = _fr_loc(p, _fr_rings(poly))
    d = relate_pair("POINT", pt, "POLYGON", poly)
    assert d["intersects"] == (loc != 0)
    assert d["disjoint"] == (loc == 0)
    assert d["within"] == (loc == 2)
    assert d["coveredby"] == (loc != 0)
    assert d["touches"] == (loc == 1)
    assert not d["contains"] and not d["covers"] and not d["overlaps"]
    s = relate_pair("POLYGON", poly, "POINT", pt)
    assert s["contains"] == (loc == 2) and s["covers"] == (loc != 0)
    assert s["touches"] == (loc == 1) and s["intersects"] == (loc != 0)


@given(
    st.integers(0, len(_POLY_TEMPLATES) - 1),
    st.integers(0, len(_POLY_TEMPLATES) - 1),
    st.integers(0, len(_POLY_TEMPLATES) - 1),
    dyadic_maps(),
    dyadic_maps(),
    st.integers(-4, 4),
    st.integers(-4, 4),
)
@settings(max_examples=fuzz_examples(60), deadline=None)
def test_affine_multipolygon_evenodd_matches_arrangement_model(
    ia, ib, ic, ma, mb, dx, dy
):
    """Sheared MULTIPOLYGON whose two parts may OVERLAP in 2-D (even-odd:
    the overlap region is exterior — the semantics one code path serves
    for holes and multi parts alike) vs an independently-mapped polygon:
    engine == arrangement model. Parts sharing a COLLINEAR boundary run
    are INCLUDED since r12 — both the engine (normalize_rings) and the
    truth model (_fr_cancel_seams) cancel the seam, matching JTS's
    noding behavior on such OGC-invalid inputs (r11 excluded them via a
    generator filter)."""
    from ds_jedai_spark.operators import relate_poly

    pa = (_apply_map16(ma, _POLY_TEMPLATES[ia])
          + _apply_map16(ma, _POLY_TEMPLATES[ib], shift=(dx, dy)))
    pb = _apply_map16(mb, _POLY_TEMPLATES[ic])
    want = _arrangement_de9im(pa, pb)
    got = relate_pair("MULTIPOLYGON", pa, "POLYGON", pb)
    assert got == want, (ma, mb, ia, ib, ic, dx, dy, got, want)
    gen = relate_poly.relate_polygon_polygon(pa, pb)
    assert gen == want, ("general", ma, mb, ia, ib, ic, dx, dy, gen, want)


# ---------------------------------------------------------------------------
# Line x line: independent truth model under OGC/JTS semantics (the
# Mod2 boundary-node rule the reference inherits through JTS relate).
# The engine classifies sub-segment contacts; the model instead derives
# every flag from first principles: boundary(L) = chain endpoints with
# odd multiplicity, interior(L) = L minus boundary, dim(II) from exact
# pairwise segment intersections, coverage by rational cut-midpoint
# membership. Rational arithmetic throughout.
# ---------------------------------------------------------------------------


def _fr_chain_segments(parts):
    out = []
    for part in parts:
        pts = [(_Fr(p[0]), _Fr(p[1])) for p in part]
        for a, b in zip(pts, pts[1:]):
            if a != b:
                out.append((a, b))
    return out


def _fr_mod2_boundary(parts):
    from collections import Counter

    c = Counter()
    for part in parts:
        c[(_Fr(part[0][0]), _Fr(part[0][1]))] += 1
        c[(_Fr(part[-1][0]), _Fr(part[-1][1]))] += 1
    return {p for p, n in c.items() if n % 2 == 1}


def _line_line_flags_by_rational_model(pa, pb):
    sa, sb = _fr_chain_segments(pa), _fr_chain_segments(pb)
    bda, bdb = _fr_mod2_boundary(pa), _fr_mod2_boundary(pb)

    def on_line(p, segs):
        return any(_fr_on_seg(p, a, b) for a, b in segs)

    # pairwise intersections: contact points + 1-dim collinear overlap
    pts = set()
    ii1 = False
    any_contact = False
    for a1, a2 in sa:
        d = (a2[0] - a1[0], a2[1] - a1[1])
        for b1, b2 in sb:
            e = (b2[0] - b1[0], b2[1] - b1[1])
            den = d[0] * e[1] - d[1] * e[0]
            if den != 0:
                t = ((b1[0] - a1[0]) * e[1] - (b1[1] - a1[1]) * e[0]) / den
                u = ((b1[0] - a1[0]) * d[1] - (b1[1] - a1[1]) * d[0]) / den
                if 0 <= t <= 1 and 0 <= u <= 1:
                    any_contact = True
                    pts.add((a1[0] + t * d[0], a1[1] + t * d[1]))
            elif _fr_cross(a1, a2, b1) == 0:  # collinear
                axis = 0 if d[0] != 0 else 1
                lo1, hi1 = sorted((a1[axis], a2[axis]))
                lo2, hi2 = sorted((b1[axis], b2[axis]))
                lo, hi = max(lo1, lo2), min(hi1, hi2)
                if lo <= hi:
                    any_contact = True
                    if lo < hi:
                        ii1 = True
                    for c in (b1, b2, a1, a2):
                        if _fr_on_seg(c, a1, a2) and _fr_on_seg(c, b1, b2):
                            pts.add(c)
    ii0 = any(p not in bda and p not in bdb for p in pts)
    ii = ii0 or ii1

    def covered(src_parts, dst_segs):
        # every rational cut point and sub-segment midpoint of src on dst
        dst_edges = list(dst_segs)
        for part in src_parts:
            cps = [(_Fr(p[0]), _Fr(p[1])) for p in part]
            for p, q in zip(cps, cps[1:]):
                if p == q:
                    if not on_line(p, dst_edges):
                        return False
                    continue
                ts = _fr_cut_params(p, q, dst_edges)
                d = (q[0] - p[0], q[1] - p[1])
                for t in ts:
                    if not on_line((p[0] + t * d[0], p[1] + t * d[1]),
                                   dst_edges):
                        return False
                for t0, t1 in zip(ts, ts[1:]):
                    tm = (t0 + t1) / 2
                    if not on_line((p[0] + tm * d[0], p[1] + tm * d[1]),
                                   dst_edges):
                        return False
        return True

    a_in_b = any_contact and covered(pa, sb)
    b_in_a = any_contact and covered(pb, sa)
    return {
        "intersects": any_contact,
        "disjoint": not any_contact,
        "equals": a_in_b and b_in_a,
        "within": a_in_b,
        "coveredby": a_in_b,
        "contains": b_in_a,
        "covers": b_in_a,
        "touches": any_contact and not ii,
        "crosses": ii0 and not ii1,
        "overlaps": ii1 and not a_in_b and not b_in_a,
    }


_small = st.integers(-4, 4).map(lambda v: v / 16.0)


@st.composite
def incident_chains(draw):
    """1-3 chain parts, 2-4 vertices each, coordinates from a SMALL pool
    so shared endpoints, T-junctions, degree-2 path vertices, collinear
    overlaps and closed-ring parts are all frequent."""
    n = draw(st.integers(1, 3))
    parts = []
    for _ in range(n):
        k = draw(st.integers(2, 4))
        raw = [[draw(_small), draw(_small)] for _ in range(k)]
        pts = [raw[0]]
        for p in raw[1:]:
            if p != pts[-1]:
                pts.append(p)
        if len(pts) < 2:
            pts.append([pts[-1][0] + 1 / 16.0, pts[-1][1]])
        parts.append(pts)
    return parts


@given(incident_chains(), incident_chains())
@settings(max_examples=fuzz_examples(400), deadline=None)
def test_line_line_matches_rational_jts_model(pa, pb):
    """MULTILINESTRING x MULTILINESTRING against the independent rational
    JTS-semantics model — degree-2 path vertices and closed rings are
    interior under the Mod2 rule (crosses, not touches, when the other
    line passes through), proper crossings landing on an odd endpoint
    are boundary contact. The r11 suite that drove the Mod2 fix in
    relate_general._line_boundary / _relate_line_line."""
    want = _line_line_flags_by_rational_model(pa, pb)
    got = relate_pair("MULTILINESTRING", pa, "MULTILINESTRING", pb)
    assert got == want, (pa, pb, got, want)


@st.composite
def multipoints(draw):
    """2-5 points from the small pool (frequent vertex/edge/boundary
    incidences), as MULTIPOINT parts [[p], [p], ...]."""
    k = draw(st.integers(2, 5))
    return [[[draw(_small), draw(_small)]] for _ in range(k)]


def _points_line_flags_by_rational_model(pts_parts, chain_parts):
    segs = _fr_chain_segments(chain_parts)
    bd = _fr_mod2_boundary(chain_parts)
    n_int = n_bd = n_off = 0
    for part in pts_parts:
        p = (_Fr(part[0][0]), _Fr(part[0][1]))
        if any(_fr_on_seg(p, a, b) for a, b in segs):
            if p in bd:
                n_bd += 1
            else:
                n_int += 1
        else:
            n_off += 1
    inter = n_int + n_bd > 0
    d = {k: False for k in (
        "intersects", "contains", "within", "covers", "coveredby",
        "equals", "touches", "overlaps", "crosses", "disjoint")}
    d["intersects"] = inter
    d["disjoint"] = not inter
    d["coveredby"] = inter and n_off == 0
    d["within"] = n_off == 0 and n_int > 0
    d["crosses"] = n_int > 0 and n_off > 0
    d["touches"] = inter and n_int == 0
    return d


@given(multipoints(), incident_chains())
@settings(max_examples=fuzz_examples(400), deadline=None)
def test_multipoint_vs_chain_matches_rational_model(pts, chain):
    """MULTIPOINT vs incidence-rich chains: per-point location under the
    Mod2 boundary rule (degree-2 path vertices are line INTERIOR, so a
    point there is within, not touching)."""
    want = _points_line_flags_by_rational_model(pts, chain)
    got = relate_pair("MULTIPOINT", pts, "MULTILINESTRING", chain)
    assert got == want, (pts, chain, got, want)


@given(multipoints(), st.integers(0, len(_POLY_TEMPLATES) - 1),
       dyadic_maps())
@settings(max_examples=fuzz_examples(300), deadline=None)
def test_multipoint_vs_affine_polygon_matches_rational_model(pts, ip, m):
    """MULTIPOINT vs rotated/sheared polygons (concave + holed): the
    per-point aggregation must equal the rational even-odd locator."""
    poly = _apply_map16(m, _POLY_TEMPLATES[ip])
    rings = _fr_rings(poly)
    n_in = n_on = n_out = 0
    for part in pts:
        loc = _fr_loc((_Fr(part[0][0]), _Fr(part[0][1])), rings)
        if loc == 2:
            n_in += 1
        elif loc == 1:
            n_on += 1
        else:
            n_out += 1
    inter = n_in + n_on > 0
    want = {k: False for k in (
        "intersects", "contains", "within", "covers", "coveredby",
        "equals", "touches", "overlaps", "crosses", "disjoint")}
    want["intersects"] = inter
    want["disjoint"] = not inter
    want["coveredby"] = inter and n_out == 0
    want["within"] = n_out == 0 and n_in > 0
    want["crosses"] = n_in > 0 and n_out > 0
    want["touches"] = inter and n_in == 0
    got = relate_pair("MULTIPOINT", pts, "POLYGON", poly)
    assert got == want, (pts, ip, m, got, want)
