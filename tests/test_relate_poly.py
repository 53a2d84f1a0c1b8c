"""Exact general polygon relations: golden cases (concave, holes, nested,
collinear contact) + consistency with the rectangle closed form."""

from hypothesis import given, settings, strategies as st

from ds_jedai_spark.operators.relate_general import relate_pair

SQ = lambda x1, y1, x2, y2: [[(x1, y1), (x2, y1), (x2, y2), (x1, y2), (x1, y1)]]
TRI = [[(0.0, 0.0), (6.0, 0.0), (3.0, 5.0), (0.0, 0.0)]]
L_SHAPE = [[(0.0, 0.0), (6.0, 0.0), (6.0, 2.0), (2.0, 2.0), (2.0, 6.0),
            (0.0, 6.0), (0.0, 0.0)]]
HOLED = [
    [(0.0, 0.0), (10.0, 0.0), (10.0, 10.0), (0.0, 10.0), (0.0, 0.0)],
    [(3.0, 3.0), (7.0, 3.0), (7.0, 7.0), (3.0, 7.0), (3.0, 3.0)],
]


def rel(a_t, a, b_t, b):
    return relate_pair(a_t, a, b_t, b)


def flags(d, **want):
    for k, v in want.items():
        assert d[k] == v, (k, d)


def test_triangle_crosses_square():
    d = rel("POLYGON", TRI, "POLYGON", SQ(2, -1, 4, 1))
    flags(d, intersects=True, overlaps=True, touches=False, contains=False)


def test_nested_triangle_in_square():
    d = rel("POLYGON", SQ(-1, -1, 7, 6), "POLYGON", TRI)
    flags(d, contains=True, covers=True, equals=False, overlaps=False)
    rev = rel("POLYGON", TRI, "POLYGON", SQ(-1, -1, 7, 6))
    flags(rev, within=True, coveredby=True)


def test_equal_triangles():
    d = rel("POLYGON", TRI, "POLYGON", [list(map(tuple, TRI[0]))])
    flags(d, equals=True, covers=True, coveredby=True, touches=False)


def test_edge_touching_concave():
    # Square sits in the notch of the L, sharing edges only.
    d = rel("POLYGON", L_SHAPE, "POLYGON", SQ(2, 2, 6, 6))
    flags(d, intersects=True, touches=True, overlaps=False)


def test_square_in_hole_is_disjoint():
    d = rel("POLYGON", HOLED, "POLYGON", SQ(4, 4, 6, 6))
    flags(d, disjoint=True, intersects=False)


def test_hole_ring_containment():
    # Big square covers the holed polygon entirely.
    d = rel("POLYGON", SQ(-1, -1, 11, 11), "POLYGON", HOLED)
    flags(d, contains=True, covers=True)


def test_shared_edge_inside_cover():
    # B inside A, flush with A's left edge: covered AND contained (JTS).
    d = rel("POLYGON", SQ(0, 0, 8, 8), "POLYGON", SQ(0, 2, 3, 5))
    flags(d, covers=True, contains=True, overlaps=False)


def test_line_crosses_triangle():
    d = rel("LINESTRING", [[(-1.0, 1.0), (7.0, 1.0)]], "POLYGON", TRI)
    flags(d, crosses=True, intersects=True, touches=False, coveredby=False)


def test_line_within_triangle():
    d = rel("LINESTRING", [[(2.0, 1.0), (4.0, 1.0)]], "POLYGON", TRI)
    flags(d, within=True, coveredby=True, crosses=False)


def test_line_along_boundary_touches():
    d = rel("LINESTRING", [[(1.0, 0.0), (5.0, 0.0)]], "POLYGON", TRI)
    flags(d, touches=True, coveredby=True, within=False, crosses=False)


def test_line_into_hole_crosses():
    d = rel("LINESTRING", [[(1.0, 5.0), (5.0, 5.0)]], "POLYGON", HOLED)
    flags(d, crosses=True)


def test_line_inside_hole_disjoint():
    d = rel("LINESTRING", [[(4.0, 5.0), (6.0, 5.0)]], "POLYGON", HOLED)
    flags(d, disjoint=True)


def test_polygon_line_swap_consistency():
    d = rel("POLYGON", TRI, "LINESTRING", [[(-1.0, 1.0), (7.0, 1.0)]])
    flags(d, crosses=True, contains=False)


lattice = st.integers(min_value=-10, max_value=10).map(lambda v: v / 2.0)


@st.composite
def rects(draw):
    x1, x2 = sorted((draw(lattice), draw(lattice)))
    y1, y2 = sorted((draw(lattice), draw(lattice)))
    if x1 == x2:
        x2 = x1 + 0.5
    if y1 == y2:
        y2 = y1 + 0.5
    return x1, y1, x2, y2


@given(rects(), rects())
@settings(max_examples=150, deadline=None)
def test_general_path_matches_rect_closed_form(a, b):
    # Perturb one rectangle into a 5-vertex pentagon-shaped rect (insert a
    # collinear midpoint) so relate_pair routes through relate_poly, then
    # compare with the rectangle closed form on the plain rects.
    ax1, ay1, ax2, ay2 = a
    ring = [(ax1, ay1), ((ax1 + ax2) / 2, ay1), (ax2, ay1), (ax2, ay2),
            (ax1, ay2), (ax1, ay1)]
    general = relate_pair("POLYGON", [ring], "POLYGON", SQ(*b))
    closed = relate_pair("POLYGON", SQ(*a), "POLYGON", SQ(*b))
    assert general == closed


# --- full-precision floats: exercises the joint power-of-two rescaling
# (denominators up to 2^52), not just the /16 lattice the engine emits.

fullfloat = st.floats(
    min_value=-4.0, max_value=4.0, allow_nan=False, allow_infinity=False
)

SWAPPED = {
    "within": "contains", "contains": "within",
    "covers": "coveredby", "coveredby": "covers",
}


@st.composite
def float_triangle(draw):
    from fractions import Fraction

    from hypothesis import assume

    pts = [(draw(fullfloat), draw(fullfloat)) for _ in range(3)]
    (ax, ay), (bx, by), (cx, cy) = pts
    area2 = (Fraction(bx) - Fraction(ax)) * (Fraction(cy) - Fraction(ay)) - (
        Fraction(by) - Fraction(ay)
    ) * (Fraction(cx) - Fraction(ax))
    assume(area2 != 0)
    return [pts + [pts[0]]]


@given(float_triangle(), float_triangle())
@settings(max_examples=60, deadline=None)
def test_fullfloat_swap_consistency(a, b):
    d = rel("POLYGON", a, "POLYGON", b)
    ds = rel("POLYGON", b, "POLYGON", a)
    for k, v in d.items():
        assert ds[SWAPPED.get(k, k)] == v, (k, d, ds)


@given(float_triangle())
@settings(max_examples=40, deadline=None)
def test_fullfloat_self_equals(a):
    d = rel("POLYGON", a, "POLYGON", [list(p) for p in a])
    assert d["equals"] and d["covers"] and d["coveredby"] and not d["touches"]


@given(float_triangle(), float_triangle())
@settings(max_examples=40, deadline=None)
def test_fullfloat_doubling_invariance(a, b):
    def dbl(parts):
        return [[(2.0 * x, 2.0 * y) for x, y in part] for part in parts]

    assert rel("POLYGON", a, "POLYGON", b) == rel(
        "POLYGON", dbl(a), "POLYGON", dbl(b)
    )


@given(
    st.lists(
        st.tuples(
            st.integers(min_value=-(2**50), max_value=2**50),
            st.integers(min_value=1, max_value=2**50),
        ),
        min_size=1,
        max_size=30,
    )
)
@settings(max_examples=300, deadline=None)
def test_sorted_params_matches_fraction_order(pairs):
    """The gcd-free cut-parameter ordering must agree with Fraction
    semantics exactly: same ascending order, duplicates (equal rationals
    under ANY representation) collapsed."""
    from fractions import Fraction

    from ds_jedai_spark.operators.relate_poly import _mid, _sorted_params

    got = _sorted_params(list(pairs))
    want = sorted({Fraction(tn, td) for tn, td in pairs})
    assert len(got) == len(want)
    for (tn, td), frac in zip(got, want):
        assert Fraction(tn, td) == frac
    # midpoints are exact too
    for a, b in zip(got, got[1:]):
        mn, md = _mid(a, b)
        assert Fraction(mn, md) == (Fraction(*a) + Fraction(*b)) / 2


def test_normalize_rings_seam_cancellation():
    """Same-geometry collinear seams cancel under even-odd: adjacent
    parts fuse (seam becomes interior), duplicated regions annihilate,
    partial overlaps cancel only the shared run — and valid input
    returns the identical object (zero-cost common path)."""
    from ds_jedai_spark.operators.relate_poly import (
        _rings,
        normalize_rings,
        point_location,
        relate_polygon_polygon,
    )

    # valid input: unchanged, same object
    donut = _rings([
        [(0, 0), (6, 0), (6, 6), (0, 6)],
        [(2, 2), (4, 2), (4, 4), (2, 4)],
    ])
    assert normalize_rings(donut) is donut

    # two unit squares sharing an edge: seam at x=1 becomes interior
    two = _rings([
        [(0, 0), (1, 0), (1, 1), (0, 1)],
        [(1, 0), (2, 0), (2, 1), (1, 1)],
    ])
    fused = normalize_rings(two)
    assert point_location((2, 1, 2), fused) == 2  # (1, 0.5): interior now
    assert point_location((0, 1, 2), fused) == 1  # (0, 0.5): true boundary

    # duplicated square annihilates: empty region
    assert normalize_rings(_rings([
        [(0, 0), (1, 0), (1, 1), (0, 1)],
        [(0, 0), (1, 0), (1, 1), (0, 1)],
    ])) == []

    # partial collinear overlap cancels only the shared run
    partial = normalize_rings(_rings([
        [(0, 0), (2, 0), (2, 1), (0, 1)],
        [(1, 1), (2, 1), (2, 2), (1, 2)],
    ]))
    assert point_location((3, 2, 2), partial) == 2  # (1.5, 1): seam -> interior
    assert point_location((1, 2, 2), partial) == 1  # (0.5, 1): still boundary

    # e2e through relate_polygon_polygon: the fused L covers a sliver
    # crossing the (former) seam; the annihilated pair is disjoint
    A = [[[0.0, 0.0], [1.0, 0.0], [1.0, 1.0], [0.0, 1.0], [0.0, 0.0]],
         [[1.0, 0.0], [2.0, 0.0], [2.0, 1.0], [1.0, 1.0], [1.0, 0.0]]]
    B = [[[0.5, 0.25], [1.5, 0.25], [1.5, 0.75], [0.5, 0.75], [0.5, 0.25]]]
    d = relate_polygon_polygon(A, B)
    assert d["contains"] and d["covers"] and not d["touches"]
    gone = [[[0.0, 0.0], [1.0, 0.0], [1.0, 1.0], [0.0, 1.0], [0.0, 0.0]]] * 2
    assert relate_polygon_polygon(gone, B)["disjoint"]


@given(
    st.lists(
        st.tuples(st.integers(0, 6), st.integers(0, 6),
                  st.integers(1, 6), st.integers(1, 6)),
        min_size=2, max_size=4,
    ),
    st.booleans(),
)
@settings(max_examples=200, deadline=None)
def test_normalize_rings_preserves_region_fuzz(rects, dup_first):
    """Adversarial seam soup: overlapping rectangles on a small integer
    lattice (duplicates, partial collinear runs, T-junctions, multi-way
    seams — multiplicities 3+). normalize_rings must preserve the
    even-odd REGION exactly: at every lattice and half-lattice probe,
    point_location on the normalized rings equals the neighborhood
    even-odd parity truth (four quadrant samples at +-1/4, which stay
    inside the probe's arrangement cell because every edge lies on the
    integer lattice) — interior iff all four odd, exterior iff all
    even, boundary otherwise."""
    from ds_jedai_spark.operators.relate_poly import (
        _rings,
        normalize_rings,
        point_location,
    )

    rs = [(x, y, x + w, y + h) for x, y, w, h in rects]
    if dup_first:
        rs.append(rs[0])
    rings = _rings([
        [(x1, y1), (x2, y1), (x2, y2), (x1, y2)] for x1, y1, x2, y2 in rs
    ])
    norm = normalize_rings(rings)

    def par(qx, qy):
        return sum(
            1 for x1, y1, x2, y2 in rs if x1 < qx < x2 and y1 < qy < y2
        ) % 2

    for ix in range(-2, 27):           # lattice + half steps over [-1, 13]
        for iy in range(-2, 27):
            qx, qy = ix / 2.0, iy / 2.0
            quad = [par(qx + sx / 4.0, qy + sy / 4.0)
                    for sx in (-1, 1) for sy in (-1, 1)]
            if all(v == 1 for v in quad):
                want = 2
            elif all(v == 0 for v in quad):
                want = 0
            else:
                want = 1
            # probes are half-integers: scale by 2 for integer lattice
            got = point_location((ix, iy, 2), norm)
            assert got == want, (rs, (qx, qy), got, want)
