"""Property-based tests (hypothesis): WKT round-trip and the internal
consistency laws of the DE-9IM predicate algebra on random lattice boxes."""

from hypothesis import given, settings, strategies as st

from ds_jedai_spark.model.geometry import format_wkt, parse_wkt
from ds_jedai_spark.operators.relate_general import relate_pair

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
@settings(max_examples=200, deadline=None)
def test_wkt_roundtrip_polygon(parts):
    w = format_wkt("POLYGON", parts)
    parsed = parse_wkt(w)
    assert parsed is not None
    gtype, back = parsed
    assert gtype == "POLYGON" and back == parts


@given(points())
@settings(max_examples=100, deadline=None)
def test_wkt_roundtrip_point(parts):
    parsed = parse_wkt(format_wkt("POINT", parts))
    assert parsed is not None and parsed[1] == parts


@given(boxes(), boxes())
@settings(max_examples=300, deadline=None)
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
@settings(max_examples=200, deadline=None)
def test_point_box_laws(p, b):
    pb = relate_pair("POINT", p, "POLYGON", b)
    bp = relate_pair("POLYGON", b, "POINT", p)
    assert pb["intersects"] == bp["intersects"]
    assert pb["within"] == bp["contains"]
    # a point can never overlap (dim mismatch) nor cover a box
    assert not pb["overlaps"] and not pb["covers"]
    if pb["intersects"]:
        assert pb["coveredby"]  # point in closed box is covered
