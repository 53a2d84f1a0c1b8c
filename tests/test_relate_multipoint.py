"""Exact MULTIPOINT relations — the last geometry combos to leave the
envelope approximation (now none remain)."""

from ds_jedai_spark.operators.relate_general import relate_pair

TRI = [[(0.0, 0.0), (6.0, 0.0), (3.0, 5.0), (0.0, 0.0)]]
LINE = [[(0.0, 0.0), (4.0, 4.0)]]


def mp(*pts):
    return [[list(p)] for p in pts]


def test_multipoint_polygon_within_and_crosses():
    d = relate_pair("MULTIPOINT", mp((2, 1), (3, 2)), "POLYGON", TRI)
    assert d["within"] and d["coveredby"] and not d["crosses"]
    d = relate_pair("MULTIPOINT", mp((2, 1), (9, 9)), "POLYGON", TRI)
    assert d["crosses"] and d["intersects"] and not d["within"]
    d = relate_pair("MULTIPOINT", mp((3, 0), (9, 9)), "POLYGON", TRI)
    assert d["touches"] and not d["crosses"]


def test_multipoint_line_cases():
    d = relate_pair("MULTIPOINT", mp((1, 1), (2, 2)), "LINESTRING", LINE)
    assert d["within"] and not d["crosses"]
    d = relate_pair("MULTIPOINT", mp((0, 0), (9, 9)), "LINESTRING", LINE)
    assert d["touches"]  # endpoint contact only
    d = relate_pair("MULTIPOINT", mp((1, 1), (9, 9)), "LINESTRING", LINE)
    assert d["crosses"]


def test_multipoint_sets():
    a = mp((1, 1), (2, 2))
    b = mp((2, 2), (3, 3))
    d = relate_pair("MULTIPOINT", a, "MULTIPOINT", b)
    assert d["intersects"] and d["overlaps"] and not d["equals"]
    d = relate_pair("MULTIPOINT", a, "MULTIPOINT", mp((2, 2), (1, 1)))
    assert d["equals"] and d["within"] and d["covers"]
    d = relate_pair("POINT", [[[2.0, 2.0]]], "MULTIPOINT", a)
    assert d["within"] and not d["overlaps"]


def test_polygon_side_swap():
    d = relate_pair("POLYGON", TRI, "MULTIPOINT", mp((2, 1), (3, 2)))
    assert d["contains"] and d["covers"]


# ---------------------------------------------------------------------------
# Metamorphic: a MULTIPOINT's relations must be derivable from the exact
# single-POINT relations of its members (points have no boundary, so:
# intersects = any; coveredby = all coveredby; within = coveredby and any
# within; touches = intersects with no interior member; crosses = an
# interior member and an exterior member).
# ---------------------------------------------------------------------------

import itertools

TARGETS = [
    ("LINESTRING", [[(0.0, 0.0), (4.0, 4.0)]]),
    ("LINESTRING", [[(0.0, 2.0), (4.0, 2.0), (4.0, 0.0)]]),
    ("POLYGON", TRI),
    ("POLYGON", [[(0.0, 0.0), (4.0, 0.0), (4.0, 4.0), (0.0, 4.0), (0.0, 0.0)]]),
]

LATTICE = [(x * 0.5, y * 0.5) for x in range(-1, 10) for y in range(-1, 10)]


def test_multipoint_metamorphic_vs_pointwise():
    checked = 0
    for gtype, target in TARGETS:
        pts = [p for p in LATTICE if abs(p[0]) <= 6 and abs(p[1]) <= 6]
        for combo in itertools.islice(itertools.combinations(pts[::7], 3), 400):
            mp_parts = [[list(p)] for p in combo]
            got = relate_pair("MULTIPOINT", mp_parts, gtype, target)
            singles = [
                relate_pair("POINT", [[list(p)]], gtype, target) for p in combo
            ]
            any_int = any(s["intersects"] for s in singles)
            all_cov = all(s["coveredby"] for s in singles)
            any_within = any(s["within"] for s in singles)
            assert got["intersects"] == any_int, (gtype, combo)
            assert got["coveredby"] == all_cov, (gtype, combo)
            assert got["within"] == (all_cov and any_within), (gtype, combo)
            assert got["touches"] == (any_int and not any_within), (gtype, combo)
            assert got["crosses"] == (any_within and not all_cov), (gtype, combo)
            checked += 1
    assert checked >= 1200
