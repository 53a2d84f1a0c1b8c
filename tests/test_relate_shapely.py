"""Shapely-gated vectorized relate path (operators/relate_shapely.py).

The environment-independent half (feature check, predicate-name map,
fallback dispatch) runs everywhere; the cross-validation against the
exact scaled-integer path runs fully only when shapely 2.x is present
(skip-marked otherwise) — the same CI pattern as the PIL-gated media
decode test.
"""

import random

import pytest

from ds_jedai_spark.operators.relate import RELATIONS
from ds_jedai_spark.operators.relate_general import relate_pair
from ds_jedai_spark.operators.relate_shapely import _PRED, have_geometry_lib

needs_shapely = pytest.mark.skipif(
    not have_geometry_lib(), reason="shapely >= 2 not installed"
)


def test_feature_check_matches_import_reality():
    got = have_geometry_lib()
    assert isinstance(got, bool)
    try:
        import shapely  # noqa: F401

        importable = True
    except ImportError:
        importable = False
    if not importable:
        assert got is False


def test_predicate_map_covers_all_relations():
    assert set(_PRED) == set(RELATIONS)


def test_exact_path_still_dispatches_without_lib(spark):
    """with_general_relations must work (exact path) when the lib is
    absent — the no-dependency contract."""
    if have_geometry_lib():
        pytest.skip("lib present; fallback branch not reachable")
    from ds_jedai_spark.operators.relate_general import with_general_relations

    tri_a = [[[0.0, 0.0], [4.0, 0.0], [0.0, 4.0], [0.0, 0.0]]]
    tri_b = [[[1.0, 1.0], [5.0, 1.0], [1.0, 5.0], [1.0, 1.0]]]
    df = spark.createDataFrame(
        [("POLYGON", tri_a, "POLYGON", tri_b)],
        "s_gtype string, s_coords array<array<array<double>>>, "
        "t_gtype string, t_coords array<array<array<double>>>",
    )
    row = with_general_relations(df, spread=False).collect()[0]
    assert row["r_intersects"] and row["r_overlaps"] and not row["r_touches"]


# ------------------------------------------------------------ corpus


def _convex_poly(rng, maxr=48):
    def cross(o, a, b):
        return (a[0] - o[0]) * (b[1] - o[1]) - (a[1] - o[1]) * (b[0] - o[0])

    while True:
        cx, cy = rng.randint(-800, 800) / 16, rng.randint(-800, 800) / 16
        pts = set()
        while len(pts) < rng.choice([3, 4, 5, 6]):
            pts.add(
                (cx + rng.randint(-maxr, maxr) / 16, cy + rng.randint(-maxr, maxr) / 16)
            )
        pts = sorted(pts)
        lower = []
        for p in pts:
            while len(lower) >= 2 and cross(lower[-2], lower[-1], p) <= 0:
                lower.pop()
            lower.append(p)
        upper = []
        for p in reversed(pts):
            while len(upper) >= 2 and cross(upper[-2], upper[-1], p) <= 0:
                upper.pop()
            upper.append(p)
        hull = lower[:-1] + upper[:-1]
        if len(hull) >= 3:
            hull.append(hull[0])
            return [[list(p) for p in hull]]


def _line(rng, npts=3):
    pts = []
    x, y = rng.randint(-400, 400) / 16, rng.randint(-400, 400) / 16
    pts.append([x, y])
    for _ in range(npts - 1):
        x += rng.randint(-64, 64) / 16
        y += rng.randint(-64, 64) / 16
        pts.append([x, y])
    return [pts]


def _corpus(rng, n):
    """Mixed (gtype, parts) rows spanning every dispatch family."""
    out = []
    for _ in range(n):
        kind = rng.randrange(6)
        if kind == 0:
            out.append(("POINT", [[[rng.randint(-80, 80) / 16, rng.randint(-80, 80) / 16]]]))
        elif kind == 1:
            pts = [
                [rng.randint(-80, 80) / 16, rng.randint(-80, 80) / 16]
                for _ in range(rng.choice([2, 3]))
            ]
            out.append(("MULTIPOINT", [[p] for p in pts]))
        elif kind == 2:
            out.append(("LINESTRING", _line(rng)))
        elif kind == 3:
            out.append(("MULTILINESTRING", _line(rng) + _line(rng, 2)))
        elif kind == 4:
            out.append(("POLYGON", _convex_poly(rng)))
        else:
            # square with a hole — flattened ring list (even-odd contract)
            cx, cy = rng.randint(-40, 40) / 16, rng.randint(-40, 40) / 16
            shell = [
                [cx - 4, cy - 4], [cx + 4, cy - 4], [cx + 4, cy + 4],
                [cx - 4, cy + 4], [cx - 4, cy - 4],
            ]
            hole = [
                [cx - 1, cy - 1], [cx + 1, cy - 1], [cx + 1, cy + 1],
                [cx - 1, cy + 1], [cx - 1, cy - 1],
            ]
            out.append(("POLYGON", [shell, hole]))
    return out


@needs_shapely
def test_vectorized_flags_match_exact_path():
    from ds_jedai_spark.operators.relate_shapely import relate_batch

    rng = random.Random(4242)
    left = _corpus(rng, 300)
    right = _corpus(rng, 300)
    ga, ca = [g for g, _ in left], [c for _, c in left]
    gb, cb = [g for g, _ in right], [c for _, c in right]
    res = relate_batch(ga, ca, gb, cb)
    for i in range(len(left)):
        exact = relate_pair(ga[i], ca[i], gb[i], cb[i])
        got = {r: bool(res[r][i]) for r in RELATIONS}
        assert got == exact, (
            f"row {i}: {ga[i]} vs {gb[i]}: lib={got} exact={exact}"
        )


@needs_shapely
def test_even_odd_multiring_construction():
    """Flattened-ring regions must relate identically through the
    symmetric-difference construction: a point inside the hole is
    outside the region."""
    from ds_jedai_spark.operators.relate_shapely import relate_batch

    shell = [[0.0, 0.0], [8.0, 0.0], [8.0, 8.0], [0.0, 8.0], [0.0, 0.0]]
    hole = [[2.0, 2.0], [6.0, 2.0], [6.0, 6.0], [2.0, 6.0], [2.0, 2.0]]
    res = relate_batch(
        ["POLYGON"], [[shell, hole]], ["POINT"], [[[[4.0, 4.0]]]]
    )
    assert not bool(res["intersects"][0]) and bool(res["disjoint"][0])


@needs_shapely
def test_spark_path_with_lib_end_to_end(spark):
    """with_general_relations dispatches to the GEOS batch path inside
    the executor and produces the exact-path flags."""
    from ds_jedai_spark.operators.relate_general import with_general_relations

    rng = random.Random(77)
    rows = [
        (ga, ca, gb, cb)
        for (ga, ca), (gb, cb) in zip(_corpus(rng, 60), _corpus(rng, 60))
    ]
    df = spark.createDataFrame(
        rows,
        "s_gtype string, s_coords array<array<array<double>>>, "
        "t_gtype string, t_coords array<array<array<double>>>",
    )
    for row in with_general_relations(df, spread=False).collect():
        exact = relate_pair(
            row["s_gtype"], row["s_coords"], row["t_gtype"], row["t_coords"]
        )
        assert {r: row[f"r_{r}"] for r in RELATIONS} == exact
