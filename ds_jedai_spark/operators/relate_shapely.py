"""Optional vectorized DE-9IM verification through shapely 2.x (GEOS).

The reference gets JTS-speed ``geometry.relate`` for arbitrary geometry
(model/entities/EntityT.scala:42-45); this environment ships no
shapely/JTS, so the engine's exact scaled-integer Python path
(operators/relate_poly.py) is the no-dependency verifier and the oracle
of record. When shapely 2.x IS present (feature-checked exactly like
``multimodal.have_image_decoder()``), ``with_general_relations``
dispatches whole Arrow batches to GEOS's vectorized predicates instead
of per-pair Python — same flags, ~C speed.

Semantics contract: shapely 2.x predicates are JTS-identical DE-9IM.
The engine's flattened-ring polygon representation (model/geometry.py)
is interpreted with EVEN-ODD semantics by relate_poly; the bridge
reproduces that exactly by building multi-ring regions as the GEOS
symmetric difference of the ring polygons (for standard nesting this is
the ordinary shell/holes polygon, and for any even-odd-valid input the
two constructions describe the same region). The cross-validation suite
(tests/test_relate_shapely.py) asserts flag-identity against the exact
integer path on every geometry family whenever the library is present.
"""

from __future__ import annotations

from functools import lru_cache

from ds_jedai_spark.operators.relate import RELATIONS

# engine relation name -> shapely 2.x vectorized predicate name
_PRED = {
    "intersects": "intersects",
    "contains": "contains",
    "within": "within",
    "covers": "covers",
    "coveredby": "covered_by",
    "equals": "equals",
    "touches": "touches",
    "overlaps": "overlaps",
    "crosses": "crosses",
    "disjoint": "disjoint",
}
assert set(_PRED) == set(RELATIONS)


@lru_cache(maxsize=1)
def have_geometry_lib() -> bool:
    """True iff shapely >= 2 is importable (vectorized predicate API)."""
    try:
        import shapely
    except ImportError:
        return False
    try:
        return int(shapely.__version__.split(".")[0]) >= 2
    except (AttributeError, ValueError):
        return False


def build_geometry(gtype: str, parts):
    """Engine (gtype, parts) row -> shapely geometry.

    Polygonal parts-lists with more than one ring go through the
    even-odd construction (see module docstring); everything else maps
    structurally.
    """
    import shapely
    from shapely.geometry import (
        LineString,
        MultiLineString,
        MultiPoint,
        Point,
        Polygon,
    )

    if gtype == "POINT":
        return Point(parts[0][0])
    if gtype == "MULTIPOINT":
        return MultiPoint([pt for part in parts for pt in part])
    if gtype == "LINESTRING":
        return LineString(parts[0])
    if gtype == "MULTILINESTRING":
        return MultiLineString([part for part in parts])
    if gtype in ("POLYGON", "MULTIPOLYGON"):
        if len(parts) == 1:
            return Polygon(parts[0])
        return shapely.symmetric_difference_all(
            [Polygon(ring) for ring in parts]
        )
    raise AssertionError(f"unsupported gtype: {gtype}")


def _rings_cross(parts) -> bool:
    """True when any two rings of a multi-ring region intersect at all.

    The even-odd sym-diff construction manufactures intersection
    vertices in floating point, which can diverge from the engine's
    exact scaled-integer verifier — those rows must NOT go through GEOS.
    Only strict nesting (rings pairwise disjoint: holes/islands) is
    guaranteed float-exact, so ANY intersecting pair — proper cross,
    point touch, or collinear dim-1 overlap (which ``crosses`` alone
    misses: it is False for segment-overlap intersections) — falls back
    to the exact integer path. ``shapely.prepare`` caches the left
    ring's tree across the inner loop; first hit short-circuits."""
    import shapely
    from shapely.geometry import LinearRing

    rings = [LinearRing(p) for p in parts]
    for i in range(len(rings)):
        shapely.prepare(rings[i])
        for j in range(i + 1, len(rings)):
            if rings[i].intersects(rings[j]):
                return True
    return False


def _exact_fallback(gtype: str, parts) -> bool:
    """Rows the GEOS bridge must hand back to the exact integer path."""
    return (
        gtype in ("POLYGON", "MULTIPOLYGON")
        and len(parts) > 1
        and _rings_cross(parts)
    )


def relate_batch(ga, ca, gb, cb) -> dict:
    """Vectorized relation flags for aligned lists of (gtype, parts).

    Returns {relation: np.ndarray[bool]} with the exact column contract
    of ``relate_general.with_general_relations`` — one GEOS call per
    relation over the whole batch, no per-pair Python in the predicate
    step. Rows whose even-odd regions have CROSSING rings (where the
    float sym-diff could drift from the exact oracle, see _rings_cross)
    are computed by the exact scaled-integer path instead.
    """
    import numpy as np
    import shapely

    exact_rows = {
        i
        for i in range(len(ga))
        if _exact_fallback(ga[i], ca[i]) or _exact_fallback(gb[i], cb[i])
    }
    left = np.array(
        [
            build_geometry(g, c) if i not in exact_rows else None
            for i, (g, c) in enumerate(zip(ga, ca))
        ],
        dtype=object,
    )
    right = np.array(
        [
            build_geometry(g, c) if i not in exact_rows else None
            for i, (g, c) in enumerate(zip(gb, cb))
        ],
        dtype=object,
    )
    if exact_rows:
        # GEOS predicates reject None inputs; score placeholder points
        # and overwrite those rows from the exact path below.
        from shapely.geometry import Point

        p0 = Point(0.0, 0.0)
        for i in exact_rows:
            left[i] = p0
            right[i] = p0
    shapely.prepare(left)
    res = {
        rel: np.asarray(getattr(shapely, fn)(left, right), dtype=bool)
        for rel, fn in _PRED.items()
    }
    if exact_rows:
        from ds_jedai_spark.operators.relate_general import relate_pair

        for i in exact_rows:
            d = relate_pair(ga[i], ca[i], gb[i], cb[i])
            for rel in _PRED:
                res[rel][i] = d[rel]
    return res
