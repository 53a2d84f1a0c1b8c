"""Envelope scalar functions: intersection rank and reference point.

Closed-form SQL (shared by Spark plan and DuckDB oracle) for the
reference's envelope operation library (reference:
src/main/scala/utils/geometryUtils/EnvelopeOp.scala:14-49 and
model/approximations/GeometryApproximationT.scala:35-44).
"""

from __future__ import annotations

EPSILON = 1e-8


def _overlap(s: str, t: str) -> str:
    return (
        f"({s}minx <= {t}maxx AND {t}minx <= {s}maxx AND "
        f"{s}miny <= {t}maxy AND {t}miny <= {s}maxy)"
    )


def _covers_axis(a: str, b: str, axis: str) -> str:
    lo, hi = f"min{axis}", f"max{axis}"
    return f"({a}{lo} <= {b}{lo} AND {b}{hi} <= {a}{hi})"


def envelope_rank_expr(s: str = "s_", t: str = "t_") -> str:
    """RANK0-3 ordering of candidate envelope pairs
    (EnvelopeOp.scala:14-30): disjoint(0) < partial(1) < axis-aligned(2)
    < containment(3). Axis-aligned means the intersection spans one
    envelope completely along one axis."""
    contain = (
        f"(({_covers_axis(s, t, 'x')} AND {_covers_axis(s, t, 'y')}) OR "
        f"({_covers_axis(t, s, 'x')} AND {_covers_axis(t, s, 'y')}))"
    )
    axis_aligned = (
        f"({_covers_axis(s, t, 'x')} OR {_covers_axis(t, s, 'x')} OR "
        f"{_covers_axis(s, t, 'y')} OR {_covers_axis(t, s, 'y')})"
    )
    return (
        f"(CASE WHEN NOT {_overlap(s, t)} THEN 0 "
        f"WHEN {contain} THEN 3 "
        f"WHEN {axis_aligned} THEN 2 "
        f"ELSE 1 END)"
    )


def reference_point_exprs(
    s: str = "s_", t: str = "t_", theta: tuple[float, float] = (1.0, 1.0)
) -> dict[str, str]:
    """The pair's reference point in theta units + epsilon
    (GeometryApproximationT.scala:35-44): x from the max of the min-x
    bounds, y from the min of the max-y bounds (upper-left corner of the
    envelope intersection)."""
    tx, ty = theta
    return {
        "ref_x": f"(greatest({s}minx, {t}minx) / {tx!r} + {EPSILON!r})",
        "ref_y": f"(least({s}maxy, {t}maxy) / {ty!r} + {EPSILON!r})",
    }
