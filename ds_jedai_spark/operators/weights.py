"""Pair-weighting functions for progressive interlinking.

Re-expresses the reference's WeightedPairFactory
(reference: src/main/scala/model/weightedPairs/WeightedPairFactory.scala:73-112)
as closed-form SQL arithmetic over envelope columns — no per-pair objects,
no priority queues; ordering happens in window/top-k plans downstream.

Weights (all over the virtual tile grid of granularity theta):
- CF   — co-occurrence frequency: #common tiles of the pair
- JS   — Jaccard similarity over tile sets: cb / (sb + tb - cb)
- X2   — Pearson chi-square over the 2x2 tile contingency table
- MBRO — MBR overlap: envelope IoU
- ISP  — inverse sum of points: 1 / (points_s + points_t)

The reference's ``safeDivision`` quirk (integer division collapsing JS/X2
to whole floats, WeightedPairFactory.scala:57-60) is consciously fixed:
we compute real-valued weights (SURVEY.md §2.11).

Like operators/relate.py, formulas are generated once as SQL text and
consumed by both the Spark plan (``F.expr``) and the DuckDB oracle, with
theta fixed to exact literals so both engines see identical arithmetic.
"""

from __future__ import annotations

WEIGHT_FUNCS = ("cf", "js", "x2", "mbro", "isp")


def tiles_expr(p: str, axis: str, theta: float) -> str:
    """#tiles covered by the envelope of side ``p`` along one axis."""
    lo, hi = (f"{p}minx", f"{p}maxx") if axis == "x" else (f"{p}miny", f"{p}maxy")
    return f"(floor({hi} / {theta!r}) - floor({lo} / {theta!r}) + 1)"


def side_tiles_expr(p: str, theta_x: float, theta_y: float) -> str:
    return f"({tiles_expr(p, 'x', theta_x)} * {tiles_expr(p, 'y', theta_y)})"


def common_tiles_expr(s: str, t: str, theta_x: float, theta_y: float) -> str:
    """#tiles shared by the two envelopes (envelopes assumed to intersect)."""
    cx = (
        f"(least(floor({s}maxx / {theta_x!r}), floor({t}maxx / {theta_x!r})) - "
        f"greatest(floor({s}minx / {theta_x!r}), floor({t}minx / {theta_x!r})) + 1)"
    )
    cy = (
        f"(least(floor({s}maxy / {theta_y!r}), floor({t}maxy / {theta_y!r})) - "
        f"greatest(floor({s}miny / {theta_y!r}), floor({t}miny / {theta_y!r})) + 1)"
    )
    return f"({cx} * {cy})"


def weight_exprs(
    s: str = "s_",
    t: str = "t_",
    theta_x: float = 1.0,
    theta_y: float = 1.0,
    total_blocks: int = 10000,
) -> dict[str, str]:
    """SQL text per weighting function over prefixed envelope columns."""
    sb = side_tiles_expr(s, theta_x, theta_y)
    tb = side_tiles_expr(t, theta_x, theta_y)
    cb = common_tiles_expr(s, t, theta_x, theta_y)

    js = f"(CAST({cb} AS DOUBLE) / CAST({sb} + {tb} - {cb} AS DOUBLE))"

    # 2x2 contingency over the N = total_blocks grid cells:
    #   n11 = cb, n12 = sb - cb, n21 = tb - cb, n22 = N - sb - tb + cb
    n = float(total_blocks)
    n11, n12 = cb, f"({sb} - {cb})"
    n21, n22 = f"({tb} - {cb})", f"({n!r} - {sb} - {tb} + {cb})"

    def chi_term(nij: str, row: str, col: str) -> str:
        e = f"(CAST({row} AS DOUBLE) * CAST({col} AS DOUBLE) / {n!r})"
        return f"(CASE WHEN {e} = 0 THEN 0.0 ELSE ({nij} - {e}) * ({nij} - {e}) / {e} END)"

    row1, row2 = f"({n11} + {n12})", f"({n21} + {n22})"
    col1, col2 = f"({n11} + {n21})", f"({n12} + {n22})"
    x2 = (
        f"({chi_term(n11, row1, col1)} + {chi_term(n12, row1, col2)} + "
        f"{chi_term(n21, row2, col1)} + {chi_term(n22, row2, col2)})"
    )

    ix = f"(least({s}maxx, {t}maxx) - greatest({s}minx, {t}minx))"
    iy = f"(least({s}maxy, {t}maxy) - greatest({s}miny, {t}miny))"
    inter = f"(greatest({ix}, 0.0) * greatest({iy}, 0.0))"
    s_area = f"(({s}maxx - {s}minx) * ({s}maxy - {s}miny))"
    t_area = f"(({t}maxx - {t}minx) * ({t}maxy - {t}miny))"
    denom = f"({s_area} + {t_area} - {inter})"
    mbro = f"(CASE WHEN {denom} = 0 THEN 0.0 ELSE {inter} / {denom} END)"

    # Envelope geometries: 5 boundary points for a box, 1 for a point.
    def npoints(p: str) -> str:
        return f"(CASE WHEN {p}minx = {p}maxx AND {p}miny = {p}maxy THEN 1 ELSE 5 END)"

    isp = f"(1.0 / CAST({npoints(s)} + {npoints(t)} AS DOUBLE))"

    return {
        "cf": f"CAST({cb} AS DOUBLE)",
        "js": js,
        "x2": x2,
        "mbro": mbro,
        "isp": isp,
    }
