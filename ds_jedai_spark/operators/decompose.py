"""Geometry decomposition + fine-grained envelope approximations.

Re-expresses the reference's decompose package (reference:
src/main/scala/utils/geometryUtils/decompose/GridDecomposer.scala:27-97,
RecursiveDecomposer.scala:123-246, EnvelopeRefiner.scala:43-163) without a
geometry library:

- ``decompose_line``: split a polyline along the theta grid blades
  (GridDecomposer for LineStrings) — exact interpolation, length
  preserved.
- ``decompose_polygon``: recursive halving (vertical then horizontal)
  until every piece fits a theta tile (RecursiveDecomposer), clipping with
  Sutherland-Hodgman against axis-aligned half-planes — area preserved
  (holes carry negative signed area).
- ``fine_envelopes``: EnvelopeRefiner — slice the envelope along its
  longer axis and take per-slice tight boxes of the geometry's edges
  (with blade-intersection points), yielding the FineGrainedEnvelopes
  approximation (model/approximations/FineGrainedEnvelopes.scala:11).
- ``seg_slice_envelope_exprs``: the same refinement for 2-point segments
  as CLOSED-FORM SQL — k equal parameter slices, each slice's envelope is
  the bbox of its two endpoints. This keeps the fine-grained *filter*
  entirely JVM-side (and DuckDB-oracle-able): a candidate survives iff
  ANY slice envelope overlaps the other side's envelope
  (FineGrainedEnvelopes.scala:22-55 list-vs-list short-circuit).

Segmented verification with IM union (IndexedDecomposedEntity) is NOT
ported: the engine's verifiers evaluate exact predicates on whole
geometries, so decomposition here serves filtering and load-splitting,
not correctness.
"""

from __future__ import annotations

import math
from collections.abc import Iterator

Pt = tuple[float, float]

FINE_ENVS_FIELD = (
    "fine_envs array<struct<minx: double, miny: double, maxx: double, maxy: double>>"
)


# ------------------------------------------------------------ line blades

def _blade_params(a: float, b: float, theta: float) -> list[float]:
    """Parameters t in (0,1) where a + (b-a)t crosses a multiple of theta."""
    if a == b:
        return []
    lo, hi = (a, b) if a < b else (b, a)
    first = math.floor(lo / theta) + 1
    out = []
    k = first
    while k * theta < hi:
        t = (k * theta - a) / (b - a)
        if 0.0 < t < 1.0:
            out.append(t)
        k += 1
    return out


def decompose_line(
    parts: list[list[Pt]], theta: tuple[float, float]
) -> list[list[Pt]]:
    """Split each polyline part at grid-blade crossings into per-tile
    chains. Total length is preserved (DecompositionTest invariant)."""
    tx, ty = theta
    out: list[list[Pt]] = []
    for part in parts:
        cur: list[Pt] = [tuple(part[0])]
        for (x1, y1), (x2, y2) in zip(part, part[1:]):
            ts = sorted(
                set(_blade_params(x1, x2, tx)) | set(_blade_params(y1, y2, ty))
            )
            prev = (x1, y1)
            for t in ts:
                p = (x1 + (x2 - x1) * t, y1 + (y2 - y1) * t)
                if p != prev:
                    cur.append(p)
                    out.append(cur)
                    cur = [p]
                    prev = p
            end = (x2, y2)
            if end != prev:
                cur.append(end)
        if len(cur) >= 2:
            out.append(cur)
    return out


# ------------------------------------------------- polygon recursive split

def _clip_half_plane(ring: list[Pt], axis: int, bound: float, keep_low: bool) -> list[Pt]:
    """Sutherland-Hodgman clip of a closed ring against one half-plane."""
    if not ring:
        return []
    pts = ring[:-1] if ring[0] == ring[-1] else ring[:]
    out: list[Pt] = []

    def inside(p: Pt) -> bool:
        return p[axis] <= bound if keep_low else p[axis] >= bound

    def cross(p: Pt, q: Pt) -> Pt:
        t = (bound - p[axis]) / (q[axis] - p[axis])
        return (
            (bound, p[1] + (q[1] - p[1]) * t)
            if axis == 0
            else (p[0] + (q[0] - p[0]) * t, bound)
        )

    for p, q in zip(pts, pts[1:] + pts[:1]):
        if inside(p):
            out.append(p)
            if not inside(q):
                out.append(cross(p, q))
        elif inside(q):
            out.append(cross(p, q))
    if len(out) < 3:
        return []
    return out + [out[0]]


def signed_area(ring: list[Pt]) -> float:
    s = 0.0
    for (x1, y1), (x2, y2) in zip(ring, ring[1:]):
        s += x1 * y2 - x2 * y1
    return s / 2.0


def polygon_area(rings: list[list[Pt]]) -> float:
    """|outer| minus hole areas (holes are any ring after the first)."""
    if not rings:
        return 0.0
    return abs(signed_area(rings[0])) - sum(
        abs(signed_area(r)) for r in rings[1:]
    )


def _env_of(rings: list[list[Pt]]) -> tuple[float, float, float, float]:
    xs = [p[0] for r in rings for p in r]
    ys = [p[1] for r in rings for p in r]
    return min(xs), min(ys), max(xs), max(ys)


def decompose_polygon(
    rings: list[list[Pt]], theta: tuple[float, float]
) -> list[list[list[Pt]]]:
    """Recursive halving until each piece's envelope fits a theta tile
    (RecursiveDecomposer.scala:123-246). Returns pieces as ring lists;
    total area is preserved."""
    tx, ty = theta
    rings = [[tuple(p) for p in r] for r in rings]

    def clip_all(rs, axis, bound, keep_low):
        out = [_clip_half_plane(r, axis, bound, keep_low) for r in rs]
        return [r for i, r in enumerate(out) if r and (i == 0 or len(r) >= 4)] if out and out[0] else []

    def rec(rs: list[list[Pt]]) -> list[list[list[Pt]]]:
        if not rs:
            return []
        minx, miny, maxx, maxy = _env_of([rs[0]])
        if maxx - minx <= tx and maxy - miny <= ty:
            return [rs]
        if maxx - minx >= maxy - miny:
            mid, axis = (minx + maxx) / 2.0, 0
        else:
            mid, axis = (miny + maxy) / 2.0, 1
        return rec(clip_all(rs, axis, mid, True)) + rec(clip_all(rs, axis, mid, False))

    return rec(rings)


# ------------------------------------------------------ envelope refiner

def fine_envelopes(
    gtype: str, parts: list[list[Pt]], k: int = 4
) -> list[tuple[float, float, float, float]]:
    """EnvelopeRefiner: k tight sub-envelopes sliced along the longer axis.

    Walks every edge, splits it at slice boundaries (the reference's
    intermediate blade-intersection points, EnvelopeRefiner.scala:43-133),
    and accumulates a tight bbox per slice. The union of the returned
    boxes covers the geometry's boundary; for polygons that equals the
    per-slab bbox of the region since slabs span the full cross-axis.
    """
    # Arrow hands coords back as numpy arrays; normalize to plain tuples.
    parts = [[(float(p[0]), float(p[1])) for p in part] for part in parts]
    pts = [p for part in parts for p in part]
    if gtype == "POINT" or len(pts) == 1:
        x, y = pts[0]
        return [(x, y, x, y)]
    minx, miny, maxx, maxy = _env_of(parts)
    horiz = (maxx - minx) >= (maxy - miny)
    lo, hi = (minx, maxx) if horiz else (miny, maxy)
    if hi == lo:
        return [(minx, miny, maxx, maxy)]
    step = (hi - lo) / k
    boxes: list[list[float]] = [[] for _ in range(k)]

    def slice_idx(v: float) -> int:
        return min(k - 1, max(0, int((v - lo) // step)))

    def add(i: int, x: float, y: float) -> None:
        b = boxes[i]
        if not b:
            boxes[i][:] = [x, y, x, y]
        else:
            b[0], b[1] = min(b[0], x), min(b[1], y)
            b[2], b[3] = max(b[2], x), max(b[3], y)

    closed = gtype in ("POLYGON", "MULTIPOLYGON")
    for part in parts:
        edges = list(zip(part, part[1:]))
        if closed and part[0] != part[-1]:
            edges.append((part[-1], part[0]))
        if not edges and part:
            # Isolated vertex (a MULTIPOINT member): a zero-length
            # self-edge lands the point in its slice box — without it a
            # multipoint produced NO fine envelopes and the decomposed
            # pre-filter dropped every true pair (r11 e2e fuzz find).
            edges = [(part[0], part[0])]
        for (x1, y1), (x2, y2) in edges:
            a = x1 if horiz else y1
            b = x2 if horiz else y2
            ts = (
                sorted(
                    t
                    for t in (
                        ((lo + j * step) - a) / (b - a) for j in range(1, k)
                    )
                    if 0.0 < t < 1.0
                )
                if a != b
                else []
            )
            chain = [(x1, y1)]
            for t in ts:
                chain.append((x1 + (x2 - x1) * t, y1 + (y2 - y1) * t))
            chain.append((x2, y2))
            for (px, py), (qx, qy) in zip(chain, chain[1:]):
                mid = ((px + qx) / 2.0) if horiz else ((py + qy) / 2.0)
                i = slice_idx(mid)
                add(i, px, py)
                add(i, qx, qy)
    return [tuple(b) for b in boxes if b]


def with_fine_envelopes(df, k: int = 4):
    """Append ``fine_envs`` (array of slice boxes) to a parsed-geometry
    DataFrame (model/geometry.py row format). The list-vs-list candidate
    filter is then JVM-side: ``exists(s_fine_envs, a -> exists(t_fine_envs,
    b -> boxes overlap))`` — no Python in the join path."""
    import pandas as pd

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            envs = [
                [
                    {"minx": e[0], "miny": e[1], "maxx": e[2], "maxy": e[3]}
                    for e in fine_envelopes(g, parts, k)
                ]
                if g is not None
                else None
                for g, parts in zip(pdf["gtype"], pdf["coords"])
            ]
            pdf = pdf.reset_index(drop=True)
            pdf["fine_envs"] = envs
            yield pdf

    in_fields = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in df.schema
    )
    return df.mapInPandas(run, f"{in_fields}, {FINE_ENVS_FIELD}")


FINE_OVERLAP_SQL = (
    "exists(s_fine_envs, a -> exists(t_fine_envs, b -> "
    "a.minx <= b.maxx AND b.minx <= a.maxx AND "
    "a.miny <= b.maxy AND b.miny <= a.maxy))"
)


# ------------------------------------- closed-form segment slices (SQL)

def seg_slice_envelope_exprs(p: str, k: int = 4) -> list[dict[str, str]]:
    """Per-slice envelope SQL for a 2-point segment with endpoints
    {p}x1,{p}y1,{p}x2,{p}y2 — slice i covers parameter t in [i/k,(i+1)/k].
    With k a power of two and lattice coordinates, all arithmetic is exact
    in both Spark and DuckDB."""
    out = []
    for i in range(k):
        t0, t1 = i / k, (i + 1) / k

        def at(c: str, t: float) -> str:
            return f"({p}{c}1 + ({p}{c}2 - {p}{c}1) * {t!r})"

        x0, x1_, y0, y1_ = at("x", t0), at("x", t1), at("y", t0), at("y", t1)
        out.append(
            {
                "minx": f"least({x0}, {x1_})",
                "maxx": f"greatest({x0}, {x1_})",
                "miny": f"least({y0}, {y1_})",
                "maxy": f"greatest({y0}, {y1_})",
            }
        )
    return out


def seg_fine_filter_sql(box_p: str, seg_p: str, k: int = 4) -> str:
    """TRUE iff ANY slice envelope of the segment overlaps the box —
    the list-vs-list approximateIntersection with a 1-element left list."""
    terms = []
    for e in seg_slice_envelope_exprs(seg_p, k):
        terms.append(
            f"({box_p}minx <= {e['maxx']} AND {e['minx']} <= {box_p}maxx AND "
            f"{box_p}miny <= {e['maxy']} AND {e['miny']} <= {box_p}maxy)"
        )
    return "(" + " OR ".join(terms) + ")"
