"""DE-9IM topological relations as closed-form SQL expressions.

The reference verifies every candidate pair with JTS ``geometry.relate``
(reference: src/main/scala/model/entities/EntityT.scala:42-45 and the 10
boolean accessors in src/main/scala/model/IM.scala:10-19). Our engine's
fast path keeps verification entirely JVM-side: for axis-aligned boxes and
points (the envelope algebra the reference itself uses for filtering —
model/approximations/GeometryApproximationT.scala:33) every DE-9IM relation
has an exact closed form over (minx, miny, maxx, maxy), so verification is
plain whole-stage-codegen'd column arithmetic — no Python, no UDF.

The SQL text is generated ONCE here and consumed both by the Spark plan
(via ``F.expr``) and by the DuckDB oracle builder, so engine and oracle
share a single source of truth.

Semantics (matching JTS for points / positive-area rectangles):
- intersects : closed envelopes overlap
- ii         : interiors intersect (strict overlap; for a point, the
               point itself strictly inside the other / equal point)
- covers     : B subset-of A (bounds containment)
- contains   : covers AND interiors intersect
- equals     : identical bounds
- touches    : intersects AND NOT interiors-intersect
- overlaps   : same dimension AND ii AND neither covers the other
- crosses    : identically false in the box/point algebra (requires a
               lower-dimensional intersection of mixed-dim interiors;
               lines arrive with the general pandas-UDF path)
- within / coveredBy / disjoint : converses / negation
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

RELATIONS = (
    "intersects",
    "contains",
    "within",
    "covers",
    "coveredby",
    "equals",
    "touches",
    "overlaps",
    "crosses",
    "disjoint",
)


_SWAP = {
    "within": "contains",
    "contains": "within",
    "covers": "coveredby",
    "coveredby": "covers",
}


def swap_relation(relation: str) -> str:
    """Relation seen from the other side (reference
    utils/configuration/Constants.scala:30-36): WITHIN<->CONTAINS,
    COVERS<->COVEREDBY; symmetric relations map to themselves."""
    return _SWAP.get(relation, relation)


def _c(p: str, c: str) -> str:
    return f"{p}{c}"


def relation_predicates(s: str = "s_", t: str = "t_") -> dict[str, str]:
    """SQL predicate text per DE-9IM relation over prefixed bound columns."""
    sx1, sy1, sx2, sy2 = _c(s, "minx"), _c(s, "miny"), _c(s, "maxx"), _c(s, "maxy")
    tx1, ty1, tx2, ty2 = _c(t, "minx"), _c(t, "miny"), _c(t, "maxx"), _c(t, "maxy")

    s_pt = f"({sx1} = {sx2} AND {sy1} = {sy2})"
    t_pt = f"({tx1} = {tx2} AND {ty1} = {ty2})"

    intersects = (
        f"({sx1} <= {tx2} AND {tx1} <= {sx2} AND {sy1} <= {ty2} AND {ty1} <= {sy2})"
    )
    # Interiors intersect. Strict overlap handles box-box; a point's
    # interior is itself, so degenerate sides relax strictness on the
    # degenerate axis: point-in-closed-interior == equality-aware form.
    ii_boxbox = f"({sx1} < {tx2} AND {tx1} < {sx2} AND {sy1} < {ty2} AND {ty1} < {sy2})"
    ii_s_point = (
        f"({tx1} < {sx1} AND {sx1} < {tx2} AND {ty1} < {sy1} AND {sy1} < {ty2})"
    )
    ii_t_point = (
        f"({sx1} < {tx1} AND {tx1} < {sx2} AND {sy1} < {ty1} AND {ty1} < {sy2})"
    )
    ii_pt_pt = f"({sx1} = {tx1} AND {sy1} = {ty1})"
    ii = (
        f"(CASE WHEN {s_pt} AND {t_pt} THEN {ii_pt_pt} "
        f"WHEN {s_pt} THEN {ii_s_point} "
        f"WHEN {t_pt} THEN {ii_t_point} "
        f"ELSE {ii_boxbox} END)"
    )

    covers = (
        f"({tx1} >= {sx1} AND {tx2} <= {sx2} AND {ty1} >= {sy1} AND {ty2} <= {sy2})"
    )
    coveredby = (
        f"({sx1} >= {tx1} AND {sx2} <= {tx2} AND {sy1} >= {ty1} AND {sy2} <= {ty2})"
    )
    equals = f"({sx1} = {tx1} AND {sx2} = {tx2} AND {sy1} = {ty1} AND {sy2} = {ty2})"
    same_dim = f"(({s_pt} AND {t_pt}) OR ((NOT {s_pt}) AND (NOT {t_pt})))"

    return {
        "intersects": intersects,
        "ii": ii,
        "covers": covers,
        "coveredby": coveredby,
        "contains": f"({covers} AND {ii})",
        "within": f"({coveredby} AND {ii})",
        "equals": equals,
        "touches": f"({intersects} AND NOT {ii})",
        "overlaps": f"({same_dim} AND {ii} AND NOT {covers} AND NOT {coveredby})",
        "crosses": "false",
        "disjoint": f"(NOT {intersects})",
    }


def with_relations(df: DataFrame, s: str = "s_", t: str = "t_") -> DataFrame:
    """Append one boolean column per DE-9IM relation (r_<name>)."""
    preds = relation_predicates(s, t)
    cols = [F.expr(preds[r]).alias(f"r_{r}") for r in RELATIONS]
    return df.select("*", *cols)
