"""Per-entity geometry measures: npoints, length, perimeter, area,
centroid — the ST_NPoints / ST_Length / ST_Perimeter / ST_Area /
ST_Centroid surface a spatial-SQL user expects, over the engine row
format.

The reference has no scalar-measure surface at all (its geometries
exist only to be joined and related); this is a beyond-parity
convenience that reuses the engine's semantics:

* ``npoints`` / ``length`` / ``perimeter`` are PURE JVM column
  expressions (nested ``aggregate`` over the coords arrays —
  whole-stage codegen, no Python, no shuffle). ``length`` is the
  polyline length of (MULTI)LINESTRING parts; ``perimeter`` the total
  ring length of (MULTI)POLYGON parts; each is 0 for other types.

* ``area`` / ``centroid_x`` / ``centroid_y`` need the region's ring
  NESTING (the row format stores rings flattened, orientations as
  found in the wild), so they run on the Arrow batch path: per row,
  ``regroup_rings`` (the exact even-odd locator the sinks use,
  model/geometry.py) resolves shells/holes, then the shoelace formula
  gives |shell| − Σ|holes| and the area-weighted centroid (holes
  subtract). Points average; lines take the length-weighted segment
  midpoint; degenerate (zero-measure) rows fall back to the vertex
  mean. Measures are double-precision FLOAT computations — the exact
  rational machinery stays where exactness matters (predicates).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

_SEG_LEN = (
    "aggregate(coords, 0d, (acc, part) -> acc + (CASE WHEN size(part) >= 2 "
    "THEN aggregate(sequence(0, size(part) - 2), 0d, (s, i) -> "
    "s + sqrt(pow(part[i + 1][0] - part[i][0], 2) + "
    "pow(part[i + 1][1] - part[i][1], 2))) ELSE 0d END))"
)


def npoints_expr() -> "F.Column":
    return F.expr(
        "aggregate(coords, 0, (a, part) -> a + size(part))"
    )


def length_expr() -> "F.Column":
    return F.expr(
        f"CASE WHEN gtype IN ('LINESTRING', 'MULTILINESTRING') "
        f"THEN {_SEG_LEN} ELSE 0d END"
    )


def perimeter_expr() -> "F.Column":
    return F.expr(
        f"CASE WHEN gtype IN ('POLYGON', 'MULTIPOLYGON') "
        f"THEN {_SEG_LEN} ELSE 0d END"
    )


def _areal_measures(gtype: str, parts) -> tuple[float, float, float]:
    """(area, cx, cy) for one row — exact even-odd ring grouping, then
    shoelace area/centroid with hole subtraction."""
    pts = [(float(p[0]), float(p[1])) for part in parts for p in part]
    if not pts:
        # empty coords array (hand-written row-format input that
        # bypassed the readers' validity filter): null centroid, not a
        # ZeroDivisionError that fails the whole Arrow batch task
        return 0.0, float("nan"), float("nan")
    if gtype in ("POLYGON", "MULTIPOLYGON"):
        from ds_jedai_spark.model.geometry import regroup_rings

        area = 0.0
        mx = my = 0.0
        for rings in regroup_rings(
            [[list(map(float, p)) for p in part] for part in parts]
        ):
            for k, ring in enumerate(rings):
                a2 = sx = sy = 0.0
                for (x1, y1), (x2, y2) in zip(ring, ring[1:]):
                    cr = x1 * y2 - x2 * y1
                    a2 += cr
                    sx += (x1 + x2) * cr
                    sy += (y1 + y2) * cr
                a = abs(a2) / 2.0
                sgn = 1.0 if k == 0 else -1.0  # shell adds, holes cut
                area += sgn * a
                if a2 != 0.0:
                    mx += sgn * sx / 6.0 * (1.0 if a2 > 0 else -1.0)
                    my += sgn * sy / 6.0 * (1.0 if a2 > 0 else -1.0)
        if area > 0.0:
            return area, mx / area, my / area
        # degenerate polygon: vertex mean
        return (0.0, sum(x for x, _ in pts) / len(pts),
                sum(y for _, y in pts) / len(pts))
    if gtype in ("LINESTRING", "MULTILINESTRING"):
        tot = mx = my = 0.0
        for part in parts:
            for p, q in zip(part, part[1:]):
                seg = ((q[0] - p[0]) ** 2 + (q[1] - p[1]) ** 2) ** 0.5
                tot += seg
                mx += seg * (p[0] + q[0]) / 2.0
                my += seg * (p[1] + q[1]) / 2.0
        if tot > 0.0:
            return 0.0, mx / tot, my / tot
    return 0.0, sum(x for x, _ in pts) / len(pts), \
        sum(y for _, y in pts) / len(pts)


def with_measures(df: DataFrame) -> DataFrame:
    """Append npoints, length, perimeter, area, centroid_x, centroid_y
    to a row-format DataFrame. JVM expressions carry the first three;
    the areal trio maps the batch through Arrow (one pass, the reader
    transport pattern — never a row-at-a-time Python UDF)."""

    def run(batches):
        import pyarrow as pa

        for batch in batches:
            d = batch.to_pylist()
            areas, cxs, cys = [], [], []
            for row in d:
                a, cx, cy = _areal_measures(row["gtype"], row["coords"])
                areas.append(a)
                cxs.append(cx)
                cys.append(cy)
            yield pa.RecordBatch.from_arrays(
                [batch.column(i) for i in range(batch.num_columns)]
                + [pa.array(areas, pa.float64()),
                   pa.array(cxs, pa.float64()),
                   pa.array(cys, pa.float64())],
                names=batch.schema.names + ["area", "centroid_x",
                                            "centroid_y"],
            )

    base = df.withColumn("npoints", npoints_expr()) \
             .withColumn("length", length_expr()) \
             .withColumn("perimeter", perimeter_expr())
    fields = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in base.schema
    )
    return base.mapInArrow(
        run, f"{fields}, area double, centroid_x double, "
        "centroid_y double",
    )
