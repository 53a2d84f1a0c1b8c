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

UNITS. The planar measures are in the dataset's OWN CRS units —
``length``/``perimeter`` in CRS units, ``area`` in CRS units SQUARED.
On EPSG:4326 data that means DEGREES and DEGREES² (the classic
PostGIS-geometry footgun, stated here instead of silently shipped):
the ``unit`` column carries 'deg' (EPSG:4326/OGC:CRS84 input), 'm'
(EPSG:3857), or 'crs' (unknown frame) so the semantics travel with
the rows. For real distances/areas on lon/lat data, pass
``geodesic=True``: ``length_m``/``perimeter_m`` come from the
haversine great-circle formula (pure JVM nested aggregates — the SQL
text is shared with the DuckDB gate oracle via ``haversine_sql``),
and ``area_m2`` from the exact Green's-theorem ring integral for
lon/lat-straight edges (the closed form whose trapezoid approximation
is Chamberlain & Duquette, "Some Algorithms for Polygons on a
Sphere", JPL 07-03), with holes subtracting exactly like the planar
path. Both use the
IUGG mean Earth radius ``MEAN_R``; geodesic mode requires declared
EPSG:4326 input (raises otherwise — reproject first). Spherical closed
forms are only valid when no edge crosses the antimeridian, so rows
containing any |Δlon| > 180° edge get NULL geodesic measures
(``length_m``/``perimeter_m``/``area_m2``) instead of a silently wrong
number — the same honesty contract the geodesic distance join enforces
by splitting wrapped envelopes (spatial_join.py). ``seam="shift"``
goes one step further and MEASURES such rows correctly: their negative
longitudes are normalized +360 (Fiji's ring becomes 179..181), the
spherical sums run on the shifted coordinates (all great-circle /
Green's-theorem terms are longitude-translation invariant), and only
rows STILL wrapped after the shift (geometries genuinely spanning more
than 180° of longitude, where "which way round" is ambiguous) stay
NULL. Planar measures always use the literal coordinates either way.

EXECUTION. The areal pass is VECTORIZED: one numpy pass over the Arrow
list-offset buffers (the relate_general._flatten3 pattern — per-pair
cross products, per-ring/per-row sums via bincount, no per-row Python
objects). Only polygons with >1 ring drop to the exact per-row ring
regrouping (shell/hole nesting is a sequential even-odd decision), and
only those rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

# IUGG mean Earth radius (meters) — the standard haversine sphere.
MEAN_R = 6371008.8

_SEG_LEN = (
    "aggregate(coords, 0d, (acc, part) -> acc + (CASE WHEN size(part) >= 2 "
    "THEN aggregate(sequence(0, size(part) - 2), 0d, (s, i) -> "
    "s + sqrt(pow(part[i + 1][0] - part[i][0], 2) + "
    "pow(part[i + 1][1] - part[i][1], 2))) ELSE 0d END))"
)


def haversine_sql(x1: str, y1: str, x2: str, y2: str) -> str:
    """Great-circle meters between two lon/lat-degree points as ONE SQL
    text — executed verbatim by both Spark (JVM codegen) and the DuckDB
    gate oracle, so correctness comparisons exercise the engine, not
    formula transcription. ``least(1.0, ...)`` clamps float dust at the
    antipodal asin boundary."""
    return (
        f"2.0 * {MEAN_R!r} * asin(least(1.0, sqrt("
        f"pow(sin(radians(({y2}) - ({y1})) / 2.0), 2) + "
        f"cos(radians({y1})) * cos(radians({y2})) * "
        f"pow(sin(radians(({x2}) - ({x1})) / 2.0), 2))))"
    )


_GEO_SEG_LEN = (
    "aggregate(coords, 0d, (acc, part) -> acc + (CASE WHEN size(part) >= 2 "
    "THEN aggregate(sequence(0, size(part) - 2), 0d, (s, i) -> s + ("
    + haversine_sql("part[i][0]", "part[i][1]",
                    "part[i + 1][0]", "part[i + 1][1]")
    + ")) ELSE 0d END))"
)


# any edge spanning more than 180° of longitude means the geometry
# crosses the antimeridian (or is malformed): spherical closed forms
# over lon/lat-straight edges are undefined there, so geodesic measures
# go NULL for the row (module docstring) — pure JVM higher-order exists.
# 'coords' appears exactly once, so _on() can rebind the source column.
_WRAP_SQL = (
    "exists(coords, part -> size(part) >= 2 AND "
    "exists(sequence(0, size(part) - 2), i -> "
    "abs(part[i + 1][0] - part[i][0]) > 180.0d))"
)

# seam="shift" normalization: negative longitudes + 360 (only applied
# to rows the wrap detector flagged — see with_measures)
_SHIFT_SQL = (
    "transform(coords, part -> transform(part, p -> "
    "array(CASE WHEN p[0] < 0.0d THEN p[0] + 360.0d ELSE p[0] END, "
    "p[1])))"
)


def _on(template: str, col: str) -> str:
    """Rebind a coords-referencing SQL template onto another column
    (each template references 'coords' exactly once)."""
    return template.replace("coords", col)


def _geo_measure_expr(kinds: str, src: str) -> str:
    """NULL-on-wrap geodesic sum over the ``src`` coords column for the
    given gtype set."""
    return (
        f"CASE WHEN {_on(_WRAP_SQL, src)} THEN CAST(NULL AS DOUBLE) "
        f"WHEN gtype IN ({kinds}) "
        f"THEN {_on(_GEO_SEG_LEN, src)} ELSE 0d END"
    )


def geodesic_length_expr(src: str = "coords") -> "F.Column":
    return F.expr(
        _geo_measure_expr("'LINESTRING', 'MULTILINESTRING'", src))


def geodesic_perimeter_expr(src: str = "coords") -> "F.Column":
    return F.expr(_geo_measure_expr("'POLYGON', 'MULTIPOLYGON'", src))


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


def _ring_sphere_area_m2(ring) -> float:
    """One ring's unsigned spherical area (m²) over lon/lat-degree
    vertices whose edges are straight in lon/lat space (the engine's
    edge semantics — these are planar geometries reinterpreted on the
    sphere, not great-circle polygons). Green's theorem gives
    area = |∮ sin φ dλ| · R², and the per-edge integral has a CLOSED
    FORM for a lon/lat-linear edge:

        ∫ sin φ dλ = Δλ · sin(φ_mid) · sinc(Δφ/2)

    (cos difference identity; sinc(0) = 1 keeps constant-latitude edges
    exact). This is what the Chamberlain & Duquette ring sum
    (JPL 07-03, the turf.js formula) approximates with a trapezoid rule
    — the closed form costs the same and has no O(Δφ³) edge error."""
    import math

    s = 0.0
    for (x1, y1), (x2, y2) in zip(ring, ring[1:]):
        dlmb = math.radians(x2 - x1)
        p1, p2 = math.radians(y1), math.radians(y2)
        half = (p2 - p1) / 2.0
        sinc = 1.0 if half == 0.0 else math.sin(half) / half
        s += dlmb * math.sin((p1 + p2) / 2.0) * sinc
    return abs(s) * MEAN_R * MEAN_R


def _geodesic_area_m2(gtype: str, parts) -> float:
    """Spherical polygon area with hole subtraction — the same ring
    nesting (regroup_rings) as the planar path, spherical ring sums."""
    if gtype not in ("POLYGON", "MULTIPOLYGON") or not parts:
        return 0.0
    from ds_jedai_spark.model.geometry import regroup_rings

    area = 0.0
    for rings in regroup_rings(
        [[list(map(float, p)) for p in part] for part in parts]
    ):
        for k, ring in enumerate(rings):
            a = _ring_sphere_area_m2([(p[0], p[1]) for p in ring])
            area += a if k == 0 else -a
    return max(area, 0.0)


def _row_wrap(parts) -> bool:
    """Per-row antimeridian test for the (rare) per-row path — any
    intra-part edge spanning more than 180° of longitude."""
    for part in parts:
        for p, q in zip(part, part[1:]):
            if abs(float(q[0]) - float(p[0])) > 180.0:
                return True
    return False


def _areal_batch(gt, coords_arr, geodesic: bool):
    """Vectorized areal measures over ONE Arrow batch: numpy over the
    list-offset buffers (relate_general._flatten3 — zero-copy views of
    the flat coordinate buffer), per-pair shoelace/segment/spherical
    terms, per-ring and per-row sums via np.bincount (sequential
    accumulation — no cumsum-difference cancellation). Polygons with
    more than one ring drop to the exact per-row shell/hole regrouping
    (_areal_measures); everything else never touches per-row Python.

    Returns (area, cx, cy, gm2-or-None, wrap) numpy arrays, or None if
    the batch has non-[x,y] leaves (per-row fallback handles those)."""
    import numpy as np

    from ds_jedai_spark.operators.relate_general import _flatten3

    n = len(gt)
    o1, o2, o3, vals = _flatten3(coords_arr)
    j0, j1 = int(o1[0]), int(o1[n])
    p0, p1 = int(o2[j0]), int(o2[j1])
    P = p1 - p0
    if P and not np.all(o3[p0 + 1:p1 + 1] - o3[p0:p1] == 2):
        return None  # ragged leaves: exact per-row path
    idx = o3[p0:p1]
    X = vals[idx]
    Y = vals[idx + 1]

    gt = np.asarray(gt, dtype=object)
    is_poly = (gt == "POLYGON") | (gt == "MULTIPOLYGON")
    is_line = (gt == "LINESTRING") | (gt == "MULTILINESTRING")
    nparts = j1 - j0
    nr = o1[1:] - o1[:-1]  # parts (rings) per row
    npts_part = o2[j0 + 1:j1 + 1] - o2[j0:j1]
    npts_row = o2[o1[1:]] - o2[o1[:-1]]

    # universal fallback centroid: the vertex mean (nan for empty rows)
    rop_pt = np.repeat(np.arange(n), npts_row)
    sumx = np.bincount(rop_pt, weights=X, minlength=n)
    sumy = np.bincount(rop_pt, weights=Y, minlength=n)
    with np.errstate(invalid="ignore", divide="ignore"):
        cx = sumx / npts_row
        cy = sumy / npts_row
    area = np.zeros(n)
    gm2 = np.zeros(n) if geodesic else None
    wrap = np.zeros(n, dtype=bool)

    if P >= 2 and nparts:
        pop = np.repeat(np.arange(nparts), npts_part)  # part of each point
        valid = pop[:-1] == pop[1:]  # intra-part adjacent pairs only
        pp = pop[:-1][valid]  # part index of each pair
        x1, y1 = X[:-1][valid], Y[:-1][valid]
        x2, y2 = X[1:][valid], Y[1:][valid]
        rop = np.repeat(np.arange(n), nr)  # row of each part

        wrap = np.bincount(
            rop[pp], weights=(np.abs(x2 - x1) > 180.0), minlength=n
        ) > 0

        cr = x1 * y2 - x2 * y1
        a2 = np.bincount(pp, weights=cr, minlength=nparts)
        sx = np.bincount(pp, weights=(x1 + x2) * cr, minlength=nparts)
        sy = np.bincount(pp, weights=(y1 + y2) * cr, minlength=nparts)
        seg = np.hypot(x2 - x1, y2 - y1)
        sl = np.bincount(pp, weights=seg, minlength=nparts)
        mxs = np.bincount(pp, weights=seg * (x1 + x2) / 2.0,
                          minlength=nparts)
        mys = np.bincount(pp, weights=seg * (y1 + y2) / 2.0,
                          minlength=nparts)

        # lines: length-weighted segment-midpoint centroid over ALL
        # parts (no grouping question for lines)
        tot = np.bincount(rop, weights=sl, minlength=n)
        lmx = np.bincount(rop, weights=mxs, minlength=n)
        lmy = np.bincount(rop, weights=mys, minlength=n)
        m = is_line & (tot > 0)
        cx[m] = lmx[m] / tot[m]
        cy[m] = lmy[m] / tot[m]

        # single-ring polygons: the ring IS the shell — no regrouping
        fp = o1[:-1] - j0  # each row's first part, local index
        sp = is_poly & (nr == 1)
        j = fp[sp]
        a2r = a2[j]
        ar = np.abs(a2r) / 2.0
        area[sp] = ar
        mxr = np.where(a2r > 0, sx[j], -sx[j]) / 6.0
        myr = np.where(a2r > 0, sy[j], -sy[j]) / 6.0
        pos = ar > 0
        gi = np.nonzero(sp)[0][pos]
        cx[gi] = mxr[pos] / ar[pos]
        cy[gi] = myr[pos] / ar[pos]

        if geodesic:
            dl = np.radians(x2 - x1)
            ph1, ph2 = np.radians(y1), np.radians(y2)
            half = (ph2 - ph1) / 2.0
            sinc = np.ones_like(half)
            nz = half != 0.0
            sinc[nz] = np.sin(half[nz]) / half[nz]
            gq = dl * np.sin((ph1 + ph2) / 2.0) * sinc
            g_p = np.bincount(pp, weights=gq, minlength=nparts)
            gm2[sp] = np.abs(g_p[j]) * (MEAN_R * MEAN_R)

    # multi-ring polygons: exact shell/hole regrouping per row, but the
    # per-ring shoelace / spherical sums come from the VECTORIZED
    # per-part arrays above (r18) — the former fallback re-ran the pure
    # Python point loops of _areal_measures/_geodesic_area_m2 for every
    # multi-ring row. Only the even-odd nesting (regroup_rings' exact
    # point-location) still reads coordinates row-side; accumulation
    # order and expression shapes replicate _areal_measures exactly
    # (groups-then-members iteration IS original ring order — a ring
    # only ever joins the CURRENT polygon), so results are bit-identical.
    # (P < 2 means no intra-part pair anywhere: every ring is a single
    # point or empty, so the defaults — area 0, vertex-mean centroid,
    # spherical 0 — already equal _areal_measures' degenerate answers)
    mrows = np.nonzero(is_poly & (nr > 1))[0]
    if mrows.size and P >= 2 and nparts:
        from ds_jedai_spark.model.geometry import regroup_rings

        for i in mrows:
            ringsl = [
                np.column_stack(
                    [X[o2[jg] - p0:o2[jg + 1] - p0],
                     Y[o2[jg] - p0:o2[jg + 1] - p0]]
                ).tolist()
                for jg in range(o1[i], o1[i + 1])
            ]
            pos = {id(r): t for t, r in enumerate(ringsl)}
            base = int(o1[i]) - j0
            a_i = 0.0
            mx = my = 0.0
            g_i = 0.0
            for rings in regroup_rings(ringsl):
                for k, ring in enumerate(rings):
                    jloc = base + pos[id(ring)]
                    a2r = a2[jloc]
                    a = abs(a2r) / 2.0
                    sgn = 1.0 if k == 0 else -1.0
                    a_i += sgn * a
                    if a2r != 0.0:
                        mx += sgn * sx[jloc] / 6.0 * \
                            (1.0 if a2r > 0 else -1.0)
                        my += sgn * sy[jloc] / 6.0 * \
                            (1.0 if a2r > 0 else -1.0)
                    if geodesic:
                        ga = abs(g_p[jloc]) * MEAN_R * MEAN_R
                        g_i += ga if k == 0 else -ga
            if a_i > 0.0:
                area[i] = a_i
                cx[i] = mx / a_i
                cy[i] = my / a_i
            # else: area stays 0.0 and cx/cy keep the vertex mean —
            # the same degenerate fallback _areal_measures returns
            if geodesic:
                gm2[i] = max(g_i, 0.0)
    return area, cx, cy, gm2, wrap


def _planar_unit(df: DataFrame) -> str:
    meta = (df.schema["gtype"].metadata or {}) if "gtype" in df.columns \
        else {}
    crs = meta.get("crs")
    if crs in ("EPSG:4326", "OGC:CRS84"):
        return "deg"
    if crs == "EPSG:3857":
        return "m"
    return "crs"


def with_measures(
    df: DataFrame,
    geodesic: bool = False,
    vectorize: bool = True,
    seam: str = "null",
) -> DataFrame:
    """Append npoints, length, perimeter, area, centroid_x, centroid_y
    and a ``unit`` column (the planar measures' CRS unit — see module
    docstring) to a row-format DataFrame. JVM expressions carry the
    first three; the areal trio runs VECTORIZED over the Arrow batch
    buffers (_areal_batch — never a row-at-a-time Python UDF, and no
    per-row Python objects except for multi-ring polygons).

    ``geodesic=True`` (declared-EPSG:4326 input only) additionally
    appends ``length_m`` / ``perimeter_m`` (haversine, pure JVM) and
    ``area_m2`` (spherical excess, same Arrow pass). Rows with any
    antimeridian-crossing edge (|Δlon| > 180°) get NULL for all three
    geodesic columns under the default ``seam="null"``;
    ``seam="shift"`` instead normalizes such rows' negative longitudes
    +360 and measures them correctly, nulling only rows still wrapped
    after the shift — see the module docstring's seam contract.

    ``vectorize=False`` forces the legacy exact per-row path (the same
    code the vectorized pass uses for multi-ring rows) — kept as the
    differential baseline for tests and the perf probe."""
    if seam not in ("null", "shift"):
        raise ValueError(
            f"with_measures: seam must be 'null' or 'shift', got {seam!r}"
        )
    unit = _planar_unit(df)
    if geodesic and unit != "deg":
        raise ValueError(
            "with_measures(geodesic=True) needs declared EPSG:4326 "
            f"(lon/lat degree) input; got CRS unit {unit!r} — reproject "
            "to EPSG:4326 first (-op reproject)"
        )

    def run(batches):
        import numpy as np
        import pyarrow as pa

        for batch in batches:
            gcol = batch.column(batch.schema.names.index("gtype"))
            ccol = batch.column(batch.schema.names.index("coords"))
            gtypes = gcol.to_pylist()
            res = _areal_batch(gtypes, ccol, geodesic) if vectorize \
                else None
            if res is not None:
                areas, cxs, cys, areas_m2, wrap = res
            else:
                # exact per-row path: ragged leaves or vectorize=False
                coords = ccol.to_pylist()
                areas, cxs, cys = [], [], []
                areas_m2, wrap = [], []
                for g, c in zip(gtypes, coords):
                    a, cx, cy = _areal_measures(g, c)
                    areas.append(a)
                    cxs.append(cx)
                    cys.append(cy)
                    if geodesic:
                        areas_m2.append(_geodesic_area_m2(g, c))
                        wrap.append(_row_wrap(c))
                wrap = np.asarray(wrap if geodesic else
                                  [False] * len(areas), dtype=bool)
            if geodesic and seam == "shift" and wrap.any():
                # normalize the (rare) wrapped rows +360 and re-measure;
                # only rows still wrapped after the shift stay NULL
                for i in np.nonzero(wrap)[0]:
                    parts = [
                        [[p[0] + 360.0 if p[0] < 0.0 else p[0], p[1]]
                         for p in part]
                        for part in ccol[int(i)].as_py()
                    ]
                    if not _row_wrap(parts):
                        areas_m2[i] = _geodesic_area_m2(gtypes[i], parts)
                        wrap[i] = False
            extra_cols = [pa.array(areas, pa.float64()),
                          pa.array(cxs, pa.float64()),
                          pa.array(cys, pa.float64())]
            extra_names = ["area", "centroid_x", "centroid_y"]
            if geodesic:
                extra_cols.append(
                    pa.array(np.asarray(areas_m2, dtype=np.float64),
                             pa.float64(), mask=wrap))
                extra_names.append("area_m2")
            yield pa.RecordBatch.from_arrays(
                [batch.column(i) for i in range(batch.num_columns)]
                + extra_cols,
                names=batch.schema.names + extra_names,
            )

    # The Arrow pass reads ONLY gtype + coords; every JVM-expression
    # column (npoints/length/perimeter/unit and the geodesic meter
    # sums) is attached AFTER the map so it never crosses the Python
    # boundary (guide §4.1: ship only what the function needs — r17
    # optimization round; previously ~7 derived columns rode through
    # the Python worker both ways). Output schema order is unchanged.
    out_extra = ", area double, centroid_x double, centroid_y double"
    if geodesic:
        out_extra += ", area_m2 double"
    fields = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in df.schema
    )
    mapped = df.mapInArrow(run, fields + out_extra)
    res = mapped.withColumn("npoints", npoints_expr()) \
                .withColumn("length", length_expr()) \
                .withColumn("perimeter", perimeter_expr()) \
                .withColumn("unit", F.lit(unit))
    if geodesic:
        if seam == "shift":
            # bind the (conditionally) shifted coords once; the meter
            # sums and the residual-wrap test both read the bound column
            res = res.withColumn(
                "__sc",
                F.expr(f"CASE WHEN {_WRAP_SQL} THEN {_SHIFT_SQL} "
                       f"ELSE coords END"),
            )
            res = res.withColumn(
                "length_m", geodesic_length_expr("__sc")
            ).withColumn(
                "perimeter_m", geodesic_perimeter_expr("__sc")
            ).drop("__sc")
        else:
            res = res.withColumn("length_m", geodesic_length_expr()) \
                     .withColumn("perimeter_m",
                                 geodesic_perimeter_expr())
    order = list(df.columns) + ["npoints", "length", "perimeter", "unit"]
    if geodesic:
        order += ["length_m", "perimeter_m"]
    order += ["area", "centroid_x", "centroid_y"]
    if geodesic:
        order += ["area_m2"]
    return res.select(*order)
