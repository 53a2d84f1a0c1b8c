"""Deterministic geometry derivation from the driver's TPC-H-ish tables.

The test parquet (TESTDATA.md) carries no geometry columns; per FIXTURES.md
§F5 we derive SOURCE / TARGET spatial datasets deterministically from the
integer keys. The derivation is emitted as SQL text from ONE generator and
executed verbatim by BOTH engines (Spark SQL and the DuckDB oracle), so the
two sides agree bit-for-bit.

Exactness contract: every coordinate is an integer number of 1/16 units
(exact in binary floating point), so box arithmetic (intersections, areas,
tile indices) is order-independent and reproducible across engines.

Geometry mix mirrors the reference's ingestion contract (axis-aligned
envelopes are the reference's MBR approximation — see
/root/reference/src/main/scala/model/approximations/MBR.scala:5-10); the
box lattice guarantees non-zero counts for touches/covers/equals relations
(shared edges occur with probability ~1/GRID per axis).
"""

from __future__ import annotations

# Domain: coordinates in [0, 96) + max width 25/16 → [0, ~97.6).
GRID = 1536  # number of 1/16 cells per axis → 96.0 units
SCALE = 16.0

# Odd multiplicative-hash constants (public-domain Knuth/Fibonacci style).
SRC_MX = 2654435761
SRC_MY = 2246822519
TGT_MX = 2862933555
TGT_MY = 3267000013


def _box_exprs(key: str, mx: int, my: int, wmul: int, hmul: int) -> dict[str, str]:
    """Closed-form box from an integer key; all values multiples of 1/16."""
    minx = f"(CAST(({key} * {mx}) % {GRID} AS DOUBLE) / {SCALE})"
    miny = f"(CAST(({key} * {my}) % {GRID} AS DOUBLE) / {SCALE})"
    w = f"(CAST(1 + (({key} * {wmul}) % 24) AS DOUBLE) / {SCALE})"
    h = f"(CAST(1 + (({key} * {hmul}) % 24) AS DOUBLE) / {SCALE})"
    return {
        "minx": minx,
        "miny": miny,
        "maxx": f"({minx} + {w})",
        "maxy": f"({miny} + {h})",
    }


def source_box_sql(table: str = "part", key: str = "p_partkey") -> str:
    """SOURCE dataset: one axis-aligned box per part row."""
    b = _box_exprs(key, SRC_MX, SRC_MY, 1, 7)
    return (
        f"SELECT CAST({key} AS BIGINT) AS id, {b['minx']} AS minx, {b['miny']} AS miny, "
        f"{b['maxx']} AS maxx, {b['maxy']} AS maxy FROM {table}"
    )


def target_box_sql(table: str = "orders", key: str = "o_orderkey") -> str:
    """TARGET dataset: one box per orders row.

    Rows with key % 97 == 0 mimic the SOURCE formula on a folded key so the
    EQUALS relation has non-zero support (identical boxes across datasets).
    """
    own = _box_exprs(key, TGT_MX, TGT_MY, 11, 5)
    mimic_key = f"({key} % 1777)"
    mim = _box_exprs(mimic_key, SRC_MX, SRC_MY, 1, 7)
    cols = []
    for c in ("minx", "miny", "maxx", "maxy"):
        cols.append(
            f"CASE WHEN {key} % 97 = 0 THEN {mim[c]} ELSE {own[c]} END AS {c}"
        )
    return f"SELECT CAST({key} AS BIGINT) AS id, {', '.join(cols)} FROM {table}"


def point_exprs(key: str) -> dict[str, str]:
    """Column SQL for the lattice-point derivation (shared with streaming)."""
    x = f"(CAST(({key} * {SRC_MX}) % {GRID + 25} AS DOUBLE) / {SCALE})"
    y = f"(CAST(({key} * {TGT_MY}) % {GRID + 25} AS DOUBLE) / {SCALE})"
    return {
        "id": f"CAST({key} AS BIGINT)",
        "minx": x,
        "miny": y,
        "maxx": x,
        "maxy": y,
    }


def point_sql(table: str = "customer", key: str = "c_custkey") -> str:
    """POINT dataset: one lattice point per customer row (minx=maxx etc.)."""
    e = point_exprs(key)
    cols = ", ".join(f"{v} AS {k}" for k, v in e.items())
    return f"SELECT {cols} FROM {table}"


def line_sql(table: str = "customer", key: str = "c_custkey") -> str:
    """LINESTRING dataset: one lattice 2-point segment per customer row.

    Exposes x1/y1/x2/y2 plus the envelope columns the tile join runs on.
    Degenerate (zero-length) segments are excluded.
    """
    x1 = f"(CAST(({key} * {SRC_MX}) % {GRID} AS DOUBLE) / {SCALE})"
    y1 = f"(CAST(({key} * {SRC_MY}) % {GRID} AS DOUBLE) / {SCALE})"
    dx = f"(CAST(({key} * 13) % 49 - 24 AS DOUBLE) / {SCALE})"
    dy = f"(CAST(({key} * 29) % 49 - 24 AS DOUBLE) / {SCALE})"
    return (
        f"SELECT id, x1, y1, x2, y2, "
        f"least(x1, x2) AS minx, least(y1, y2) AS miny, "
        f"greatest(x1, x2) AS maxx, greatest(y1, y2) AS maxy FROM ("
        f"SELECT CAST({key} AS BIGINT) AS id, {x1} AS x1, {y1} AS y1, "
        f"{x1} + {dx} AS x2, {y1} + {dy} AS y2 FROM {table} "
        f"WHERE NOT (({key} * 13) % 49 = 24 AND ({key} * 29) % 49 = 24)) t"
    )


POINT_ID_OFFSET = 1_000_000_000


def multipoint_sql(table: str = "customer", key: str = "c_custkey") -> str:
    """MULTIPOINT dataset: 3 lattice points per customer row.

    Anchored on the same base as line_sql so relations actually occur:
    p1 equals the same-key segment's start vertex (boundary contact), p2 is
    the exact segment midpoint whenever both deltas are even (interior
    contact, ~1/4 of keys) and a near-miss otherwise, p3 scatters ±2 units.
    Halving uses `(v - v % 2) / 2` — integer-exact and identical in Spark
    and DuckDB (both give % the dividend's sign).
    """
    x1 = f"(CAST(({key} * {SRC_MX}) % {GRID} AS DOUBLE) / {SCALE})"
    y1 = f"(CAST(({key} * {SRC_MY}) % {GRID} AS DOUBLE) / {SCALE})"
    vx = f"(({key} * 13) % 49 - 24)"
    vy = f"(({key} * 29) % 49 - 24)"
    hx = f"(CAST(({vx} - {vx} % 2) / 2 AS DOUBLE) / {SCALE})"
    hy = f"(CAST(({vy} - {vy} % 2) / 2 AS DOUBLE) / {SCALE})"
    sx = f"(CAST(({key} * 19) % 65 - 32 AS DOUBLE) / {SCALE})"
    sy = f"(CAST(({key} * 31) % 65 - 32 AS DOUBLE) / {SCALE})"
    return (
        f"SELECT id, p1x, p1y, p2x, p2y, p3x, p3y, "
        f"least(p1x, p2x, p3x) AS minx, least(p1y, p2y, p3y) AS miny, "
        f"greatest(p1x, p2x, p3x) AS maxx, greatest(p1y, p2y, p3y) AS maxy "
        f"FROM (SELECT CAST({key} AS BIGINT) AS id, "
        f"{x1} AS p1x, {y1} AS p1y, "
        f"{x1} + {hx} AS p2x, {y1} + {hy} AS p2y, "
        f"{x1} + {sx} AS p3x, {y1} + {sy} AS p3y FROM {table}) t"
    )


def triangle_sql(table: str = "part", key: str = "p_partkey") -> str:
    """TRIANGLE dataset: 3 lattice vertices per supplier row, degenerate
    (zero-area) triangles excluded; exposes vertex + envelope columns."""
    x1 = f"(CAST(({key} * {SRC_MX}) % {GRID} AS DOUBLE) / {SCALE})"
    y1 = f"(CAST(({key} * {SRC_MY}) % {GRID} AS DOUBLE) / {SCALE})"
    # Constants distinct from line_sql's (13, 29) so segments never
    # coincide with triangle edges; range +/-6 units makes containment of
    # small segments actually occur.
    dx2 = f"(CAST(({key} * 17) % 193 - 96 AS DOUBLE) / {SCALE})"
    dy2 = f"(CAST(({key} * 23) % 193 - 96 AS DOUBLE) / {SCALE})"
    dx3 = f"(CAST(({key} * 37) % 193 - 96 AS DOUBLE) / {SCALE})"
    dy3 = f"(CAST(({key} * 41) % 193 - 96 AS DOUBLE) / {SCALE})"
    area2 = "((x2 - x1) * (y3 - y1) - (y2 - y1) * (x3 - x1))"
    return (
        f"SELECT id, x1, y1, x2, y2, x3, y3, "
        f"least(x1, x2, x3) AS minx, least(y1, y2, y3) AS miny, "
        f"greatest(x1, x2, x3) AS maxx, greatest(y1, y2, y3) AS maxy FROM ("
        f"SELECT CAST({key} AS BIGINT) AS id, {x1} AS x1, {y1} AS y1, "
        f"{x1} + {dx2} AS x2, {y1} + {dy2} AS y2, "
        f"{x1} + {dx3} AS x3, {y1} + {dy3} AS y3 FROM {table}) t "
        f"WHERE {area2} <> 0"
    )


def mixed_target_sql() -> str:
    """Mixed-geometry TARGET: boxes UNION points, ids made disjoint by an
    offset. Gives the ISP weighting function (1/(npoints_s+npoints_t)) real
    variance — point rows have 1 boundary point, boxes 5."""
    return (
        f"SELECT id, minx, miny, maxx, maxy FROM ({target_box_sql()}) mb "
        f"UNION ALL SELECT id + {POINT_ID_OFFSET} AS id, minx, miny, maxx, maxy "
        f"FROM ({point_sql()}) mp"
    )


def temporal_source_sql() -> str:
    """Spatio-temporal SOURCE: sampled orders boxes + order date."""
    b = _box_exprs("o_orderkey", SRC_MX, SRC_MY, 1, 7)
    return (
        f"SELECT CAST(o_orderkey AS BIGINT) AS id, {b['minx']} AS minx, {b['miny']} AS miny, "
        f"{b['maxx']} AS maxx, {b['maxy']} AS maxy, CAST(o_orderdate AS DATE) AS dt "
        f"FROM orders WHERE o_orderkey % 10 = 0"
    )


def temporal_target_sql() -> str:
    """Spatio-temporal TARGET: first lineitem per order, box + ship date."""
    k = "(l_orderkey * 31 + l_partkey)"
    b = _box_exprs(k, TGT_MX, TGT_MY, 11, 5)
    return (
        f"SELECT CAST(l_orderkey AS BIGINT) AS id, {b['minx']} AS minx, {b['miny']} AS miny, "
        f"{b['maxx']} AS maxx, {b['maxy']} AS maxy, CAST(l_shipdate AS DATE) AS dt "
        f"FROM lineitem WHERE l_linenumber = 1 AND l_orderkey % 5 = 0"
    )


TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


# Testdata columns stored as TIMESTAMP(NANOS) in parquet; Spark reads them
# as long (see session.py nanosAsLong) and we restore timestamp type here so
# Spark-side views agree with DuckDB's native read.
_NANO_TS_COLS = {
    "orders": ("o_orderdate",),
    "lineitem": ("l_shipdate",),
    "events": ("ts",),
}


# (app, table) -> sf_dir last registered — registration re-runs only when
# the target directory changes (schema listing of all 10 tables is ~5s of
# pure overhead when repeated per query).
_REGISTERED: dict[tuple[str, str], str] = {}


def register_views(spark, sf_dir: str, tables: list[str] | None = None) -> None:
    """Register testdata parquet as temp views named after the tables."""
    from pyspark.sql import functions as F, types as T

    app = spark.sparkContext.applicationId
    todo = [t for t in (tables or TABLES) if _REGISTERED.get((app, t)) != sf_dir]
    if not todo:
        return
    # The testdata parquet stores TIMESTAMP(NANOS), which Spark 4 rejects in
    # some scan paths; nanosAsLong is runtime-settable and makes every
    # session (including the driver's own) read them as long — restored to
    # timestamp below. Idempotent and safe for non-nanos files.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    for t in todo:
        df = spark.read.parquet(f"{sf_dir}/{t}.parquet")
        for c in _NANO_TS_COLS.get(t, ()):
            if isinstance(df.schema[c].dataType, T.LongType):
                df = df.withColumn(c, F.timestamp_micros(F.expr(f"{c} div 1000")))
        df.createOrReplaceTempView(t)
        _REGISTERED[(app, t)] = sf_dir


def load_sql(spark, sf_dir: str, sql: str):
    """Run a derivation SQL against the testdata views, registering only
    the tables the statement references."""
    import re

    needed = [t for t in TABLES if re.search(rf"\b{t}\b", sql)]
    register_views(spark, sf_dir, needed or None)
    return spark.sql(sql)


def perturb_geometries(df, eps_steps: int = 4, seed: int = 1):
    """Deterministic per-vertex geometry perturbation — the engine's
    version of the reference's experiment data tool (reference
    experiments/GeometryTransformer.scala:43-64, which shifts every
    coordinate by a random amount under one of three modes: +shift,
    -shift, *shift).

    Differences, on purpose: the shift is DERIVED from (seed, id, the
    vertex's own lattice coordinates) instead of an RNG, so (a) the
    output is reproducible across runs/partitionings — an RNG in a
    distributed map is not — and (b) identical vertices move
    identically, so closed rings STAY closed (the reference tool can
    tear a ring open because it draws a fresh shift for the closing
    duplicate vertex). Shifts are multiples of 1/16 in [-eps, +eps]
    steps and the multiply mode uses (1 + shift/16), keeping every
    output coordinate dyadic — the engine's exactness contract holds
    through the perturbation. Pure JVM column expressions (nested
    ``transform``), envelopes recomputed in the same projection; fully
    distributed, no Python in the path."""
    m = 2 * eps_steps + 1

    def h(extra: str) -> str:
        # value-derived lattice hash: id, scaled vertex coords, seed.
        # xxhash64 (not a bigint cast): ids are frequently strings
        # (GeoJSON ids, shapefile 'stem:N' fallbacks) and a failed cast
        # would silently NULL every output coordinate. pmod keeps the
        # id term small enough that the mixing products never overflow.
        return (
            f"((pmod(xxhash64(id), 1000003) * 2654435761 + "
            f"cast(pt[0] * 16 as bigint) * 1315423911 + "
            f"cast(pt[1] * 16 as bigint) * 2246822519 + "
            f"{seed} * 97 + {extra}) % {m} + {m}) % {m}"
        )

    shift = f"(cast({h('0')} as double) - {eps_steps}) / 16.0"
    mode = f"({h('13')} % 3)"
    px = (
        f"CASE {mode} WHEN 0 THEN pt[0] + {shift} "
        f"WHEN 1 THEN pt[0] - {shift} "
        f"ELSE pt[0] * (1.0 + {shift} / 16.0) END"
    )
    py = (
        f"CASE {mode} WHEN 0 THEN pt[1] + {shift} "
        f"WHEN 1 THEN pt[1] - {shift} "
        f"ELSE pt[1] * (1.0 + {shift} / 16.0) END"
    )
    coords = (
        f"transform(coords, part -> transform(part, pt -> "
        f"array({px}, {py})))"
    )
    keep = [c for c in df.columns
            if c not in ("coords", "minx", "miny", "maxx", "maxy")]
    return df.selectExpr(
        *keep,
        f"{coords} AS coords",
    ).selectExpr(
        "*",
        "aggregate(flatten(coords), cast('inf' as double),"
        " (a, p) -> least(a, p[0])) AS minx",
        "aggregate(flatten(coords), cast('inf' as double),"
        " (a, p) -> least(a, p[1])) AS miny",
        "aggregate(flatten(coords), cast('-inf' as double),"
        " (a, p) -> greatest(a, p[0])) AS maxx",
        "aggregate(flatten(coords), cast('-inf' as double),"
        " (a, p) -> greatest(a, p[1])) AS maxy",
    )
