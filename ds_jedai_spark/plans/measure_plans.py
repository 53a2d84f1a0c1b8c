"""Geometry measures + CRS reprojection under the DuckDB oracle gate.

Both surfaces landed in r14 with pytest-only evidence; these single-row
stat queries put them under the driver's hard correctness signal
(VERDICT r14 #1). The geometry is derived from the sf tables by the
shared io/synthetic SQL generators, so the oracle can recompute every
measure in CLOSED FORM (shoelace/centroid of a box-with-hole, haversine,
the published Mercator formulas) while the Spark side runs the actual
operators (with_measures' JVM expressions + Arrow areal pass,
operators/crs.reproject's nested-transform plan).

Exactness strategy (the decompose_*_stats pattern, plans/giant.py):

* integer-exact measures (npoints; box perimeters/areas — every
  coordinate a multiple of 1/16) round to scaled BIGINTs per row, so
  the cross-engine comparison is integer equality;
* closed-form rationals with non-dyadic denominators (hole-offset
  centroids: cx = minx + 31*w/60) round at 1e6 — their fractional parts
  sit on thirds, >= 1/6 from any rounding boundary, while float dust is
  ~1e-10;
* genuinely irrational values (sqrt lengths, haversine meters, Mercator
  N) are rounded ONCE after summing (length legs) or per row at integer
  meters (reproject) — dust is ~1e-8 against a 0.5 boundary.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ds_jedai_spark.io.synthetic import (
    line_sql,
    load_sql,
    point_sql,
    source_box_sql,
)
from ds_jedai_spark.operators.measures import MEAN_R, haversine_sql

# polygon-with-hole construction over the SOURCE boxes: outer ring = the
# box, hole = the box's lower-left quadrant inset (offset so the
# centroid moves — a centered hole would leave it at the box center and
# test nothing). All hole coordinates are multiples of 1/128: exact.
_HOLE = {
    "x0": "minx + (maxx - minx) / 8.0",
    "y0": "miny + (maxy - miny) / 8.0",
    "x1": "minx + 3.0 * (maxx - minx) / 8.0",
    "y1": "miny + 3.0 * (maxy - miny) / 8.0",
}


def _poly_with_hole(spark: SparkSession, sf_dir: str) -> DataFrame:
    boxes = load_sql(spark, sf_dir, source_box_sql())
    h = _HOLE
    return boxes.selectExpr(
        "id",
        "'POLYGON' AS gtype",
        "array("
        "array(array(minx, miny), array(maxx, miny), array(maxx, maxy),"
        " array(minx, maxy), array(minx, miny)), "
        f"array(array({h['x0']}, {h['y0']}), array({h['x1']}, {h['y0']}),"
        f" array({h['x1']}, {h['y1']}), array({h['x0']}, {h['y1']}),"
        f" array({h['x0']}, {h['y0']}))"
        ") AS coords",
        "minx", "miny", "maxx", "maxy",
    )


def measure_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One wide row: with_measures over three derived datasets —
    polygons-with-holes (area/perimeter/centroid with hole subtraction
    through the Arrow areal pass), segments (sqrt lengths + midpoint
    centroids), points (vertex-mean centroid) — plus the geodesic
    haversine length of the segments remapped into lon/lat range."""
    from ds_jedai_spark.operators.measures import with_measures

    # ship ONLY (gtype, coords) through the Arrow boundary (guide
    # §4.1, r18): the aggregates read measure columns alone, and the
    # id + envelope passthrough cost both directions of the map
    poly = with_measures(
        _poly_with_hole(spark, sf_dir).select("gtype", "coords"))
    agg_poly = poly.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("npoints").cast("bigint").alias("npts"),
        F.sum(F.round(F.col("perimeter") * 32)).cast("bigint")
        .alias("perim32"),
        F.sum(F.round(F.col("area") * 4096)).cast("bigint")
        .alias("area4096"),
        F.sum(F.round(F.col("centroid_x") * 1e6)).cast("bigint")
        .alias("cx6"),
        F.sum(F.round(F.col("centroid_y") * 1e6)).cast("bigint")
        .alias("cy6"),
    )

    lines = load_sql(spark, sf_dir, line_sql()).selectExpr(
        "id", "'LINESTRING' AS gtype",
        "array(array(array(x1, y1), array(x2, y2))) AS coords",
        "minx", "miny", "maxx", "maxy",
    )
    lm = with_measures(lines.select("gtype", "coords"))
    agg_line = lm.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.round(F.col("length") * 1000)).cast("bigint")
        .alias("len1000"),
        F.sum(F.round(F.col("centroid_x") * 1e6)).cast("bigint")
        .alias("cx6"),
        F.sum(F.round(F.col("centroid_y") * 1e6)).cast("bigint")
        .alias("cy6"),
    )

    # geodesic leg: the same segments remapped into valid lon/lat range
    # (lon = x - 48 in [-48, 49.5], lat = y/2 - 24 in [-24, 24.8] —
    # exact: halves of multiples of 1/16), declared EPSG:4326
    geo = load_sql(spark, sf_dir, line_sql()).selectExpr(
        "id", "'LINESTRING' AS gtype",
        "array(array(array(x1 - 48.0, y1 / 2.0 - 24.0),"
        " array(x2 - 48.0, y2 / 2.0 - 24.0))) AS coords",
        "least(x1, x2) - 48.0 AS minx",
        "least(y1, y2) / 2.0 - 24.0 AS miny",
        "greatest(x1, x2) - 48.0 AS maxx",
        "greatest(y1, y2) / 2.0 - 24.0 AS maxy",
    ).withMetadata("gtype", {"crs": "EPSG:4326"})
    agg_geo = with_measures(
        geo.select("gtype", "coords"), geodesic=True).agg(
        F.sum(F.round(F.col("length_m"))).cast("bigint").alias("glen_m"),
    )

    # seam-honesty leg (r17): every segment remapped to STRADDLE the
    # antimeridian (lon1 in [-180,-132), lon2 in (132,180] — |Δlon| is
    # always > 264°) must get NULL geodesic measures, as a LINESTRING
    # (length_m) and as a closed box ring (perimeter_m/area_m2). The
    # oracle's closed form is count(*): the contract is total.
    wl = load_sql(spark, sf_dir, line_sql()).selectExpr(
        "id", "'LINESTRING' AS gtype",
        "array(array(array(x1 / 2.0 - 180.0, y1 / 4.0 - 12.0),"
        " array(180.0 - x2 / 2.0, y2 / 4.0 - 12.0))) AS coords",
    )
    wp = load_sql(spark, sf_dir, line_sql()).selectExpr(
        "id", "'POLYGON' AS gtype",
        "array(array("
        "array(x1 / 2.0 - 180.0, y1 / 4.0 - 12.0),"
        " array(180.0 - x2 / 2.0, y1 / 4.0 - 12.0),"
        " array(180.0 - x2 / 2.0, y1 / 4.0 - 11.0),"
        " array(x1 / 2.0 - 180.0, y1 / 4.0 - 11.0),"
        " array(x1 / 2.0 - 180.0, y1 / 4.0 - 12.0))) AS coords",
    )
    wrapped = wl.unionByName(wp).select("gtype", "coords")\
        .withMetadata("gtype", {"crs": "EPSG:4326"})
    agg_gw = with_measures(wrapped, geodesic=True).agg(
        F.sum(F.when(F.col("gtype") == "LINESTRING", 1).otherwise(0))
        .cast("bigint").alias("n_wline"),
        F.sum(F.when((F.col("gtype") == "LINESTRING")
                     & F.col("length_m").isNull(), 1).otherwise(0))
        .cast("bigint").alias("wline_null"),
        F.sum(F.when((F.col("gtype") == "POLYGON")
                     & F.col("area_m2").isNull()
                     & F.col("perimeter_m").isNull(), 1).otherwise(0))
        .cast("bigint").alias("wpoly_null"),
    )

    # seam="shift" leg (r17): the SAME wrapped boxes, normalized +360
    # and MEASURED — the box on the sphere has the closed-form area
    # dlon_rad * (sin latB - sin latA) * R² with dlon = (x1+x2)/2
    # degrees (the shifted west edge x1/2+180 minus the east edge
    # 180-x2/2), which the oracle computes directly. Rounded at km²
    # per row: libm last-ulp differences (~1e-4 m² at these
    # magnitudes) sit 1e-10 from a km² rounding boundary.
    agg_gsh = with_measures(
        wp.select("gtype", "coords")
        .withMetadata("gtype", {"crs": "EPSG:4326"}),
        geodesic=True, seam="shift",
    ).agg(
        F.sum(F.round(F.col("area_m2") / 1e6)).cast("bigint")
        .alias("gsh_km2"),
        F.sum(F.when(F.col("area_m2").isNotNull()
                     & F.col("perimeter_m").isNotNull(), 1).otherwise(0))
        .cast("bigint").alias("gsh_nn"),
    )

    pts = load_sql(spark, sf_dir, point_sql()).selectExpr(
        "id", "'POINT' AS gtype",
        "array(array(array(minx, miny))) AS coords",
        "minx", "miny", "maxx", "maxy",
    )
    agg_pt = with_measures(pts.select("gtype", "coords")).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.round(F.col("centroid_x") * 1e6)).cast("bigint")
        .alias("cx6"),
        F.sum(F.round(F.col("centroid_y") * 1e6)).cast("bigint")
        .alias("cy6"),
    )

    p = agg_poly.select(
        F.col("n").alias("n_poly"), F.col("npts").alias("poly_npts"),
        "perim32", "area4096",
        F.col("cx6").alias("pcx6"), F.col("cy6").alias("pcy6"),
    )
    ln = agg_line.select(
        F.col("n").alias("n_line"), "len1000",
        F.col("cx6").alias("lcx6"), F.col("cy6").alias("lcy6"),
    )
    pt = agg_pt.select(
        F.col("n").alias("n_point"),
        F.col("cx6").alias("ptcx6"), F.col("cy6").alias("ptcy6"),
    )
    return p.crossJoin(ln).crossJoin(agg_geo).crossJoin(pt) \
        .crossJoin(agg_gw).crossJoin(agg_gsh)


def measure_stats_oracle() -> str:
    h = _HOLE
    # closed forms over the box lattice: w = maxx-minx, h = maxy-miny;
    # area = wh - (w/4)(h/4) = 15wh/16; perimeter = 2(w+h) + (w+h)/2;
    # centroid = (A_out*c_out - A_hole*c_hole) / (A_out - A_hole)
    #          = minx + 31w/60 (and symmetrically for y) — the hole
    # offset derivation is in the module docstring exactness notes.
    w, hh = "(maxx - minx)", "(maxy - miny)"
    hav = haversine_sql("x1 - 48.0", "y1 / 2.0 - 24.0",
                        "x2 - 48.0", "y2 / 2.0 - 24.0")
    return f"""
WITH boxes AS ({source_box_sql()}),
poly AS (
  SELECT CAST(count(*) AS BIGINT) AS n_poly,
         CAST(10 * count(*) AS BIGINT) AS poly_npts,
         CAST(sum(round((2.0 * ({w} + {hh}) + ({w} + {hh}) / 2.0) * 32))
              AS BIGINT) AS perim32,
         CAST(sum(round(15.0 * {w} * {hh} / 16.0 * 4096)) AS BIGINT)
              AS area4096,
         CAST(sum(round((minx + 31.0 * {w} / 60.0) * 1e6)) AS BIGINT)
              AS pcx6,
         CAST(sum(round((miny + 31.0 * {hh} / 60.0) * 1e6)) AS BIGINT)
              AS pcy6
  FROM boxes),
segs AS ({line_sql()}),
ln AS (
  SELECT CAST(count(*) AS BIGINT) AS n_line,
         CAST(sum(round(sqrt(pow(x2 - x1, 2) + pow(y2 - y1, 2)) * 1000))
              AS BIGINT) AS len1000,
         CAST(sum(round((x1 + x2) / 2.0 * 1e6)) AS BIGINT) AS lcx6,
         CAST(sum(round((y1 + y2) / 2.0 * 1e6)) AS BIGINT) AS lcy6
  FROM segs),
geo AS (
  SELECT CAST(sum(round({hav})) AS BIGINT) AS glen_m FROM segs),
pts AS ({point_sql()}),
pt AS (
  SELECT CAST(count(*) AS BIGINT) AS n_point,
         CAST(sum(round(minx * 1e6)) AS BIGINT) AS ptcx6,
         CAST(sum(round(miny * 1e6)) AS BIGINT) AS ptcy6
  FROM pts),
gw AS (
  SELECT CAST(count(*) AS BIGINT) AS n_wline,
         CAST(count(*) AS BIGINT) AS wline_null,
         CAST(count(*) AS BIGINT) AS wpoly_null
  FROM segs),
gsh AS (
  -- abs(): a negative width (x1 + x2 < 0 via a negative segment dx)
  -- flips the ring orientation; the operator reports |area|
  SELECT CAST(sum(round(abs(radians((x1 + x2) / 2.0))
           * (sin(radians(y1 / 4.0 - 11.0))
              - sin(radians(y1 / 4.0 - 12.0)))
           * {MEAN_R!r} * {MEAN_R!r} / 1e6)) AS BIGINT) AS gsh_km2,
         CAST(count(*) AS BIGINT) AS gsh_nn
  FROM segs)
SELECT poly.*, ln.*, geo.*, pt.*, gw.*, gsh.*
FROM poly, ln, geo, pt, gw, gsh
"""


def reproject_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One wide row over the forward (4326 -> 3857) reprojection of the
    point dataset remapped into lon/lat range, plus the inverse
    round-trip: per-point projected coordinates summed at integer
    meters (the oracle recomputes the published spherical Mercator
    formulas — EPSG guidance note 7-2 method 1024 — in SQL), an
    envelope-corner law (the transformed envelope must equal the
    transformed point BIT-FOR-BIT, since both run the same expression),
    and a 1e-9-degree round-trip bound (oracle: every row passes)."""
    from ds_jedai_spark.operators.crs import reproject

    pts = load_sql(spark, sf_dir, point_sql()).selectExpr(
        "id", "'POINT' AS gtype",
        "array(array(array(minx - 48.0, miny / 2.0 - 24.0))) AS coords",
        "minx - 48.0 AS minx", "miny / 2.0 - 24.0 AS miny",
        "maxx - 48.0 AS maxx", "maxy / 2.0 - 24.0 AS maxy",
        "minx - 48.0 AS lon0", "miny / 2.0 - 24.0 AS lat0",
    ).withMetadata("gtype", {"crs": "EPSG:4326"})
    fwd = reproject(pts, "EPSG:3857") \
        .withColumn("px", F.expr("coords[0][0][0]")) \
        .withColumn("py", F.expr("coords[0][0][1]")) \
        .withColumn(
            "env_ok",
            (F.col("minx") == F.expr("coords[0][0][0]"))
            & (F.col("miny") == F.expr("coords[0][0][1]")),
        )
    back = reproject(fwd, "EPSG:4326")
    return back.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.round(F.col("px"))).cast("bigint").alias("sum_e_m"),
        F.sum(F.round(F.col("py"))).cast("bigint").alias("sum_n_m"),
        F.sum(F.when(F.col("env_ok"), 1).otherwise(0)).cast("bigint")
        .alias("n_env_ok"),
        F.sum(
            F.when(
                (F.abs(F.expr("coords[0][0][0]") - F.col("lon0")) < 1e-9)
                & (F.abs(F.expr("coords[0][0][1]") - F.col("lat0"))
                   < 1e-9),
                1,
            ).otherwise(0)
        ).cast("bigint").alias("n_rt_ok"),
    )


def reproject_stats_oracle() -> str:
    # EPSG guidance note 7-2, method 1024 (spherical Web Mercator),
    # R = 6378137.0 — operators/crs.py:84-91 carries the same formulas.
    return f"""
WITH pts AS ({point_sql()}),
ll AS (SELECT minx - 48.0 AS lon, miny / 2.0 - 24.0 AS lat FROM pts)
SELECT CAST(count(*) AS BIGINT) AS n,
       CAST(sum(round(6378137.0 * radians(lon))) AS BIGINT) AS sum_e_m,
       CAST(sum(round(6378137.0 *
            ln(tan(pi() / 4.0 + radians(lat) / 2.0)))) AS BIGINT)
            AS sum_n_m,
       CAST(count(*) AS BIGINT) AS n_env_ok,
       CAST(count(*) AS BIGINT) AS n_rt_ok
FROM ll
"""


def density_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grid-cell density (operators/spatial_agg.grid_density) over the
    point dataset at cell=8.0 — exact on the 1/16 lattice (power-of-two
    cell: center/8 floors identically in both engines). Folded into the
    skew_stats composite, so the keys map onto its (t_id, cost) schema:
    t_id = cell_x * 100000 + cell_y."""
    from ds_jedai_spark.operators.spatial_agg import grid_density

    pts = load_sql(spark, sf_dir, point_sql())
    d = grid_density(pts, cell=8.0)
    return d.select(
        (F.col("cell_x") * 100000 + F.col("cell_y")).cast("long")
        .alias("t_id"),
        F.col("n").cast("long").alias("cost"),
    )


def density_stats_oracle() -> str:
    from ds_jedai_spark.operators.spatial_agg import grid_density_sql

    inner = grid_density_sql(point_sql(), 8.0)
    return (
        f"SELECT cell_x * 100000 + cell_y AS t_id, "
        f"CAST(n AS BIGINT) AS cost FROM ({inner})"
    )


def density_weighted_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted grid density (r17): sum(1 + id % 7) per cell over the
    point dataset — exact integer weights, so the cross-engine compare
    is integer equality. Same skew_stats (t_id, cost) fold as the count
    tag."""
    from ds_jedai_spark.operators.spatial_agg import grid_density

    pts = load_sql(spark, sf_dir, point_sql()).withColumn(
        "wgt", F.lit(1) + F.col("id") % 7)
    d = grid_density(pts, cell=8.0, weight_col="wgt")
    return d.select(
        (F.col("cell_x") * 100000 + F.col("cell_y")).cast("long")
        .alias("t_id"),
        F.col("w").cast("long").alias("cost"),
    )


def density_weighted_stats_oracle() -> str:
    from ds_jedai_spark.operators.spatial_agg import grid_density_sql

    src = f"SELECT s.*, 1 + id % 7 AS wgt FROM ({point_sql()}) s"
    inner = grid_density_sql(src, 8.0, weight_expr="wgt")
    return (
        f"SELECT cell_x * 100000 + cell_y AS t_id, "
        f"CAST(w AS BIGINT) AS cost FROM ({inner})"
    )


def density_coverage_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Coverage grid density (r17): each SOURCE box counts once per
    OVERLAPPED cell (floor-span explode — Spark explode(sequence) vs
    DuckDB unnest(generate_series), both inclusive). cell=4.0 so a box
    genuinely spans several cells. Same (t_id, cost) fold."""
    from ds_jedai_spark.operators.spatial_agg import grid_density

    boxes = load_sql(spark, sf_dir, source_box_sql())
    d = grid_density(boxes, cell=4.0, coverage=True)
    return d.select(
        (F.col("cell_x") * 100000 + F.col("cell_y")).cast("long")
        .alias("t_id"),
        F.col("n").cast("long").alias("cost"),
    )


def density_coverage_stats_oracle() -> str:
    from ds_jedai_spark.operators.spatial_agg import grid_density_sql

    inner = grid_density_sql(source_box_sql(), 4.0, coverage=True)
    return (
        f"SELECT cell_x * 100000 + cell_y AS t_id, "
        f"CAST(n AS BIGINT) AS cost FROM ({inner})"
    )


# ------------------------------------------------------------ DBSCAN (r16)

DBSCAN_EPS = 1.5
DBSCAN_MIN_PTS = 3


def dbscan_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DBSCAN (operators/clustering.dbscan) over the lattice point
    dataset at eps=1.5, min_pts=3. The multiplicative-hash lattice
    arranges the points into ~37-long near-collinear CHAINS (measured
    at sf0.01: 82 clusters, 6 noise points, max degree 3), which is a
    deliberately hard shape for the clustering backbone: component
    diameter ~36 forces the star-contraction backbone through
    multiple real rounds (pure one-hop propagation would need 36),
    chain endpoints exercise the border rule, and isolated points the
    noise label. Folded into skew_stats' (t_id, cost) schema: t_id =
    point id, cost = cluster label (min core id; -1 = noise)."""
    from ds_jedai_spark.operators.clustering import dbscan

    pts = load_sql(spark, sf_dir, point_sql())
    out = dbscan(pts, eps=DBSCAN_EPS, min_pts=DBSCAN_MIN_PTS)
    return out.select(
        F.col("id").cast("long").alias("t_id"),
        F.col("cluster").cast("long").alias("cost"),
    )


def dbscan_stats_oracle() -> str:
    from ds_jedai_spark.operators.clustering import dbscan_sql

    inner = dbscan_sql(point_sql(), DBSCAN_EPS, DBSCAN_MIN_PTS)
    return (
        f"SELECT CAST(id AS BIGINT) AS t_id, cluster AS cost "
        f"FROM ({inner})"
    )


# ----------------------------------------------------------- geohash (r16)

GEOHASH_PRECISION = 7


def geohash_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Geohash cell keys (operators/geohash.with_geohash, precision 7 =
    35 bits) over the lon/lat-remapped point dataset. The Spark side
    runs the OPERATOR (pure-JVM projection); the oracle recomputes the
    interleaved integer from the same shared closed-form SQL text
    (geohash_int_sql) in DuckDB — both engines evaluate bit-identical
    double arithmetic, so the comparison is integer equality. Folded
    into skew_stats' (t_id, cost) schema: t_id = id, cost = the
    35-bit geohash integer."""
    from ds_jedai_spark.operators.geohash import with_geohash
    from ds_jedai_spark.plans.giant import _lonlat_cte

    pts = load_sql(spark, sf_dir, _lonlat_cte(point_sql())).selectExpr(
        "id", "lon AS minx", "lat AS miny", "lon AS maxx", "lat AS maxy"
    )
    out = with_geohash(pts, precision=GEOHASH_PRECISION, as_int=True)
    return out.select(
        F.col("id").cast("long").alias("t_id"),
        F.col("geohash_int").alias("cost"),
    )


def geohash_stats_oracle() -> str:
    from ds_jedai_spark.operators.geohash import geohash_int_sql
    from ds_jedai_spark.plans.giant import _lonlat_cte

    gh = geohash_int_sql("lon", "lat", GEOHASH_PRECISION)
    return (
        f"SELECT CAST(id AS BIGINT) AS t_id, CAST({gh} AS BIGINT) AS "
        f"cost FROM ({_lonlat_cte(point_sql())})"
    )


GEOHASH_COVER_PRECISION = 3


def geohash_cover_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Geohash cover-sets (r17: operators/geohash.geohash_cover — the
    envelope blocking primitive) over the SOURCE boxes remapped into a
    lon/lat window (lon = x/4 - 50, lat = y/4 - 10: exact quarters of
    the 1/16 lattice; box spans up to 2° against 1.40625° precision-3
    cells, so real multi-cell covers occur). Folded into skew_stats'
    (t_id, cost) schema: t_id = id, cost = covering-cell geohash int —
    one row per (entity, cell)."""
    from ds_jedai_spark.operators.geohash import geohash_cover

    boxes = load_sql(spark, sf_dir, source_box_sql()).selectExpr(
        "id",
        "minx / 4.0 - 50.0 AS minx", "miny / 4.0 - 10.0 AS miny",
        "maxx / 4.0 - 50.0 AS maxx", "maxy / 4.0 - 10.0 AS maxy",
    )
    out = geohash_cover(boxes, precision=GEOHASH_COVER_PRECISION,
                        as_int=True)
    return out.select(
        F.col("id").cast("long").alias("t_id"),
        F.col("geohash_int").alias("cost"),
    )


def geohash_cover_stats_oracle() -> str:
    from ds_jedai_spark.operators.geohash import geohash_cover_sql

    src = (
        f"SELECT id, minx / 4.0 - 50.0 AS minx, "
        f"miny / 4.0 - 10.0 AS miny, maxx / 4.0 - 50.0 AS maxx, "
        f"maxy / 4.0 - 10.0 AS maxy FROM ({source_box_sql()}) b"
    )
    inner = geohash_cover_sql(src, GEOHASH_COVER_PRECISION, cols="id")
    return (
        f"SELECT CAST(id AS BIGINT) AS t_id, geohash_int AS cost "
        f"FROM ({inner})"
    )


# ------------------------------------------------------- convex hull (r16)

def hull_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Convex hull corners (operators/hull.convex_hull: per-partition
    monotone chain -> one-task final chain) of the SUPPLIER point set
    (the oracle's corner test is O(n^3) — supplier keeps it at
    oracle scale; the distributed path is what runs on real data).
    Folded into skew_stats' (t_id, cost) schema: t_id = lexicographic
    corner rank, cost = packed lattice coordinates
    (x*16 * 1e6 + y*16 — both exact integers)."""
    from ds_jedai_spark.operators.hull import convex_hull

    pts = load_sql(spark, sf_dir, point_sql("supplier", "s_suppkey"))
    out = convex_hull(pts)
    return out.select(
        F.col("rank").alias("t_id"),
        (F.round(F.col("x") * 16).cast("long") * 1000000
         + F.round(F.col("y") * 16).cast("long")).alias("cost"),
    )


def hull_stats_oracle() -> str:
    from ds_jedai_spark.operators.hull import hull_sql

    inner = hull_sql(point_sql("supplier", "s_suppkey"))
    return (
        f"SELECT rank AS t_id, "
        f"CAST(round(x * 16) AS BIGINT) * 1000000 "
        f"+ CAST(round(y * 16) AS BIGINT) AS cost FROM ({inner})"
    )


def hull_by_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group convex hulls (r17: convex_hull(by=...) — the
    dbscan -> cluster-footprint composition) over the SUPPLIER points
    split into 5 groups by id % 5. Folded into skew_stats' (t_id, cost)
    schema: t_id = group * 1000 + in-group rank, cost = packed lattice
    coordinates (same packing as the global hull tag)."""
    from ds_jedai_spark.operators.hull import convex_hull

    pts = load_sql(spark, sf_dir, point_sql("supplier", "s_suppkey")) \
        .withColumn("grp", (F.col("id") % 5).cast("long"))
    out = convex_hull(pts, by="grp")
    return out.select(
        (F.col("grp") * 1000 + F.col("rank")).alias("t_id"),
        (F.round(F.col("x") * 16).cast("long") * 1000000
         + F.round(F.col("y") * 16).cast("long")).alias("cost"),
    )


def hull_by_stats_oracle() -> str:
    from ds_jedai_spark.operators.hull import hull_by_sql

    src = (f"SELECT s.*, CAST(id % 5 AS BIGINT) AS grp "
           f"FROM ({point_sql('supplier', 's_suppkey')}) s")
    inner = hull_by_sql(src, "grp")
    return (
        f"SELECT g * 1000 + rank AS t_id, "
        f"CAST(round(x * 16) AS BIGINT) * 1000000 "
        f"+ CAST(round(y * 16) AS BIGINT) AS cost FROM ({inner})"
    )


DBSCAN_GEO_EPS_M = 160_000.0


def dbscan_geo_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Geodesic DBSCAN (eps in great-circle METERS; the eps-graph runs
    through geodesic_distance_join, so the neighbor predicate is the
    shared haversine text) over the lon/lat-remapped points. The remap
    preserves the lattice's chain structure (82 clusters / 6 noise at
    sf0.01, same as the planar row) while exercising the meters
    pipeline end-to-end. Same (t_id, cost) fold as the planar tag."""
    from ds_jedai_spark.operators.clustering import dbscan
    from ds_jedai_spark.plans.giant import _lonlat_cte

    pts = load_sql(spark, sf_dir, _lonlat_cte(point_sql())).selectExpr(
        "id", "lon AS minx", "lat AS miny", "lon AS maxx", "lat AS maxy"
    )
    out = dbscan(pts, eps=DBSCAN_GEO_EPS_M, min_pts=DBSCAN_MIN_PTS,
                 geodesic=True)
    return out.select(
        F.col("id").cast("long").alias("t_id"),
        F.col("cluster").cast("long").alias("cost"),
    )


def dbscan_geo_stats_oracle() -> str:
    from ds_jedai_spark.operators.clustering import dbscan_sql
    from ds_jedai_spark.plans.giant import _lonlat_cte

    inner = dbscan_sql(
        "SELECT id, lon AS minx, lat AS miny, lon AS maxx, lat AS maxy "
        f"FROM ({_lonlat_cte(point_sql())})",
        DBSCAN_GEO_EPS_M, DBSCAN_MIN_PTS, geodesic=True,
    )
    return (
        f"SELECT CAST(id AS BIGINT) AS t_id, cluster AS cost "
        f"FROM ({inner})"
    )


# ------------------------------------------ exact quantiles (r17)

QUANTILE_PERMILLE = (10, 250, 500, 750, 900, 990)
QUANTILE_BY_PERMILLE = (250, 500, 900)


def quantile_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact global quantiles of o_totalprice through the distributed
    two-phase rank (operators/ranking.exact_quantiles) — type-1 rank
    selection with the rank computed in integer arithmetic, so both
    engines pick the identical element (no sketch, no interpolation).
    Folded onto skew_stats' (t_id, cost): t_id = permille."""
    from ds_jedai_spark.operators.ranking import exact_quantiles

    src = load_sql(
        spark, sf_dir, "SELECT o_orderkey, o_totalprice FROM orders"
    )
    q = exact_quantiles(
        src, "o_totalprice", permille=QUANTILE_PERMILLE,
        tiebreak=["o_orderkey"],
    )
    return q.select(
        F.col("permille").cast("long").alias("t_id"),
        F.col("value").cast("double").alias("cost"),
    )


def quantile_stats_oracle() -> str:
    ps = ", ".join(str(p) for p in QUANTILE_PERMILLE)
    return (
        "WITH t AS (SELECT o_totalprice AS v, o_orderkey AS k FROM orders), "
        "r AS (SELECT v, row_number() OVER (ORDER BY v, k) AS rn FROM t), "
        "c AS (SELECT count(*) AS n FROM t), "
        f"p AS (SELECT unnest([{ps}]) AS permille) "
        "SELECT CAST(p.permille AS BIGINT) AS t_id, "
        "CAST(r.v AS DOUBLE) AS cost "
        "FROM p CROSS JOIN c JOIN r ON r.rn = "
        "1 + (p.permille * (c.n - 1)) // 1000"
    )


def quantile_by_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group exact quantiles (l_quantity per l_linenumber) through
    the per-group window variant — heavy ties on purpose (integer
    quantities): the selected VALUE at a rank is deterministic even
    though row_number tie order is not. t_id = linenumber * 10000 +
    permille."""
    from ds_jedai_spark.operators.ranking import exact_quantiles_by

    src = load_sql(
        spark, sf_dir, "SELECT l_linenumber, l_quantity FROM lineitem"
    )
    q = exact_quantiles_by(
        src, "l_quantity", "l_linenumber", permille=QUANTILE_BY_PERMILLE
    )
    return q.select(
        (F.col("l_linenumber").cast("long") * 10000 + F.col("permille"))
        .alias("t_id"),
        F.col("value").cast("double").alias("cost"),
    )


def quantile_by_stats_oracle() -> str:
    ps = ", ".join(str(p) for p in QUANTILE_BY_PERMILLE)
    return (
        "WITH t AS (SELECT l_linenumber AS g, l_quantity AS v "
        "FROM lineitem), "
        "r AS (SELECT g, v, "
        "row_number() OVER (PARTITION BY g ORDER BY v) AS rn, "
        "count(*) OVER (PARTITION BY g) AS n FROM t), "
        f"p AS (SELECT unnest([{ps}]) AS permille) "
        "SELECT CAST(r.g AS BIGINT) * 10000 + p.permille AS t_id, "
        "CAST(r.v AS DOUBLE) AS cost "
        "FROM p JOIN r ON r.rn = 1 + (p.permille * (r.n - 1)) // 1000"
    )


# ------------------------------------------ zonal statistics (r17)

def zonal_count_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zonal stats (operators/spatial_agg.zonal_stats): customer points
    per covering source box through the tile join + exact relate +
    rollup. (t_id, cost) fold: t_id = zone id, cost = point count."""
    from ds_jedai_spark.operators.spatial_agg import zonal_stats

    zones = load_sql(spark, sf_dir, source_box_sql())
    pts = load_sql(spark, sf_dir, point_sql())
    z = zonal_stats(zones, pts)
    return z.select(
        F.col("zone_id").cast("long").alias("t_id"),
        F.col("n").cast("long").alias("cost"),
    )


def zonal_count_stats_oracle() -> str:
    return (
        f"WITH z AS ({source_box_sql()}), p AS ({point_sql()}) "
        "SELECT CAST(z.id AS BIGINT) AS t_id, "
        "CAST(count(*) AS BIGINT) AS cost "
        "FROM z JOIN p ON p.minx >= z.minx AND p.minx <= z.maxx "
        "AND p.miny >= z.miny AND p.miny <= z.maxy "
        "GROUP BY z.id"
    )


def zonal_weighted_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The weighted form: sum of an integer per-point weight
    (id % 7 + 1) per covering zone — cost = sum_val, exact integers."""
    from ds_jedai_spark.operators.spatial_agg import zonal_stats

    zones = load_sql(spark, sf_dir, source_box_sql())
    pts = load_sql(spark, sf_dir, point_sql()).withColumn(
        "w", (F.col("id") % 7 + 1).cast("long")
    )
    z = zonal_stats(zones, pts, value_col="w")
    return z.select(
        F.col("zone_id").cast("long").alias("t_id"),
        F.col("sum_val").cast("long").alias("cost"),
    )


def zonal_weighted_stats_oracle() -> str:
    return (
        f"WITH z AS ({source_box_sql()}), p AS ({point_sql()}) "
        "SELECT CAST(z.id AS BIGINT) AS t_id, "
        "CAST(sum(p.id % 7 + 1) AS BIGINT) AS cost "
        "FROM z JOIN p ON p.minx >= z.minx AND p.minx <= z.maxx "
        "AND p.miny >= z.miny AND p.miny <= z.maxy "
        "GROUP BY z.id"
    )
