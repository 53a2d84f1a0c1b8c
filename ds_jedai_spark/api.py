"""High-level engine façade: run a reference-style configuration end-to-end.

The reference's entry points are hard-coded RDD pipelines selected by main
class (reference: experiments/GiantExp.scala, experiments/progressive/
ProgressiveExp.scala); here ONE function interprets the parsed
configuration and assembles the equivalent DataFrame plan:

    read -> parse/validate geometry -> tile join (filtering + ref-point
    dedup) -> [temporal filter] -> [progressive scheduling] -> exact
    verification -> counts / pairs / export

Everything stays declarative until verification, which uses the
general-path DE-9IM verifier (Arrow-batched) for arbitrary WKT geometry.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F

from ds_jedai_spark.config import JedaiConfig
from ds_jedai_spark.io import readers, writers
from ds_jedai_spark.model.tiles import compute_theta
from ds_jedai_spark.operators import progressive as prog
from ds_jedai_spark.operators.relate import RELATIONS as REL_ORDER
from ds_jedai_spark.operators.relate_general import with_general_relations
from ds_jedai_spark.operators.spatial_join import tile_join
from ds_jedai_spark.operators.weights import weight_exprs

_EXT_DELIMS = {".tsv": "\t", ".csv": ","}


def apply_bbox(df: DataFrame, bbox) -> DataFrame:
    """Envelope-intersection predicate on the row format. Expressed as
    four scalar comparisons so Catalyst pushes them into the scan —
    on row-format parquet they land in PushedFilters and prune row
    groups from the min/max statistics; elsewhere they run JVM-side
    before any join."""
    from pyspark.sql import functions as F

    bx0, by0, bx1, by1 = (float(v) for v in bbox)
    return df.where(
        (F.col("minx") <= bx1) & (F.col("maxx") >= bx0)
        & (F.col("miny") <= by1) & (F.col("maxy") >= by0)
    )


def read_dataset(spark: SparkSession, spec, bbox=None) -> DataFrame:
    """Pick the reader by extension (the reference's Reader.read dispatch,
    utils/readers/Reader.scala:38-71). ``bbox`` = (minx,miny,maxx,maxy)
    restricts the scan to envelope-intersecting entities: FlatGeobuf
    skips non-matching file regions via its R-tree index, GeoPackage
    prunes candidate rows through its gpkg_rtree_index extension (both
    apply the exact filter themselves); every other format gets the
    pushed-down filter of apply_bbox."""
    df = _read_dataset(spark, spec, bbox)
    ext = os.path.splitext(spec.path)[1].lower()
    from ds_jedai_spark.io.flatgeobuf import fgb_corpus_files
    from ds_jedai_spark.io.geopackage import gpkg_corpus_files
    from ds_jedai_spark.io.shapefile import shp_corpus_files

    # shp joined the native set in r15: record-header bbox short-circuit
    # + exact post-filter inside read_shapefile
    bbox_native = ext in (".fgb", ".gpkg", ".shp") or (
        ext not in _EXT_DELIMS and os.path.isdir(spec.path)
        and bool(
            shp_corpus_files(spec.path)
            or fgb_corpus_files(spec.path)
            or gpkg_corpus_files(spec.path)
        )
    )
    if bbox is not None and not bbox_native:
        df = apply_bbox(df, bbox)
    return df


def _read_dataset(spark: SparkSession, spec, bbox=None) -> DataFrame:
    ext = os.path.splitext(spec.path)[1].lower()
    if ext in _EXT_DELIMS:
        return readers.read_wkt_delimited(
            spark,
            spec.path,
            id_field=spec.id_field,
            geom_field=spec.geom_field,
            delimiter=_EXT_DELIMS[ext],
            date_field=spec.date_field,
            date_pattern=spec.date_pattern,
        )
    if ext in (".json", ".geojson"):
        return readers.read_geojson(
            spark, spec.path, id_field=spec.id_field,
            date_field=spec.date_field, date_pattern=spec.date_pattern,
        )
    if ext == ".nt":
        return readers.read_ntriples(spark, spec.path)
    from ds_jedai_spark.io.shapefile import shp_corpus_files

    if ext == ".shp" or (
        os.path.isdir(spec.path) and shp_corpus_files(spec.path)
    ):
        from ds_jedai_spark.io.shapefile import read_shapefile

        return read_shapefile(
            spark, spec.path, id_field=spec.id_field,
            date_field=spec.date_field, date_pattern=spec.date_pattern,
            bbox=bbox,
        )
    from ds_jedai_spark.io.geopackage import gpkg_corpus_files

    # (a directory with .shp files was already claimed by the shp
    # branch above, so no exclusion guard is needed here)
    if ext == ".gpkg" or (
        os.path.isdir(spec.path) and gpkg_corpus_files(spec.path)
    ):
        from ds_jedai_spark.io.geopackage import read_geopackage

        return read_geopackage(
            spark, spec.path, id_field=spec.id_field,
            date_field=spec.date_field, date_pattern=spec.date_pattern,
            bbox=bbox,
        )
    from ds_jedai_spark.io.flatgeobuf import fgb_corpus_files

    if ext == ".fgb" or (
        os.path.isdir(spec.path) and fgb_corpus_files(spec.path)
    ):
        from ds_jedai_spark.io.flatgeobuf import read_flatgeobuf

        return read_flatgeobuf(
            spark, spec.path, id_field=spec.id_field,
            date_field=spec.date_field, date_pattern=spec.date_pattern,
            bbox=bbox,
        )
    if ext == ".parquet":
        # Engine row-format parquet: zero-parse fast path; plain user
        # parquet with a WKT column parses via the geom_field fallback.
        return readers.read_parquet_dataset(
            spark, spec.path, id_field=spec.id_field,
            geom_field=spec.geom_field, date_field=spec.date_field,
            date_pattern=spec.date_pattern,
        )
    raise ValueError(
        f"unsupported dataset extension: {spec.path} "
        "(tsv/csv/json/geojson/nt/shp/gpkg/fgb/parquet, or a directory "
        "of .shp)"
    )


# Known-equivalent identifiers compare equal: GeoParquet's spec
# default normalizes to OGC:CRS84 while .prj/.gpkg WGS84 yields
# EPSG:4326 — same datum/units, axis order only (the engine is
# axis-order-naive, like the reference).
_CRS_EQ = {"OGC:CRS84": "EPSG:4326"}


def _crs_of(df: DataFrame) -> str | None:
    try:
        return df.schema["gtype"].metadata.get("crs")
    except (KeyError, AttributeError, TypeError):
        return None


def _canon_crs(c: str | None) -> str | None:
    return _CRS_EQ.get(c, c)


def _maybe_auto_reproject(source: DataFrame,
                          target: DataFrame) -> DataFrame:
    """extra.autoReproject: when source and target declare a pair the
    engine can convert — the closed-form EPSG:4326/OGC:CRS84 vs
    EPSG:3857 pair (one JVM Project, no shuffle), or ANY pair when the
    env-gated pyproj tier is importable (operators/crs.py) — reproject
    the TARGET into the source's frame in-plan so the join runs in
    shared coordinates; any other mismatch falls through to the usual
    warning/strictCrs error."""
    a, b = _canon_crs(_crs_of(source)), _canon_crs(_crs_of(target))
    if a is not None and b is not None and a != b:
        from ds_jedai_spark.operators.crs import (
            have_projection_lib,
            reproject,
        )

        if {a, b} == {"EPSG:4326", "EPSG:3857"} or have_projection_lib():
            return reproject(target, a)
    return target


def _check_crs(source: DataFrame, target: DataFrame, strict: bool) -> None:
    """Warn — or raise under the strictCrs flag — when source and target
    declare DIFFERENT coordinate reference systems (the GeoParquet
    footer CRS the readers carry as column metadata on gtype). Unknown
    CRS (no footer) never participates in the comparison; the reference
    is CRS-naive, so parity is unaffected."""
    crs_of, canon = _crs_of, _canon_crs
    a, b = crs_of(source), crs_of(target)
    if a is not None and b is not None and canon(a) != canon(b):
        msg = (
            f"source and target declare different CRS ({a!r} vs {b!r}); "
            "spatial predicates assume shared planar coordinates — "
            "reproject one side upstream (configurations.strictCrs: true "
            "turns this warning into an error)"
        )
        if strict:
            raise ValueError(msg)
        import warnings

        warnings.warn(msg, UserWarning, stacklevel=2)


def _total_blocks(df: DataFrame, theta: tuple[float, float]) -> int:
    """Grid-cell count of the global extent under theta (reference
    GridPartitioner.computeTotalBlocks, utils/readers/
    GridPartitioner.scala:85-93)."""
    tx, ty = theta
    r = df.agg(
        F.min("minx").alias("a"), F.max("maxx").alias("b"),
        F.min("miny").alias("c"), F.max("maxy").alias("d"),
    ).first()
    if r.a is None:  # empty input: no extent, one (vacuous) block
        return 1
    import math

    nx = math.floor(r.b / tx) - math.floor(r.a / tx) + 1
    ny = math.floor(r.d / ty) - math.floor(r.c / ty) + 1
    return max(1, nx * ny)


# Above this budget, TakeOrderedAndProject's driver-side merge of `budget`
# rows becomes the bottleneck (reference experiment budgets reach 5M-100M,
# TSAS-Experiments/scalabilityExp.sh); dispatch switches to the
# partitioned local-budget scheduler which never funnels rows through one
# task or the driver.
LARGE_BUDGET = 100_000


def _grid_pid_sql(prefix: str, theta: tuple[float, float]) -> str:
    """Coarse spatial-partition id (8x8-theta cells) of an envelope's min
    corner; the multiplier keeps x/y cell indices disjoint."""
    tx, ty = 8.0 * theta[0], 8.0 * theta[1]
    return (
        f"(CAST(floor({prefix}minx / {tx!r}) AS BIGINT) * 1048576 + "
        f"CAST(floor({prefix}miny / {ty!r}) AS BIGINT))"
    )


def _schedule(
    cand: DataFrame,
    cfg: JedaiConfig,
    wexpr: dict,
    source: DataFrame,
    theta: tuple[float, float],
) -> DataFrame:
    main = wexpr[cfg.main_wf.lower().replace("pearson_x2", "x2")]
    sec = (
        wexpr[cfg.secondary_wf.lower().replace("pearson_x2", "x2")]
        if cfg.secondary_wf
        else None
    )
    budget = cfg.budget or 3000  # reference defaultBudget
    alg = cfg.progressive_algorithm
    if alg == "RANDOM":
        sched = prog.random_scheduling(cand, budget)
    elif alg in ("TOPK", "RECIPROCAL_TOPK"):
        # Per-source k = ceil(budget / |distinct sources|); the distinct
        # count is a one-row broadcast aggregate folded into the plan, not
        # a driver action over the candidate set.
        n_src = cand.agg(
            F.greatest(F.count_distinct(F.col("s_id")), F.lit(1)).alias("n_src")
        )
        with_k = cand.crossJoin(F.broadcast(n_src)).withColumn(
            "k", F.expr(f"CAST(ceil({budget} / CAST(n_src AS DOUBLE)) AS INT)")
        )
        fn = (
            prog.topk_per_entity_dynamic
            if alg == "TOPK"
            else prog.reciprocal_topk_dynamic
        )
        sched = fn(with_k, main)
    elif cfg.ws == "COMPOSITE" and sec:
        sched = prog.composite_top_budget(cand, main, sec, budget)
    elif cfg.ws == "HYBRID" and sec:
        sched = prog.hybrid_top_budget(cand, main, sec, budget)
    elif cfg.ws == "THIN_MULTI_COMPOSITE":
        sched = prog.thin_multi_top_budget(
            cand, wexpr["js"], wexpr["cf"], wexpr["mbro"], budget
        )
    elif budget >= LARGE_BUDGET:
        sched = prog.local_budget_top(
            cand, source, main, budget,
            _grid_pid_sql("s_", theta), _grid_pid_sql("", theta),
        )
    else:
        sched = prog.progressive_top_budget(cand, main, budget)
    keep = [c for c in sched.columns if c in ("s_id", "t_id")]
    return sched.select(*keep)


def run(spark: SparkSession, cfg: JedaiConfig) -> DataFrame:
    """Execute the configuration; returns the GiantExp-style counts row for
    DE9IM or the qualifying (s_id, t_id) pairs for a single relation.
    ``extra.bbox`` = (minx,miny,maxx,maxy) restricts BOTH sides to
    envelope-intersecting entities before the join (read_dataset pushes
    it into the scan). ``extra.autoReproject`` converts a target that
    declares the one closed-form CRS pair (EPSG:4326 <-> EPSG:3857)
    into the source's frame in-plan instead of warning; with a bbox the
    target's filter applies AFTER reprojection (same frame as the box —
    the format-level index skip is traded for correctness on that
    side)."""
    bbox = cfg.extra.get("bbox")
    auto = bool(cfg.extra.get("autoReproject"))
    source = read_dataset(spark, cfg.source, bbox=bbox)
    target = read_dataset(spark, cfg.target,
                          bbox=None if auto else bbox)
    if auto:
        target = _maybe_auto_reproject(source, target)
        if bbox is not None:
            target = apply_bbox(target, bbox)
    _check_crs(source, target, strict=bool(cfg.extra.get("strictCrs")))

    decomposed = cfg.entity_type in (
        "DECOMPOSED_ENTITY", "INDEXED_DECOMPOSED_ENTITY"
    )
    if decomposed:
        from ds_jedai_spark.operators.decompose import with_fine_envelopes

        source = with_fine_envelopes(source)
        target = with_fine_envelopes(target)

    # Target-side degenerate-theta guard (model/tiles.floor_theta): a
    # source whose domain collapses to a point cannot produce a sane
    # granularity for targets spanning a real domain.
    from ds_jedai_spark.model.tiles import floor_theta

    theta = floor_theta(
        compute_theta(source, cfg.theta_granularity), target
    )
    fine = ("fine_envs",) if decomposed else ()
    extras = ("gtype", "coords") + fine + (("ts",) if cfg.source.date_field else ())
    textras = ("gtype", "coords") + fine + (("ts",) if cfg.target.date_field else ())
    if cfg.grid_type in ("KDBTREE", "QUADTREE"):
        # Sampled spatial partitioner path (the reference's gridType); the
        # quantile grid stands in for both sampled tree builds.
        from ds_jedai_spark.operators.partitioner import partitioned_join

        n = cfg.partitions or 64
        side = max(2, int(n ** 0.5))
        cand = partitioned_join(
            source, target, nx=side, ny=side,
            source_extra=extras, target_extra=textras,
        )
    else:
        cand = tile_join(
            source, target, theta=theta, source_extra=extras, target_extra=textras
        )
    if decomposed:
        # List-vs-list fine-grained envelope pre-filter (the decomposed
        # entity types' approximateIntersection) before exact verification.
        from ds_jedai_spark.operators.decompose import FINE_OVERLAP_SQL

        cand = cand.where(F.expr(FINE_OVERLAP_SQL))
    if cfg.source.date_field and cfg.target.date_field:
        # The reference's spatio-temporal qualifier: |days between| < 2
        cand = cand.where(F.abs(F.datediff(F.col("s_ts"), F.col("t_ts"))) < 2)

    stateful = cfg.progressive_algorithm in (
        "DYNAMIC_PROGRESSIVE_GIANT", "EARLY_STOPPING"
    )
    if cfg.progressive_algorithm and not stateful:
        wexpr = weight_exprs(
            "s_", "t_", theta[0], theta[1], _total_blocks(source, theta)
        )
        pair_keys = _schedule(cand, cfg, wexpr, source, theta)
        cand = cand.join(pair_keys, on=["s_id", "t_id"], how="left_semi")

    if stateful:
        # These algorithms interleave verification with scheduling (the PQ
        # reorders / the scan stops based on hits). Verification happens
        # INSIDE the scan, lazily per dequeued pair, so the budget bounds
        # the number of exact relate_pair calls (reference
        # ProgressiveLinkerT.scala:47-63); the full relation flags are then
        # computed only for the scheduled (budget-bounded) subset.
        from ds_jedai_spark.operators.progressive_state import (
            dynamic_progressive,
            early_stopping,
        )

        wexpr = weight_exprs(
            "s_", "t_", theta[0], theta[1], _total_blocks(source, theta)
        )
        main = wexpr[cfg.main_wf.lower().replace("pearson_x2", "x2")]
        qrel = (
            "intersects" if cfg.relation == "DE9IM" else cfg.relation.lower()
        )
        if cfg.progressive_algorithm == "DYNAMIC_PROGRESSIVE_GIANT":
            sched = dynamic_progressive(
                cand, main, None, cfg.budget or 3000, relation=qrel
            )
        else:
            sched = early_stopping(cand, main, None, relation=qrel)
        cand = cand.join(
            sched.select("s_id", "t_id"), on=["s_id", "t_id"], how="left_semi"
        )

    if not cfg.progressive_algorithm:
        # Full-verification path: auto-engage the skew-split join when
        # per-pair verification is expensive (progressive paths are
        # budget-bounded, so the split never pays there). YAML override:
        # configurations: {loadBalancer: AUTO|ON|OFF}.
        from ds_jedai_spark.operators.loadbalance import auto_balance

        cand, _ = auto_balance(
            cand, source, target,
            mode=str(cfg.extra.get("loadBalancer", "AUTO")),
        )

    verified = with_general_relations(cand)

    if cfg.relation == "DE9IM":
        aggs = [
            F.count(F.lit(1)).alias("verifications"),
            F.count(F.when(F.col("r_intersects"), True)).alias("qualifying_pairs"),
        ]
        for r in REL_ORDER:
            if r != "disjoint":
                aggs.append(F.count(F.when(F.col(f"r_{r}"), True)).alias(f"n_{r}"))
        result = verified.agg(*aggs)
        if cfg.export_path:
            flags = verified.select(
                "s_id", "t_id", *[f"r_{r}" for r in REL_ORDER if r != "disjoint"]
            )
            writers.export_rdf(flags, cfg.export_path)
        return result

    rel = cfg.relation.lower()
    pairs = verified.where(F.col(f"r_{rel}")).select("s_id", "t_id")
    if cfg.export_path:
        writers.export_csv_pairs(pairs, cfg.export_path)
    return pairs
