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


def read_dataset(spark: SparkSession, spec) -> DataFrame:
    """Pick the reader by extension (the reference's Reader.read dispatch,
    utils/readers/Reader.scala:38-71)."""
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
    raise ValueError(f"unsupported dataset extension: {spec.path}")


def _total_blocks(df: DataFrame, theta: tuple[float, float]) -> int:
    """Grid-cell count of the global extent under theta (reference
    GridPartitioner.computeTotalBlocks, utils/readers/
    GridPartitioner.scala:85-93)."""
    tx, ty = theta
    r = df.agg(
        F.min("minx").alias("a"), F.max("maxx").alias("b"),
        F.min("miny").alias("c"), F.max("maxy").alias("d"),
    ).first()
    import math

    nx = math.floor(r.b / tx) - math.floor(r.a / tx) + 1
    ny = math.floor(r.d / ty) - math.floor(r.c / ty) + 1
    return max(1, nx * ny)


def _schedule(cand: DataFrame, cfg: JedaiConfig, wexpr: dict) -> DataFrame:
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
        n = max(cand.select("s_id").distinct().count(), 1)
        k = max(1, -(-budget // n))
        fn = prog.topk_per_entity if alg == "TOPK" else prog.reciprocal_topk
        sched = fn(cand, main, k)
    elif cfg.ws == "COMPOSITE" and sec:
        sched = prog.composite_top_budget(cand, main, sec, budget)
    elif cfg.ws == "HYBRID" and sec:
        sched = prog.hybrid_top_budget(cand, main, sec, budget)
    elif cfg.ws == "THIN_MULTI_COMPOSITE":
        sched = prog.thin_multi_top_budget(
            cand, wexpr["js"], wexpr["cf"], wexpr["mbro"], budget
        )
    else:
        sched = prog.progressive_top_budget(cand, main, budget)
    keep = [c for c in sched.columns if c in ("s_id", "t_id")]
    return sched.select(*keep)


def run(spark: SparkSession, cfg: JedaiConfig) -> DataFrame:
    """Execute the configuration; returns the GiantExp-style counts row for
    DE9IM or the qualifying (s_id, t_id) pairs for a single relation."""
    source = read_dataset(spark, cfg.source)
    target = read_dataset(spark, cfg.target)

    decomposed = cfg.entity_type in (
        "DECOMPOSED_ENTITY", "INDEXED_DECOMPOSED_ENTITY"
    )
    if decomposed:
        from ds_jedai_spark.operators.decompose import with_fine_envelopes

        source = with_fine_envelopes(source)
        target = with_fine_envelopes(target)

    theta = compute_theta(source, cfg.theta_granularity)
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
        pair_keys = _schedule(cand, cfg, wexpr)
        cand = cand.join(pair_keys, on=["s_id", "t_id"], how="left_semi")

    verified = with_general_relations(cand)

    if stateful:
        # These algorithms interleave verification with scheduling (the PQ
        # reorders / the scan stops based on hits), so they run over the
        # relation-flagged candidates and emit the verified subset.
        from ds_jedai_spark.operators.progressive_state import (
            dynamic_progressive,
            early_stopping,
        )

        wexpr = weight_exprs(
            "s_", "t_", theta[0], theta[1], _total_blocks(source, theta)
        )
        main = wexpr[cfg.main_wf.lower().replace("pearson_x2", "x2")]
        qcol = (
            "r_intersects"
            if cfg.relation == "DE9IM"
            else f"r_{cfg.relation.lower()}"
        )
        if cfg.progressive_algorithm == "DYNAMIC_PROGRESSIVE_GIANT":
            sched = dynamic_progressive(
                verified, main, qcol, cfg.budget or 3000
            )
        else:
            sched = early_stopping(verified, main, qcol)
        verified = verified.join(
            sched.select("s_id", "t_id"), on=["s_id", "t_id"], how="left_semi"
        )

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
