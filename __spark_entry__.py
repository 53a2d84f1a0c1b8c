"""Driver contract for the spark-graft builder (PySpark target).

Maps SURVEY.md §2 operators to runnable (spark, sf_dir) -> DataFrame
queries plus DuckDB oracle SQL. See ds_jedai_spark/ for the engine.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, str(Path(__file__).resolve().parent))

from ds_jedai_spark.plans import giant  # noqa: E402
from ds_jedai_spark.plans import pipeline_plans as pl  # noqa: E402
from ds_jedai_spark.plans import progressive_plans as pp  # noqa: E402
from ds_jedai_spark.plans import reader_plans as rp  # noqa: E402
from ds_jedai_spark.plans import streaming_plans as sp  # noqa: E402

PAIR_RELATIONS = (
    "intersects",
    "contains",
    "within",
    "covers",
    "coveredby",
    "equals",
    "touches",
    "overlaps",
    # crosses is identically false in the box algebra (see operators/relate.py);
    # the pairs query + oracle prove the empty set matches. Nonempty crosses
    # support lives in line_box_crosses_pairs / triangle_line_counts.
    "crosses",
)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: GIA.nt DE-9IM relation counts on sf0.001."""
    return giant.giant_counts(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    q: dict[str, Callable[[SparkSession, str], DataFrame]] = {
        "giant_counts": giant.giant_counts,
        "spatiotemporal_pairs": giant.spatiotemporal_pairs,
        "point_in_box_pairs": giant.point_in_box_pairs,
        "line_box_counts": giant.line_box_counts,
        "line_box_crosses_pairs": giant.line_box_crosses_pairs,
        "partitioned_counts": giant.partitioned_counts,
        "finegrained_line_counts": giant.finegrained_line_counts,
        "dirty_self_pairs": giant.dirty_self_pairs,
        "triangle_point_counts": giant.triangle_point_counts,
        "triangle_line_counts": giant.triangle_line_counts,
        "triangle_triangle_counts": giant.triangle_triangle_counts,
        "multipoint_line_counts": giant.multipoint_line_counts,
        "multipoint_triangle_counts": giant.multipoint_triangle_counts,
        "envelope_rank_counts": giant.envelope_rank_counts,
        "pair_ref_points": giant.pair_ref_points,
        "disjoint_counts": giant.disjoint_counts,
        "wkt_reader_counts": rp.wkt_reader_counts,
        "geojson_reader_counts": rp.geojson_reader_counts,
        "ntriples_reader_counts": rp.ntriples_reader_counts,
        "sink_roundtrip_counts": rp.sink_roundtrip_counts,
        "ntriples_sink_roundtrip": rp.ntriples_sink_roundtrip,
        "distance_pairs": giant.distance_pairs,
        "knn_pairs": giant.knn_pairs,
        "knn_exact_pairs": giant.knn_exact_pairs,
    }
    for rel in PAIR_RELATIONS:
        q[f"pairs_{rel}"] = giant.relation_pairs(rel)
    q.update(
        {
            "progressive_giant_js": pp.progressive_giant_js,
            "progressive_giant_x2": pp.progressive_giant_x2,
            "topk_cf": pp.topk_cf,
            "reciprocal_topk_mbro": pp.reciprocal_topk_mbro,
            "random_sched": pp.random_sched,
            "pgr_js_overlaps": pp.pgr_js_overlaps,
            "composite_js_mbro": pp.composite_js_mbro,
            "hybrid_js_mbro": pp.hybrid_js_mbro,
            "thin_multi_js_cf_mbro": pp.thin_multi_js_cf_mbro,
            "progressive_isp": pp.progressive_isp,
            "local_budget_js": pp.local_budget_js,
            "progressive_eval_js_overlaps": pp.progressive_eval_js_overlaps,
            "common_tiles_array": pp.common_tiles_array,
            "theta_stats": pp.theta_stats,
            "skew_cost": pp.skew_cost,
            "skew_entities": pp.skew_entities,
            "well_balanced_counts": pp.well_balanced_counts,
            "segment_groups": pp.segment_groups,
            # Stateful scans — sequential semantics, oracled via
            # recursive-CTE / gaps-and-islands SQL replays:
            "dynamic_progressive_js": pp.dynamic_progressive_js,
            "early_stopping_js": pp.early_stopping_js,
        }
    )
    q.update(pl.QUERIES)
    q.update(
        {
            "stream_window_counts": sp.stream_window_counts,
            "stream_points_in_boxes": sp.stream_points_in_boxes,
            "stream_sessions": sp.stream_sessions,
            "stream_event_pairs": sp.stream_event_pairs,
        }
    )
    return q


def oracle_sql() -> dict[str, str]:
    o = {
        "giant_counts": giant.giant_counts_oracle(),
        "spatiotemporal_pairs": giant.spatiotemporal_pairs_oracle(),
        "point_in_box_pairs": giant.point_in_box_pairs_oracle(),
        "line_box_counts": giant.line_box_counts_oracle(),
        "line_box_crosses_pairs": giant.line_box_crosses_pairs_oracle(),
        "partitioned_counts": giant.giant_counts_oracle(),
        "finegrained_line_counts": giant.finegrained_line_counts_oracle(),
        "dirty_self_pairs": giant.dirty_self_pairs_oracle(),
        "triangle_point_counts": giant.triangle_point_counts_oracle(),
        "triangle_line_counts": giant.triangle_line_counts_oracle(),
        "triangle_triangle_counts": giant.triangle_triangle_counts_oracle(),
        "multipoint_line_counts": giant.multipoint_line_counts_oracle(),
        "multipoint_triangle_counts": giant.multipoint_triangle_counts_oracle(),
        "envelope_rank_counts": giant.envelope_rank_counts_oracle(),
        "pair_ref_points": giant.pair_ref_points_oracle(),
        "disjoint_counts": giant.disjoint_counts_oracle(),
        "wkt_reader_counts": rp.wkt_reader_counts_oracle(),
        "geojson_reader_counts": rp.geojson_reader_counts_oracle(),
        "ntriples_reader_counts": rp.ntriples_reader_counts_oracle(),
        "sink_roundtrip_counts": rp.sink_roundtrip_counts_oracle(),
        "ntriples_sink_roundtrip": rp.ntriples_sink_roundtrip_oracle(),
        "distance_pairs": giant.distance_pairs_oracle(),
        "knn_pairs": giant.knn_pairs_oracle(),
        "knn_exact_pairs": giant.knn_exact_pairs_oracle(),
    }
    for rel in PAIR_RELATIONS:
        o[f"pairs_{rel}"] = giant.relation_pairs_oracle(rel)
    o.update(
        {
            "progressive_giant_js": pp.progressive_giant_js_oracle(),
            "progressive_giant_x2": pp.progressive_giant_x2_oracle(),
            "topk_cf": pp.topk_cf_oracle(),
            "reciprocal_topk_mbro": pp.reciprocal_topk_mbro_oracle(),
            "random_sched": pp.random_sched_oracle(),
            "pgr_js_overlaps": pp.pgr_js_overlaps_oracle(),
            "composite_js_mbro": pp.composite_js_mbro_oracle(),
            "hybrid_js_mbro": pp.hybrid_js_mbro_oracle(),
            "thin_multi_js_cf_mbro": pp.thin_multi_js_cf_mbro_oracle(),
            "progressive_isp": pp.progressive_isp_oracle(),
            "local_budget_js": pp.local_budget_js_oracle(),
            "progressive_eval_js_overlaps": pp.progressive_eval_js_overlaps_oracle(),
            "common_tiles_array": pp.common_tiles_array_oracle(),
            "theta_stats": pp.theta_stats_oracle(),
            "skew_cost": pp.skew_cost_oracle(),
            "skew_entities": pp.skew_entities_oracle(),
            "well_balanced_counts": giant.giant_counts_oracle(),
            "segment_groups": pp.segment_groups_oracle(),
            "dynamic_progressive_js": pp.dynamic_progressive_js_oracle(),
            "early_stopping_js": pp.early_stopping_js_oracle(),
        }
    )
    o.update(pl.ORACLES)
    o.update(
        {
            "stream_window_counts": sp.stream_window_counts_oracle(),
            "stream_points_in_boxes": sp.stream_points_in_boxes_oracle(),
            "stream_sessions": sp.stream_sessions_oracle(),
            "stream_event_pairs": sp.stream_event_pairs_oracle(),
        }
    )
    return o
