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

PAIR_RELATIONS = (
    "intersects",
    "contains",
    "within",
    "covers",
    "coveredby",
    "equals",
    "touches",
    "overlaps",
)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: GIA.nt DE-9IM relation counts on sf0.001."""
    return giant.giant_counts(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    q: dict[str, Callable[[SparkSession, str], DataFrame]] = {
        "giant_counts": giant.giant_counts,
        "spatiotemporal_pairs": giant.spatiotemporal_pairs,
        "point_in_box_pairs": giant.point_in_box_pairs,
    }
    for rel in PAIR_RELATIONS:
        q[f"pairs_{rel}"] = giant.relation_pairs(rel)
    return q


def oracle_sql() -> dict[str, str]:
    o = {
        "giant_counts": giant.giant_counts_oracle(),
        "spatiotemporal_pairs": giant.spatiotemporal_pairs_oracle(),
        "point_in_box_pairs": giant.point_in_box_pairs_oracle(),
    }
    for rel in PAIR_RELATIONS:
        o[f"pairs_{rel}"] = giant.relation_pairs_oracle(rel)
    return o
