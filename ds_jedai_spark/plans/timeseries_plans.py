"""Time-series join queries over the events table: as-of join and
interval join, each with a DuckDB oracle.

The reference has no temporal joins (its only temporal operator is the
+-2-day spatio-temporal pair filter, utils/configuration; mirrored by
plans/giant.py spatiotemporal_pairs); these are the event-stream joins a
feature/training pipeline runs constantly. Implementations in
operators/temporal.py are single-shuffle plans — see that module's
docstring for the 100 TB argument.

All timestamp outputs are projected to epoch microseconds (BIGINT) so
the Spark/DuckDB hash comparison never depends on timestamp rendering.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ds_jedai_spark.io.synthetic import register_views
from ds_jedai_spark.operators.temporal import asof_join, epoch_us, interval_join

INCIDENT_US = 6 * 3600 * 1_000_000  # 6-hour incident window after each error


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    return spark.table("events")


ASOF_BUCKET_US = 24 * 3600 * 1_000_000  # 1-day carry buckets
ASOF_TOL_US = 7 * 24 * 3600 * 1_000_000  # 7-day match tolerance


def _events_asof(direction: str, tolerance_us: int | None = None):
    def q(spark: SparkSession, sf_dir: str) -> DataFrame:
        """Each click joined to the user's matching purchase (backward /
        forward / nearest as-of), via the SKEW-SAFE bucket-carry form:
        no plan stage scales with events-per-key, so a bot account
        holding 10% of the stream cannot serialize a task
        (operators/temporal.py)."""
        ev = _events(spark, sf_dir)
        clicks = ev.where(F.col("event_type") == "click").select(
            "user_id", "ts", F.col("event_id").alias("click_id")
        )
        purchases = ev.where(F.col("event_type") == "purchase").select(
            "user_id", "ts", F.col("event_id").alias("purchase_id"), "value"
        )
        j = asof_join(
            clicks, purchases, key="user_id", ts="ts",
            right_attrs=("purchase_id", "value"),
            bucket_us=ASOF_BUCKET_US,
            direction=direction,
            tolerance_us=tolerance_us,
        )
        return j.select(
            "click_id",
            "user_id",
            epoch_us("ts").alias("click_us"),
            F.col("asof_purchase_id").alias("purchase_id"),
            F.col("asof_value").alias("purchase_value"),
            epoch_us("asof_ts").alias("purchase_us"),
        )

    return q


events_asof_join = _events_asof("backward")
events_asof_forward = _events_asof("forward")
events_asof_nearest = _events_asof("nearest")
events_asof_tolerance = _events_asof("backward", tolerance_us=ASOF_TOL_US)

_ASOF_SRC = (
    "FROM (SELECT * FROM events WHERE event_type = 'click') l "
    "ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') r "
)


def _asof_oracle(op: str) -> str:
    return (
        "SELECT l.event_id AS click_id, l.user_id, "
        "epoch_us(l.ts) AS click_us, "
        "r.event_id AS purchase_id, r.value AS purchase_value, "
        "epoch_us(r.ts) AS purchase_us "
        f"{_ASOF_SRC}ON l.user_id = r.user_id AND l.ts {op} r.ts"
    )


def events_asof_join_oracle() -> str:
    return _asof_oracle(">=")


def events_asof_tolerance_oracle() -> str:
    """Backward ASOF with a 7-day tolerance: matches farther than the
    window null out (all three right-side columns together)."""
    cond = f"b.click_us - b.purchase_us <= {ASOF_TOL_US}"
    sel = ", ".join(
        f"CASE WHEN {cond} THEN b.{c} END AS {c}"
        for c in ("purchase_id", "purchase_value", "purchase_us")
    )
    return (
        f"WITH b AS ({_asof_oracle('>=')}) "
        f"SELECT b.click_id, b.user_id, b.click_us, {sel} FROM b"
    )


def events_asof_forward_oracle() -> str:
    return _asof_oracle("<=")


def events_asof_nearest_oracle() -> str:
    """Nearest = closer of the backward and forward matches, exact ties
    backward — composed from the two native DuckDB ASOF directions."""
    b = _asof_oracle(">=")
    f = _asof_oracle("<=")
    pick_b = (
        "f.purchase_us IS NULL OR (b.purchase_us IS NOT NULL AND "
        "(b.click_us - b.purchase_us) <= (f.purchase_us - b.click_us))"
    )
    sel = ", ".join(
        f"CASE WHEN {pick_b} THEN b.{c} ELSE f.{c} END AS {c}"
        for c in ("purchase_id", "purchase_value", "purchase_us")
    )
    return (
        f"WITH b AS ({b}), f AS ({f}) "
        f"SELECT b.click_id, b.user_id, b.click_us, {sel} "
        "FROM b JOIN f ON b.click_id = f.click_id"
    )


def _events_interval(how: str):
    def q(spark: SparkSession, sf_dir: str) -> DataFrame:
        """Clicks landing inside any same-user 6-hour post-error
        incident window: (user, bucket) equi-join + residual range
        predicate (no range cross-join; each pair meets in exactly one
        bucket). ``how="left"`` keeps clicks outside every incident
        window with NULL incident columns."""
        ev = _events(spark, sf_dir)
        clicks = ev.where(F.col("event_type") == "click").select(
            F.col("event_id").alias("click_id"),
            F.col("user_id").alias("c_user"),
            "ts",
        )
        incidents = ev.where(F.col("event_type") == "error").select(
            F.col("event_id").alias("error_id"),
            F.col("user_id").alias("e_user"),
            F.col("ts").alias("w_start"),
            F.expr("ts + INTERVAL 6 HOURS").alias("w_end"),
        )
        j = interval_join(
            clicks, incidents,
            left_ts="ts", right_start="w_start", right_end="w_end",
            bucket_us=INCIDENT_US,
            keys=[("c_user", "e_user")],
            how=how,
        )
        return j.select(
            "click_id",
            "error_id",
            F.col("c_user").alias("user_id"),
            (epoch_us("ts") - epoch_us("w_start")).alias("delta_us"),
        )

    return q


events_interval_join = _events_interval("inner")
events_interval_left = _events_interval("left")


def events_interval_left_oracle() -> str:
    return (
        "SELECT c.event_id AS click_id, e.event_id AS error_id, "
        "c.user_id AS user_id, "
        "epoch_us(c.ts) - epoch_us(e.ts) AS delta_us "
        "FROM (SELECT * FROM events WHERE event_type = 'click') c "
        "LEFT JOIN (SELECT * FROM events WHERE event_type = 'error') e "
        "ON c.user_id = e.user_id AND c.ts >= e.ts "
        f"AND epoch_us(c.ts) <= epoch_us(e.ts) + {INCIDENT_US}"
    )


def events_interval_join_oracle() -> str:
    return (
        "SELECT c.event_id AS click_id, e.event_id AS error_id, "
        "c.user_id AS user_id, "
        "epoch_us(c.ts) - epoch_us(e.ts) AS delta_us "
        "FROM (SELECT * FROM events WHERE event_type = 'click') c "
        "JOIN (SELECT * FROM events WHERE event_type = 'error') e "
        "ON c.user_id = e.user_id AND c.ts >= e.ts "
        f"AND epoch_us(c.ts) <= epoch_us(e.ts) + {INCIDENT_US}"
    )


QUERIES = {
    "events_asof_join": events_asof_join,
    "events_asof_forward": events_asof_forward,
    "events_asof_nearest": events_asof_nearest,
    "events_asof_tolerance": events_asof_tolerance,
    "events_interval_join": events_interval_join,
    "events_interval_left": events_interval_left,
}

ORACLES = {
    "events_asof_join": events_asof_join_oracle(),
    "events_asof_forward": events_asof_forward_oracle(),
    "events_asof_nearest": events_asof_nearest_oracle(),
    "events_asof_tolerance": events_asof_tolerance_oracle(),
    "events_interval_join": events_interval_join_oracle(),
    "events_interval_left": events_interval_left_oracle(),
}
