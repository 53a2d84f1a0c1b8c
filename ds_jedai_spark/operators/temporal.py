"""Time-series joins over event streams: as-of join and interval join.

Two operators the reference lacks but any large-scale event/feature
pipeline needs (reference scope: spatial-only joins,
linkers/DistributedInterlinking.scala; its only temporal operator is the
+-2-day pair filter mirrored in plans/giant.py). Both are built
Spark-first around ONE hash shuffle each — never a range cross-join:

- as-of join: union-and-window. Tag both sides, hash-partition by the
  equi-key, sort each partition once by timestamp, and carry the most
  recent right-side attributes forward with last(ignorenulls) over an
  unbounded-preceding window. One shuffle by key, no per-row probe, no
  broadcast of the right side — both sides stream at 100 TB. (The
  classic alternative — bucket join + max-per-left — shuffles the right
  side once per candidate bucket; the union form shuffles each row
  exactly once.)

- interval join: bucket equi-join. Right-side windows [start, end] are
  exploded onto the fixed-width time buckets they cover (sequence() of
  floor-divided epochs — at most len/width + 1 rows), the left side
  lands on its single bucket, and a hash join on (key?, bucket) plus a
  residual range predicate recovers exactly the interval matches. Each
  (left, right) pair meets in exactly one bucket — the left row's own —
  so no post-join dedup is needed. Bucket width should match the window
  length: one exploded row per window per covered bucket, and AQE
  handles residual bucket skew.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F


def epoch_us(col: Column | str) -> Column:
    """Microseconds since 1970-01-01 for TIMESTAMP **or** TIMESTAMP_NTZ.

    ``unix_micros`` rejects NTZ (the type register_views normalizes
    parquet event timestamps to), and casting NTZ through TIMESTAMP
    would inject the session timezone. A timestamp_diff against the NTZ
    epoch is timezone-free and matches DuckDB's ``epoch_us`` on naive
    timestamps exactly."""
    return F.timestamp_diff(
        "MICROSECOND",
        F.to_timestamp_ntz(F.lit("1970-01-01 00:00:00")),
        F.col(col) if isinstance(col, str) else col,
    )


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str = "user_id",
    ts: str = "ts",
    right_attrs: tuple[str, ...] = (),
) -> DataFrame:
    """For each left row, append the right row with the greatest
    ``right.ts <= left.ts`` for the same key (DuckDB/pandas ASOF
    backward semantics). Right attributes come back as ``asof_<name>``,
    NULL when no prior right row exists.

    Ties on (key, ts) across sides resolve right-before-left (a right
    row at exactly left.ts matches). Multiple right rows at the same
    (key, ts) would be engine-order nondeterministic — callers needing
    that case must pre-aggregate the right side to one row per (key, ts).
    """
    lcols = left.columns
    tag = F.lit(1)
    l = left.select(
        key,
        ts,
        F.lit(0).alias("_is_right"),
        *[F.col(c) for c in lcols if c not in (key, ts)],
        *[F.lit(None).cast(right.schema[a].dataType).alias(f"asof_{a}")
          for a in right_attrs],
    )
    r = right.select(
        key,
        ts,
        tag.alias("_is_right"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c)
          for c in lcols if c not in (key, ts)],
        *[F.col(a).alias(f"asof_{a}") for a in right_attrs],
    )
    u = l.unionByName(r)
    # right rows sort before left rows at equal ts => "<=" matches them
    w = (
        Window.partitionBy(key)
        .orderBy(F.col(ts).asc(), F.col("_is_right").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = u.select(
        "*",
        *[
            F.last(f"asof_{a}", ignorenulls=True).over(w).alias(f"_f_{a}")
            for a in right_attrs
        ],
        F.last(F.when(F.col("_is_right") == 1, F.col(ts)), ignorenulls=True)
        .over(w)
        .alias("_f_ts"),
    )
    return (
        filled.where(F.col("_is_right") == 0)
        .select(
            key,
            ts,
            *[F.col(c) for c in lcols if c not in (key, ts)],
            *[F.col(f"_f_{a}").alias(f"asof_{a}") for a in right_attrs],
            F.col("_f_ts").alias("asof_ts"),
        )
    )


def interval_join(
    left: DataFrame,
    right: DataFrame,
    *,
    left_ts: str = "ts",
    right_start: str = "w_start",
    right_end: str = "w_end",
    bucket_us: int = 300_000_000,
) -> DataFrame:
    """Inner-join left rows onto right intervals containing them
    (``start <= left_ts <= end``, closed ends) via bucket equi-join.

    Both frames must already carry disjoint column names apart from the
    join mechanics; the result keeps all columns of both. ``bucket_us``
    is the hash-bucket width in microseconds (default 5 min — match it
    to the typical window length so each window explodes to ~2 rows).
    """
    def bucket(col):
        # floor division, not cast-truncation: identical bucketing for
        # pre-1970 timestamps too
        return F.floor(epoch_us(col) / F.lit(bucket_us)).cast("long")

    lb = left.withColumn("_bucket", bucket(F.col(left_ts)))
    rb = right.withColumn(
        "_bucket",
        F.explode(
            F.sequence(bucket(F.col(right_start)), bucket(F.col(right_end)))
        ),
    )
    return (
        lb.join(rb, "_bucket")
        .where(
            (F.col(left_ts) >= F.col(right_start))
            & (F.col(left_ts) <= F.col(right_end))
        )
        .drop("_bucket")
    )
