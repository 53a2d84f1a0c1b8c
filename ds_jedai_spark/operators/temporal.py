"""Time-series joins over event streams: as-of join and interval join.

Two operators the reference lacks but any large-scale event/feature
pipeline needs (reference scope: spatial-only joins,
linkers/DistributedInterlinking.scala; its only temporal operator is the
+-2-day pair filter mirrored in plans/giant.py). Both are built
Spark-first around ONE hash shuffle each — never a range cross-join:

- as-of join: union-and-window. Tag both sides, hash-partition by the
  equi-key, sort each partition once by timestamp, and carry the most
  recent right-side row forward with last(ignorenulls) over an
  unbounded-preceding window. One shuffle by key, no per-row probe, no
  broadcast of the right side — both sides stream at 100 TB. (The
  classic alternative — bucket join + max-per-left — shuffles the right
  side once per candidate bucket; the union form shuffles each row
  exactly once.) The per-key window cannot be split by AQE, so for raw
  event volume (where one hot key can hold 10% of the stream) the
  ``bucket_us`` form replaces it with a two-phase bucket-carry: window
  within (key, time-bucket), then a per-key carry whose partition is
  rows = buckets, not events. See ``asof_join``.

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


ASOF_AUTO_TARGET_ROWS = 65_536


def auto_bucket_us(
    right: DataFrame, ts: str = "ts",
    target_rows: int = ASOF_AUTO_TARGET_ROWS,
) -> int | None:
    """Heuristic bucket width for the skew-safe as-of form: the widest
    bucket such that even a key owning the ENTIRE right stream holds at
    most ~``target_rows`` rows per (key, bucket) window partition —
    ``span_us * target / n_rows``. One cheap count+min/max aggregate on
    the right side (a scan with a 1-row result; no shuffle of data
    rows); under a roughly time-uniform arrival rate this is
    worst-case-safe in KEY skew, because any single key's rate is
    bounded by the global rate.

    The bound assumes rate uniformity IN TIME: the width divides the
    span by total rows, so a temporal burst (90% of events inside one
    flash minute of a year-long span) still lands in one bucket and a
    hot key inside the burst re-creates the big partition. For bursty
    streams size the bucket from the PEAK rate instead (bucket_us ~
    target_rows / peak_rows_per_us) or pass an explicit width; deriving
    that from a per-bucket count quantile costs one extra aggregate.
    Returns None (single-window form) when the stream is small enough
    that one key could hold it all anyway."""
    r = right.agg(
        F.count(F.lit(1)).alias("n"),
        F.min(ts).alias("lo"),
        F.max(ts).alias("hi"),
    ).first()
    if not r["n"] or r["n"] <= target_rows:
        return None
    if r["lo"] is None or r["hi"] is None:  # all-null event times
        return None
    delta = r["hi"] - r["lo"]
    span = (delta.days * 86_400 + delta.seconds) * 1_000_000 + delta.microseconds
    if span <= 0:
        return None
    return max(1, span * target_rows // r["n"])


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str | list[str] = "user_id",
    ts: str = "ts",
    right_attrs: tuple[str, ...] = (),
    bucket_us: int | str | None = None,
    direction: str = "backward",
    tolerance_us: int | None = None,
    allow_exact_matches: bool = True,
) -> DataFrame:
    """For each left row, append the matching right row for the same
    key (pandas ``merge_asof`` direction semantics). Right attributes
    come back as ``asof_<name>``, NULL when no match exists.

    - ``direction="backward"`` (default): greatest ``right.ts <=
      left.ts`` — DuckDB ``ASOF ... ON l.ts >= r.ts``.
    - ``direction="forward"``: smallest ``right.ts >= left.ts`` —
      DuckDB ``ASOF ... ON l.ts <= r.ts``.
    - ``direction="nearest"``: whichever of the two is closer in time;
      exact ties resolve backward. Costs one extra window pass over the
      same shuffle (specs share partition keys, so Catalyst adds a sort
      per direction, not an exchange).

    ``tolerance_us`` (pandas ``tolerance``): a match farther than this
    many microseconds from the left row comes back NULL — a pure
    post-predicate on the already-selected match (the closest candidate
    per direction), no plan change. ``allow_exact_matches=False``
    (pandas semantics) excludes right rows at exactly ``left.ts`` —
    implemented by flipping the tie order inside the window sort, so
    the cost is identical. Same-ts rows always share a bucket, so both
    knobs compose with the bucket-carry form unchanged.

    Ties on (key, ts) across sides resolve right-before-left (a right
    row at exactly left.ts matches). Multiple right rows at the same
    (key, ts) would be engine-order nondeterministic — callers needing
    that case must pre-aggregate the right side to one row per (key, ts).
    The matched right row travels as ONE struct, so a genuinely-NULL
    attribute on the matched row stays NULL instead of leaking an older
    row's value (per-attribute last(ignorenulls) would).

    ``bucket_us=None`` is the single-window form: each row shuffles
    exactly once by ``key``, but the per-key window is unbounded — one
    hot key (a bot with 10% of the event stream) serializes in a single
    task. UNSAFE UNDER KEY SKEW: use it only when per-key volume is
    known-bounded (sessions, per-user trickle). For raw event-scale
    inputs pass an explicit width or ``bucket_us="auto"``, which derives
    a worst-case-safe width from one cheap count+span aggregate on the
    right side (see auto_bucket_us; choice recorded in PLANS.md).

    ``bucket_us=N`` is the SKEW-SAFE two-phase bucket-carry form for
    raw event volume:

    1. window within (key, time-bucket) fills each left row from right
       rows in its own bucket — partitions hold ~rate x N rows no
       matter how hot the key is;
    2. each bucket's last right row (max struct) is carried forward
       with a per-key window over the (key, bucket) summary — that
       window's partition is rows = BUCKETS per key, not events — and
       rejoined on (key, bucket); left rows unfilled in phase 1 take
       the carried row from the latest earlier bucket.

    No plan stage scales with events-per-key: AQE can split the
    (key, bucket) exchanges where it cannot split a per-key WindowExec.
    """
    from pyspark.sql.types import StructField, StructType

    if bucket_us == "auto":
        bucket_us = auto_bucket_us(right, ts)
    elif isinstance(bucket_us, str):
        raise ValueError(f"bucket_us must be an int, None, or 'auto': {bucket_us!r}")
    keys = [key] if isinstance(key, str) else list(key)
    lcols = left.columns
    rstruct_t = StructType(
        [StructField("_rts", right.schema[ts].dataType)]
        + [
            StructField(f"asof_{a}", right.schema[a].dataType)
            for a in right_attrs
        ]
    )
    passthrough = [c for c in lcols if c not in (*keys, ts)]
    l = left.select(
        *keys,
        ts,
        F.lit(0).alias("_is_right"),
        *[F.col(c) for c in passthrough],
        F.lit(None).cast(rstruct_t).alias("_r"),
    )
    r = right.select(
        *keys,
        ts,
        F.lit(1).alias("_is_right"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c)
          for c in passthrough],
        F.struct(
            F.col(ts).alias("_rts"),
            *[F.col(a).alias(f"asof_{a}") for a in right_attrs],
        ).alias("_r"),
    )
    u = l.unionByName(r)

    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(f"unknown direction: {direction!r}")
    # tie order: does a right row at exactly left.ts fall INSIDE the
    # frame? backward frame is [preceding, current] -> right-first at a
    # tie includes it; forward frame is [current, following] ->
    # LEFT-first includes it. allow_exact_matches=False flips both.
    b_tie = F.col("_is_right").desc() if allow_exact_matches else F.col("_is_right").asc()
    f_tie = F.col("_is_right").asc() if allow_exact_matches else F.col("_is_right").desc()

    def _tol_b(m):
        if tolerance_us is None:
            return m
        d = epoch_us(F.col(ts)) - epoch_us(m["_rts"])
        return F.when(d <= F.lit(tolerance_us), m)

    def _tol_f(m):
        if tolerance_us is None:
            return m
        d = epoch_us(m["_rts"]) - epoch_us(F.col(ts))
        return F.when(d <= F.lit(tolerance_us), m)

    def _out(rows: DataFrame, match) -> DataFrame:
        return rows.select(
            *keys,
            ts,
            *[F.col(c) for c in passthrough],
            *[match[f"asof_{a}"].alias(f"asof_{a}") for a in right_attrs],
            match["_rts"].alias("asof_ts"),
        )

    def _nearest(mb, mf):
        # closer match wins; exact ties resolve backward (<=)
        db = epoch_us(F.col(ts)) - epoch_us(mb["_rts"])
        df_ = epoch_us(mf["_rts"]) - epoch_us(F.col(ts))
        return (
            F.when(mb.isNull(), mf)
            .when(mf.isNull(), mb)
            .when(db <= df_, mb)
            .otherwise(mf)
        )

    want_b = direction in ("backward", "nearest")
    want_f = direction in ("forward", "nearest")

    if bucket_us is None:
        wb = (
            Window.partitionBy(*keys)
            .orderBy(F.col(ts).asc(), b_tie)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        wf = (
            Window.partitionBy(*keys)
            .orderBy(F.col(ts).asc(), f_tie)
            .rowsBetween(Window.currentRow, Window.unboundedFollowing)
        )
        filled = u
        if want_b:
            filled = filled.withColumn(
                "_fb", F.last("_r", ignorenulls=True).over(wb)
            )
        if want_f:
            filled = filled.withColumn(
                "_ff", F.first("_r", ignorenulls=True).over(wf)
            )
        mb = _tol_b(F.col("_fb")) if want_b else None
        mf = _tol_f(F.col("_ff")) if want_f else None
        match = (
            _nearest(mb, mf) if direction == "nearest"
            else mb if direction == "backward"
            else mf
        )
        return _out(filled.where(F.col("_is_right") == 0), match)

    u = u.withColumn(
        "_bkt", F.floor(epoch_us(F.col(ts)) / F.lit(bucket_us)).cast("long")
    )
    w1b = (
        Window.partitionBy(*keys, "_bkt")
        .orderBy(F.col(ts).asc(), b_tie)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w1f = (
        Window.partitionBy(*keys, "_bkt")
        .orderBy(F.col(ts).asc(), f_tie)
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    filled = u
    if want_b:
        filled = filled.withColumn(
            "_f1b", F.last("_r", ignorenulls=True).over(w1b)
        )
    if want_f:
        filled = filled.withColumn(
            "_f1f", F.first("_r", ignorenulls=True).over(w1f)
        )
    # Bucket summary: one row per (key, bucket) present on EITHER side
    # (max/min ignore the null _r of left rows -> null for right-free
    # buckets), so the rejoin below is a plain inner join. The carry
    # windows run over the summary: partitions are buckets, not events.
    # Shuffle volume: the summary groupBy partial-aggregates map-side,
    # so its exchange moves only per-partition (key, bucket) rows —
    # events cross the wire in full exactly once (the w1 exchange).
    aggs = []
    if want_b:
        aggs.append(F.max("_r").alias("_last"))
    if want_f:
        aggs.append(F.min("_r").alias("_first"))
    summary = u.groupBy(*keys, "_bkt").agg(*aggs)
    wcb = (
        Window.partitionBy(*keys)
        .orderBy("_bkt")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    wcf = (
        Window.partitionBy(*keys)
        .orderBy("_bkt")
        .rowsBetween(1, Window.unboundedFollowing)
    )
    carry_cols = [*[F.col(c) for c in keys], F.col("_bkt")]
    if want_b:
        carry_cols.append(
            F.last("_last", ignorenulls=True).over(wcb).alias("_cb")
        )
    if want_f:
        carry_cols.append(
            F.first("_first", ignorenulls=True).over(wcf).alias("_cf")
        )
    carry = summary.select(*carry_cols)
    joined = filled.where(F.col("_is_right") == 0).join(
        carry, [*keys, "_bkt"]
    )
    mb = _tol_b(F.coalesce(F.col("_f1b"), F.col("_cb"))) if want_b else None
    mf = _tol_f(F.coalesce(F.col("_f1f"), F.col("_cf"))) if want_f else None
    match = (
        _nearest(mb, mf) if direction == "nearest"
        else mb if direction == "backward"
        else mf
    )
    return _out(joined, match)


INTERVAL_AUTO_QUANTILE = 0.95


def auto_interval_bucket_us(
    right: DataFrame,
    right_start: str = "w_start",
    right_end: str = "w_end",
    quantile: float = INTERVAL_AUTO_QUANTILE,
) -> int:
    """Derived bucket width for interval_join: a HIGH quantile (p95) of
    the right-side interval lengths — the auto_bucket_us analogue for
    the interval form. A window explodes onto ``len/width + 1`` bucket
    rows, so width ~ p95(len) keeps ~95% of windows at <= 2 rows while
    only the long tail pays proportionally; sizing from the MEAN would
    let a skewed tail (a few year-long windows among 5-minute ones)
    look fine on average while those windows explode to thousands of
    rows each, and a FIXED default does the same the moment real window
    lengths diverge from it. One approx-percentile aggregate on the
    right side (a scan with a 1-row result, no data-row shuffle);
    approximation only moves the width a little, never correctness —
    the residual range predicate recovers exact matches at any width.
    Falls back to 5 minutes when the right side is empty or all-null."""
    q = right.select(
        F.percentile_approx(
            epoch_us(F.col(right_end)) - epoch_us(F.col(right_start)),
            F.lit(quantile),
        ).alias("q")
    ).first()["q"]
    if q is None or q <= 0:
        return 300_000_000
    return int(q)


def interval_join(
    left: DataFrame,
    right: DataFrame,
    *,
    left_ts: str = "ts",
    right_start: str = "w_start",
    right_end: str = "w_end",
    bucket_us: int | str = "auto",
    keys: list[tuple[str, str]] | None = None,
    how: str = "inner",
) -> DataFrame:
    """Join left rows onto right intervals containing them
    (``start <= left_ts <= end``, closed ends) via bucket equi-join.

    Both frames must already carry disjoint column names apart from the
    join mechanics; the result keeps all columns of both. ``bucket_us``
    is the hash-bucket width in microseconds; the default ``"auto"``
    derives it from the p95 right-side interval length (one cheap
    aggregate, see auto_interval_bucket_us) so each window explodes to
    ~2 bucket rows whatever the data's window scale — pass an explicit
    width to pin the plan (e.g. for the oracle-replayed gate queries).

    ``keys`` adds (left_col, right_col) equalities to the JOIN
    condition — at scale this matters twice over: the hash key becomes
    (key, bucket) instead of bucket alone (without it every key's rows
    meet every other key's intervals in the same time bucket —
    quadratic in keys active per bucket), and it makes ``how="left"``
    correct (a post-join key filter would drop the NULL-extended rows).

    ``how``: "inner" or "left". Left keeps unmatched left rows with
    NULL right columns — each left row carries exactly one bucket row,
    so the NULL extension appears exactly once per unmatched row.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"unknown how: {how!r}")
    if bucket_us == "auto":
        bucket_us = auto_interval_bucket_us(right, right_start, right_end)
    elif isinstance(bucket_us, str):
        raise ValueError(f"bucket_us must be an int or 'auto': {bucket_us!r}")

    def bucket(col):
        # floor division, not cast-truncation: identical bucketing for
        # pre-1970 timestamps too
        return F.floor(epoch_us(col) / F.lit(bucket_us)).cast("long")

    lb = left.withColumn("_lbkt", bucket(F.col(left_ts)))
    rb = right.withColumn(
        "_rbkt",
        F.explode(
            F.sequence(bucket(F.col(right_start)), bucket(F.col(right_end)))
        ),
    )
    cond = (
        (F.col("_lbkt") == F.col("_rbkt"))
        & (F.col(left_ts) >= F.col(right_start))
        & (F.col(left_ts) <= F.col(right_end))
    )
    for lk, rk in keys or []:
        cond = cond & (F.col(lk) == F.col(rk))
    return lb.join(rb, cond, how).drop("_lbkt", "_rbkt")
