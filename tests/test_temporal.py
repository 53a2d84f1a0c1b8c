"""Temporal join operators: semantics against hand-built frames and plan
shape (one hash shuffle, no cartesian / range nested-loop join)."""

import datetime as dt

import pytest
from pyspark.sql import Row, functions as F

from ds_jedai_spark.operators.temporal import asof_join, epoch_us, interval_join


def _ts(minute, second=0):
    return dt.datetime(2024, 1, 1, 0, minute, second)


@pytest.fixture(scope="module")
def frames(spark):
    left = spark.createDataFrame(
        [
            Row(user_id=1, ts=_ts(10), click_id=100),
            Row(user_id=1, ts=_ts(20), click_id=101),
            Row(user_id=2, ts=_ts(5), click_id=102),   # before any right row
            Row(user_id=3, ts=_ts(30), click_id=103),  # user with no right rows
        ]
    )
    right = spark.createDataFrame(
        [
            Row(user_id=1, ts=_ts(8), purchase_id=200, value=1.5),
            Row(user_id=1, ts=_ts(20), purchase_id=201, value=2.5),  # tie with 101
            Row(user_id=2, ts=_ts(9), purchase_id=202, value=3.5),
        ]
    )
    return left, right


def test_asof_backward_semantics(frames, spark):
    left, right = frames
    out = {
        r["click_id"]: r
        for r in asof_join(
            left, right, key="user_id", ts="ts",
            right_attrs=("purchase_id", "value"),
        ).collect()
    }
    assert out[100]["asof_purchase_id"] == 200          # latest <= 00:10
    assert out[101]["asof_purchase_id"] == 201          # equal ts matches
    assert out[102]["asof_purchase_id"] is None         # nothing prior
    assert out[103]["asof_purchase_id"] is None         # no right rows at all
    assert out[100]["asof_ts"] == _ts(8)
    assert out[101]["asof_value"] == 2.5


def test_asof_plan_single_shuffle(frames):
    left, right = frames
    plan = (
        asof_join(left, right, key="user_id", ts="ts", right_attrs=("purchase_id",))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # the union-and-window form needs exactly one exchange (by key)
    assert plan.count("Exchange") == 1


def test_interval_join_closed_ends_and_bucket_boundaries(spark):
    left = spark.createDataFrame(
        [
            Row(ts=_ts(10), click_id=1),   # == w_start (closed)
            Row(ts=_ts(15), click_id=2),   # inside, crosses bucket boundary
            Row(ts=_ts(20), click_id=3),   # == w_end (closed)
            Row(ts=_ts(20, 1), click_id=4),  # just past w_end
            Row(ts=_ts(9, 59), click_id=5),  # just before w_start
        ]
    )
    right = spark.createDataFrame(
        [Row(error_id=9, w_start=_ts(10), w_end=_ts(20))]
    )
    got = sorted(
        r["click_id"]
        for r in interval_join(
            left, right, left_ts="ts", right_start="w_start", right_end="w_end",
            bucket_us=600_000_000,  # 10 min: window spans 2 buckets
        ).collect()
    )
    assert got == [1, 2, 3]


def test_interval_join_no_duplicate_matches(spark):
    # window spanning many buckets still yields each pair exactly once
    left = spark.createDataFrame([Row(ts=_ts(30), click_id=1)])
    right = spark.createDataFrame(
        [Row(error_id=9, w_start=_ts(0), w_end=_ts(59))]
    )
    rows = interval_join(
        left, right, left_ts="ts", right_start="w_start", right_end="w_end",
        bucket_us=60_000_000,  # 1 min buckets -> 60 exploded rows
    ).collect()
    assert len(rows) == 1


def test_epoch_us_matches_duckdb_on_ntz(spark):
    import duckdb

    t = dt.datetime(2024, 3, 5, 7, 9, 11, 131415)
    spark_us = (
        spark.sql(f"SELECT TIMESTAMP_NTZ '{t}' AS ts")
        .select(epoch_us("ts").alias("us"))
        .collect()[0]["us"]
    )
    duck_us = duckdb.sql(f"SELECT epoch_us(TIMESTAMP '{t}')").fetchone()[0]
    assert spark_us == duck_us


def test_asof_bucketed_matches_single_window(frames, spark):
    """The skew-safe bucket-carry form returns exactly the single-window
    result, including at bucket boundaries (60 s buckets put the
    fixture's matches in earlier buckets, same bucket, and no bucket)."""
    left, right = frames
    kw = dict(key="user_id", ts="ts", right_attrs=("purchase_id", "value"))
    plain = {
        r["click_id"]: (r["asof_purchase_id"], r["asof_value"], r["asof_ts"])
        for r in asof_join(left, right, **kw).collect()
    }
    for bucket_us in (60_000_000, 7 * 60_000_000, 3_600_000_000_000):
        bucketed = {
            r["click_id"]: (
                r["asof_purchase_id"], r["asof_value"], r["asof_ts"]
            )
            for r in asof_join(
                left, right, bucket_us=bucket_us, **kw
            ).collect()
        }
        assert bucketed == plain, bucket_us


def test_asof_bucketed_null_attr_on_matched_row(spark):
    """A genuinely-NULL attribute on the matched right row must come back
    NULL — not an older row's value (the struct carry guarantees this)."""
    import datetime as dt

    left = spark.createDataFrame(
        [Row(user_id=1, ts=dt.datetime(2024, 1, 1, 2, 0), click_id=1)]
    )
    right = spark.createDataFrame(
        [
            Row(user_id=1, ts=dt.datetime(2024, 1, 1, 0, 0),
                purchase_id=10, value=9.9),
            Row(user_id=1, ts=dt.datetime(2024, 1, 1, 1, 0),
                purchase_id=11, value=None),
        ]
    )
    for bucket_us in (None, 60_000_000):
        out = asof_join(
            left, right, key="user_id", ts="ts",
            right_attrs=("purchase_id", "value"), bucket_us=bucket_us,
        ).collect()
        assert out[0]["asof_purchase_id"] == 11
        assert out[0]["asof_value"] is None, bucket_us


def test_asof_bucketed_plan_has_no_per_key_event_window(frames):
    """Plan shape of the skew-safe form: every window over event rows is
    partitioned by (key, bucket); the only per-key-alone window runs on
    the bucket SUMMARY (rows = buckets, not events)."""
    left, right = frames
    plan = asof_join(
        left, right, key="user_id", ts="ts",
        right_attrs=("purchase_id",), bucket_us=60_000_000,
    )._jdf.queryExecution().executedPlan().toString()
    import re

    windows = re.findall(r"Window .*?windowspecdefinition\(([^)]*)\)", plan)
    assert windows, plan[:500]
    # w1 partitions by (user_id, _bkt); the carry window partitions by
    # user_id but ORDERS by _bkt (it runs on the bucket summary). A
    # window spec mentioning user_id but never _bkt would be an
    # unbounded per-key scan over raw events — the shape this form bans.
    assert [w for w in windows if "user_id" in w and "_bkt" not in w] == []


def test_asof_forward_and_nearest_semantics(frames, spark):
    """Forward: smallest right.ts >= left.ts (equal ts matches).
    Nearest: closer of the two, exact ties backward. Both forms (plain
    and bucketed) must agree."""
    left, right = frames
    kw = dict(key="user_id", ts="ts", right_attrs=("purchase_id",))
    for bucket_us in (None, 60_000_000, 7 * 60_000_000):
        fwd = {
            r["click_id"]: r["asof_purchase_id"]
            for r in asof_join(
                left, right, direction="forward", bucket_us=bucket_us, **kw
            ).collect()
        }
        # click 100 @00:10 -> next purchase @00:20 (201); 101 @00:20 ties
        # forward too; 102 @00:05 -> purchase @00:09 (202); 103: none.
        assert fwd == {100: 201, 101: 201, 102: 202, 103: None}, bucket_us
        near = {
            r["click_id"]: r["asof_purchase_id"]
            for r in asof_join(
                left, right, direction="nearest", bucket_us=bucket_us, **kw
            ).collect()
        }
        # 100 @00:10: backward 200 @00:08 (2 min) vs forward 201 @00:20
        # (10 min) -> 200; 101 exact tie -> backward 201; 102: only
        # forward exists (202 @00:09, 4 min ahead) -> 202; 103: none.
        assert near == {100: 200, 101: 201, 102: 202, 103: None}, bucket_us


def test_asof_direction_rejects_unknown(frames):
    left, right = frames
    import pytest as _pytest

    with _pytest.raises(ValueError):
        asof_join(left, right, direction="sideways")


def test_asof_cross_validates_against_pandas_merge_asof(spark):
    """Randomized cross-validation: all three directions, plain and
    bucketed, against pandas.merge_asof (an independent implementation
    of the same contract). Right (key, ts) pairs are unique per the
    documented pre-aggregation requirement."""
    import numpy as np
    import pandas as pd

    rng = np.random.default_rng(7)
    base = dt.datetime(2024, 1, 1)
    n_l, n_r = 300, 120
    lpd = pd.DataFrame(
        {
            "user_id": rng.integers(0, 8, n_l),
            "ts": [base + dt.timedelta(seconds=int(s))
                   for s in rng.integers(0, 500_000, n_l)],
            "click_id": np.arange(n_l),
        }
    )
    seen = set()
    rows = []
    for i in range(n_r * 2):
        k = int(rng.integers(0, 6))
        s = int(rng.integers(0, 500_000))
        if (k, s) in seen:
            continue
        seen.add((k, s))
        rows.append((k, base + dt.timedelta(seconds=s), 1000 + i))
        if len(rows) == n_r:
            break
    rpd = pd.DataFrame(rows, columns=["user_id", "ts", "purchase_id"])

    left = spark.createDataFrame(lpd)
    right = spark.createDataFrame(rpd)
    for direction in ("backward", "forward", "nearest"):
        want_df = pd.merge_asof(
            lpd.sort_values("ts", kind="stable"),
            rpd.sort_values("ts", kind="stable"),
            on="ts",
            by="user_id",
            direction=direction,
        )
        want = {
            int(r.click_id): (None if pd.isna(r.purchase_id)
                              else int(r.purchase_id))
            for r in want_df.itertuples()
        }
        for bucket_us in (None, 3600 * 1_000_000):
            got = {
                r["click_id"]: r["asof_purchase_id"]
                for r in asof_join(
                    left, right, key="user_id", ts="ts",
                    right_attrs=("purchase_id",),
                    direction=direction, bucket_us=bucket_us,
                ).collect()
            }
            assert got == want, (direction, bucket_us)


def test_interval_join_left_and_keys(spark):
    """how="left" keeps unmatched left rows exactly once with NULL right
    columns; keys=... adds the equality to the JOIN condition (a hash
    key of (key, bucket)) so cross-key pairs never form."""
    left = spark.createDataFrame(
        [
            Row(uid=1, ts=_ts(15), click_id=1),   # inside user 1's window
            Row(uid=2, ts=_ts(15), click_id=2),   # same time, other user
            Row(uid=1, ts=_ts(45), click_id=3),   # outside any window
        ]
    )
    right = spark.createDataFrame(
        [Row(rid=9, r_uid=1, w_start=_ts(10), w_end=_ts(20))]
    )
    out = interval_join(
        left, right, left_ts="ts", right_start="w_start",
        right_end="w_end", bucket_us=600_000_000,
        keys=[("uid", "r_uid")], how="left",
    ).collect()
    by_click = {r.click_id: r for r in out}
    assert len(out) == 3
    assert by_click[1].rid == 9
    assert by_click[2].rid is None   # key mismatch -> NULL extension
    assert by_click[3].rid is None   # time mismatch -> NULL extension
    plan = interval_join(
        left, right, left_ts="ts", right_start="w_start",
        right_end="w_end", bucket_us=600_000_000,
        keys=[("uid", "r_uid")], how="left",
    )._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_interval_join_randomized_against_bruteforce(spark):
    """Differential test: bucketed interval join (inner and left, with
    keys) must equal the brute-force cross-join filter on random
    frames, across bucket widths that slice windows in every way."""
    import random

    rnd = random.Random(11)
    left_rows = [
        Row(uid=rnd.randint(0, 3), ts=_ts(rnd.randint(0, 59)), click_id=i)
        for i in range(60)
    ]
    right_rows = []
    for j in range(25):
        s = rnd.randint(0, 50)
        right_rows.append(
            Row(rid=100 + j, r_uid=rnd.randint(0, 3),
                w_start=_ts(s), w_end=_ts(s + rnd.randint(0, 12)))
        )
    left = spark.createDataFrame(left_rows)
    right = spark.createDataFrame(right_rows)
    want_inner = {
        (l.click_id, r.rid)
        for l in left_rows
        for r in right_rows
        if l.uid == r.r_uid and r.w_start <= l.ts <= r.w_end
    }
    matched = {c for c, _ in want_inner}
    want_left = want_inner | {
        (l.click_id, None) for l in left_rows if l.click_id not in matched
    }
    for bucket_us in (60_000_000, 5 * 60_000_000, 3_600_000_000):
        got_inner = {
            (r.click_id, r.rid)
            for r in interval_join(
                left, right, left_ts="ts", right_start="w_start",
                right_end="w_end", bucket_us=bucket_us,
                keys=[("uid", "r_uid")],
            ).collect()
        }
        assert got_inner == want_inner, bucket_us
        got_left = {
            (r.click_id, r.rid)
            for r in interval_join(
                left, right, left_ts="ts", right_start="w_start",
                right_end="w_end", bucket_us=bucket_us,
                keys=[("uid", "r_uid")], how="left",
            ).collect()
        }
        assert got_left == want_left, bucket_us


def test_temporal_joins_pre_1970_timestamps(spark):
    """Bucketing is floor division, not cast truncation: negative epoch
    values must land in the right buckets for both the as-of carry and
    the interval explode (a truncating division would shift pre-1970
    rows one bucket toward zero and silently drop matches)."""
    t0 = dt.datetime(1969, 12, 31, 22, 0)   # epoch-negative
    t1 = dt.datetime(1969, 12, 31, 23, 30)
    t2 = dt.datetime(1970, 1, 1, 0, 30)
    left = spark.createDataFrame(
        [Row(user_id=1, ts=t1, click_id=1), Row(user_id=1, ts=t2, click_id=2)]
    )
    right = spark.createDataFrame(
        [Row(user_id=1, ts=t0, purchase_id=10)]
    )
    for bucket_us in (3_600_000_000, 7_200_000_000):
        out = {
            r.click_id: r.asof_purchase_id
            for r in asof_join(
                left, right, key="user_id", ts="ts",
                right_attrs=("purchase_id",), bucket_us=bucket_us,
            ).collect()
        }
        assert out == {1: 10, 2: 10}, bucket_us
    iv = interval_join(
        left.select("ts", "click_id"),
        spark.createDataFrame(
            [Row(rid=9, w_start=t0, w_end=dt.datetime(1970, 1, 1, 1, 0))]
        ),
        left_ts="ts", right_start="w_start", right_end="w_end",
        bucket_us=3_600_000_000,
    ).collect()
    assert {r.click_id for r in iv} == {1, 2}


def test_asof_tolerance_and_exact_matches_vs_pandas(spark):
    """Differential test of the pandas-parity knobs: every combination
    of direction x tolerance x allow_exact_matches, plain and bucketed,
    against pandas.merge_asof on random frames (with deliberate exact
    ts collisions so allow_exact_matches actually bites)."""
    import numpy as np
    import pandas as pd

    rng = np.random.default_rng(23)
    base = dt.datetime(2024, 1, 1)
    secs_l = rng.integers(0, 40_000, 150)
    lpd = pd.DataFrame(
        {
            "user_id": rng.integers(0, 5, 150),
            "ts": [base + dt.timedelta(seconds=int(s)) for s in secs_l],
            "click_id": np.arange(150),
        }
    )
    seen, rows = set(), []
    i = 0
    while len(rows) < 80 and i < 400:
        i += 1
        k = int(rng.integers(0, 5))
        # half the right rows reuse LEFT timestamps -> exact collisions
        s = int(secs_l[rng.integers(0, 150)]) if i % 2 else int(
            rng.integers(0, 40_000)
        )
        if (k, s) in seen:
            continue
        seen.add((k, s))
        rows.append((k, base + dt.timedelta(seconds=s), 1000 + i))
    rpd = pd.DataFrame(rows, columns=["user_id", "ts", "purchase_id"])
    left = spark.createDataFrame(lpd)
    right = spark.createDataFrame(rpd)
    for direction in ("backward", "forward", "nearest"):
        for tol_s in (None, 900):
            for exact in (True, False):
                want_df = pd.merge_asof(
                    lpd.sort_values("ts", kind="stable"),
                    rpd.sort_values("ts", kind="stable"),
                    on="ts", by="user_id", direction=direction,
                    tolerance=(None if tol_s is None
                               else pd.Timedelta(seconds=tol_s)),
                    allow_exact_matches=exact,
                )
                want = {
                    int(r.click_id): (None if pd.isna(r.purchase_id)
                                      else int(r.purchase_id))
                    for r in want_df.itertuples()
                }
                for bucket_us in (None, 3600 * 1_000_000):
                    got = {
                        r["click_id"]: r["asof_purchase_id"]
                        for r in asof_join(
                            left, right, key="user_id", ts="ts",
                            right_attrs=("purchase_id",),
                            direction=direction, bucket_us=bucket_us,
                            tolerance_us=(None if tol_s is None
                                          else tol_s * 1_000_000),
                            allow_exact_matches=exact,
                        ).collect()
                    }
                    assert got == want, (direction, tol_s, exact, bucket_us)


def test_asof_multi_key_vs_pandas(spark):
    """Composite-key as-of (key=[a, b]): differential against
    pandas.merge_asof(by=[a, b]) for all three directions, plain and
    bucketed."""
    import numpy as np
    import pandas as pd

    rng = np.random.default_rng(31)
    base = dt.datetime(2024, 1, 1)
    lpd = pd.DataFrame(
        {
            "region": rng.integers(0, 3, 120),
            "device": rng.integers(0, 2, 120),
            "ts": [base + dt.timedelta(seconds=int(s))
                   for s in rng.integers(0, 90_000, 120)],
            "click_id": np.arange(120),
        }
    )
    seen, rows = set(), []
    for j in range(200):
        t = (int(rng.integers(0, 3)), int(rng.integers(0, 2)),
             int(rng.integers(0, 90_000)))
        if t in seen:
            continue
        seen.add(t)
        rows.append((t[0], t[1], base + dt.timedelta(seconds=t[2]),
                     1000 + j))
        if len(rows) == 60:
            break
    rpd = pd.DataFrame(rows, columns=["region", "device", "ts",
                                      "purchase_id"])
    left = spark.createDataFrame(lpd)
    right = spark.createDataFrame(rpd)
    for direction in ("backward", "forward", "nearest"):
        want_df = pd.merge_asof(
            lpd.sort_values("ts", kind="stable"),
            rpd.sort_values("ts", kind="stable"),
            on="ts", by=["region", "device"], direction=direction,
        )
        want = {
            int(r.click_id): (None if pd.isna(r.purchase_id)
                              else int(r.purchase_id))
            for r in want_df.itertuples()
        }
        for bucket_us in (None, 3600 * 1_000_000):
            got = {
                r["click_id"]: r["asof_purchase_id"]
                for r in asof_join(
                    left, right, key=["region", "device"], ts="ts",
                    right_attrs=("purchase_id",),
                    direction=direction, bucket_us=bucket_us,
                ).collect()
            }
            assert got == want, (direction, bucket_us)


def test_auto_bucket_us_heuristic(spark):
    from ds_jedai_spark.operators.temporal import auto_bucket_us

    # tiny frame: single-window form is fine
    small = spark.createDataFrame(
        [Row(user_id=1, ts=_ts(m)) for m in range(10)]
    )
    assert auto_bucket_us(small, "ts") is None

    # forced-small target: span 9 min / 10 rows * 4 target rows
    b = auto_bucket_us(small, "ts", target_rows=4)
    span_us = 9 * 60 * 1_000_000
    assert b == span_us * 4 // 10

    # degenerate: every row at one instant -> no usable span
    flat = spark.createDataFrame(
        [Row(user_id=i, ts=_ts(7)) for i in range(6)]
    )
    assert auto_bucket_us(flat, "ts", target_rows=2) is None


def test_asof_auto_matches_explicit_forms(frames, spark):
    from ds_jedai_spark.operators.temporal import auto_bucket_us

    left, right = frames
    want = sorted(
        map(tuple, asof_join(
            left, right, right_attrs=("purchase_id",)
        ).collect())
    )
    got = sorted(
        map(tuple, asof_join(
            left, right, right_attrs=("purchase_id",), bucket_us="auto"
        ).collect())
    )
    assert got == want

    # and with a forced bucketed route (monkey-free: call the heuristic
    # with a small target and pass its width explicitly)
    b = auto_bucket_us(right, "ts", target_rows=2)
    assert b is not None and b > 0
    got_b = sorted(
        map(tuple, asof_join(
            left, right, right_attrs=("purchase_id",), bucket_us=b
        ).collect())
    )
    assert got_b == want


def test_asof_rejects_unknown_bucket_string(frames):
    left, right = frames
    with pytest.raises(ValueError, match="bucket_us"):
        asof_join(left, right, bucket_us="yes")


def test_interval_join_auto_bucket(spark):
    """bucket_us='auto' (the default) derives the width from the p95
    right-side interval length and produces the same matches as any
    explicit width (the residual range predicate makes results
    width-invariant); non-'auto' strings raise."""
    from ds_jedai_spark.operators.temporal import auto_interval_bucket_us

    left = spark.createDataFrame(
        [Row(ts=_ts(m), click_id=m) for m in range(0, 59, 3)]
    )
    # 18 ten-minute windows and 2 ~55-minute outliers: p95 sits at the
    # short-window scale, so the tail pays len/width rows and the bulk
    # explodes to ~2 rows each
    right = spark.createDataFrame(
        [Row(error_id=i, w_start=_ts(i * 3), w_end=_ts(i * 3 + 10))
         for i in range(16)]
        + [Row(error_id=100, w_start=_ts(0), w_end=_ts(55)),
           Row(error_id=101, w_start=_ts(2), w_end=_ts(58))]
    )
    width = auto_interval_bucket_us(right)
    assert 300_000_000 <= width <= 3_600_000_000  # ~10 min scale, not 55
    auto_rows = sorted(
        (r["click_id"], r["error_id"])
        for r in interval_join(
            left, right, left_ts="ts",
            right_start="w_start", right_end="w_end",
        ).collect()
    )
    explicit_rows = sorted(
        (r["click_id"], r["error_id"])
        for r in interval_join(
            left, right, left_ts="ts",
            right_start="w_start", right_end="w_end",
            bucket_us=123_456_789,
        ).collect()
    )
    assert auto_rows == explicit_rows and auto_rows

    with pytest.raises(ValueError, match="int or 'auto'"):
        interval_join(
            left, right, left_ts="ts",
            right_start="w_start", right_end="w_end", bucket_us="none",
        )

    # degenerate right side: falls back instead of dividing by zero
    empty = right.where("error_id < 0")
    assert auto_interval_bucket_us(empty) == 300_000_000
