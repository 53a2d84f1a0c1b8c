"""Exact-kNN join: correctness on a straggler-heavy (isolated points)
fixture and the per-round tile-coarsening bound — the final round must
not explode (2*rmax/theta)^2 tiles per unresolved source."""

import math

from pyspark.sql import Row, functions as F

from ds_jedai_spark.model.tiles import with_tiles
from ds_jedai_spark.operators.spatial_join import (
    KNN_TILES_PER_SIDE,
    _round_theta,
    knn_join_exact,
)


def _points(spark, coords):
    return spark.createDataFrame(
        [
            Row(id=i, minx=float(x), miny=float(y),
                maxx=float(x), maxy=float(y))
            for i, (x, y) in enumerate(coords)
        ]
    )


def _brute_knn(coords, k):
    want = {}
    for i, (x, y) in enumerate(coords):
        d = sorted(
            ((x - a) ** 2 + (y - b) ** 2, j)
            for j, (a, b) in enumerate(coords)
            if j != i
        )
        want[i] = {j for _, j in d[:k]}
    return want


def test_knn_exact_isolated_points(spark):
    """Every source is a straggler: pairwise distances >> r0, so nothing
    resolves before the final round — the exact case the fixed-theta
    final round made pathological. Results must still be the true kNN."""
    coords = [(i * 97.0, (i * i % 7) * 91.0) for i in range(12)]
    pts = _points(spark, coords)
    out = knn_join_exact(pts, pts, k=2, theta=(1.0, 1.0), rmax=2048.0, self_join=True)
    got = {}
    for row in out.collect():
        got.setdefault(row.s_id, set()).add(row.t_id)
    assert got == _brute_knn(coords, 2)


def test_knn_final_round_tiles_bounded(spark):
    """Exploded-row count of a final-round re-tile stays O(sources):
    with theta coarsening, each expanded envelope covers at most
    ~(KNN_TILES_PER_SIDE + 1)^2 tiles regardless of rmax."""
    rmax = 2048.0
    coords = [(i * 97.0, 0.0) for i in range(10)]
    pts = _points(spark, coords)
    expanded = pts.select(
        "id",
        (F.col("minx") - rmax).alias("minx"),
        (F.col("miny") - rmax).alias("miny"),
        (F.col("maxx") + rmax).alias("maxx"),
        (F.col("maxy") + rmax).alias("maxy"),
    )
    fine = (1.0, 1.0)
    coarse = _round_theta(fine, rmax)
    n = pts.count()
    bound = n * (math.ceil(KNN_TILES_PER_SIDE) + 2) ** 2
    exploded = with_tiles(expanded, coarse).count()
    assert exploded <= bound, (exploded, bound)
    # sanity: the uncoarsened theta would have been 4M+ tiles per row
    assert (2 * rmax / fine[0]) ** 2 > 1_000_000


def test_round_theta_passthrough_and_floor(spark):
    assert _round_theta(None, 256.0) is None
    tx, ty = _round_theta((1.0, 1.0), 256.0)
    assert tx == ty == 2 * 256.0 / KNN_TILES_PER_SIDE
    # small radii keep the caller's finer granularity
    assert _round_theta((1.0, 1.0), 1.0) == (1.0, 1.0)

def test_knn_cross_dataset_keeps_same_id_pairs(spark):
    """Two independent datasets with overlapping id spaces: a same-id
    target that IS the nearest neighbor must stay in (the s_id != t_id
    exclusion is a self-join convention, opt-in via self_join=True —
    ADVICE r12). Source id 0 sits exactly on target id 0."""
    src = _points(spark, [(0.0, 0.0), (100.0, 0.0)])
    tgt = _points(spark, [(0.0, 0.0), (0.5, 0.0), (100.0, 0.25)])
    out = knn_join_exact(src, tgt, k=1, theta=(1.0, 1.0), rmax=512.0)
    got = {r.s_id: (r.t_id, r.dist2) for r in out.collect()}
    assert got == {0: (0, 0.0), 1: (2, 0.0625)}
    # the self-join convention still excludes the identity pair
    self_out = knn_join_exact(
        src, src, k=1, theta=(1.0, 1.0), rmax=512.0, self_join=True
    )
    got_self = {r.s_id: r.t_id for r in self_out.collect()}
    assert got_self == {0: 1, 1: 0}
