"""Distributed convex hull of a point dataset.

Beyond the reference's surface (DS-JedAI has no hull operator), but a
core spatial-engine primitive: the hull is the extent summary used for
partitioner seeding, footprint reporting, and coverage checks.

Spark-first two-phase shape (the classic decomposable-aggregate
pattern): phase 1 reduces EVERY partition to its local hull corners
with Andrew's monotone chain (1979 — the textbook O(n log n) scan)
inside one mapInArrow pass, so the shuffle carries only O(h) corner
rows per partition (h = local hull size, typically tens); phase 2
re-runs the same chain over the union of local corners in a single
task. Convexity makes this exact: the global hull's corners are corners
of every subset containing them, so no phase-1 reduction can lose one.
This is the (b) tier of the engine's operator policy — a genuinely
imperative algorithm Spark's built-ins can't express, kept off the
driver (both phases are executor tasks; the result is a DataFrame).

Corner semantics: STRICT turns — collinear points interior to a hull
edge are not corners (matching the closed-form SQL oracle's
corner test in hull_sql; both sides compute exact cross/dot products on
1/16-lattice doubles, so there is no epsilon anywhere).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def _chain(xs, ys):
    """Andrew's monotone chain over numpy arrays -> (hx, hy) corner
    arrays in CCW order starting at the lexicographic minimum. Strict
    turns: cross <= 0 pops, so edge-interior collinear points drop."""
    import numpy as np

    pts = np.unique(np.column_stack([xs, ys]), axis=0)  # sorts lexicographically
    n = len(pts)
    if n <= 2:
        return pts[:, 0], pts[:, 1]

    def half(p):
        out = []
        for i in range(len(p)):
            while len(out) >= 2:
                ox, oy = p[out[-2]]
                ax, ay = p[out[-1]]
                bx, by = p[i]
                if (ax - ox) * (by - oy) - (ay - oy) * (bx - ox) <= 0:
                    out.pop()
                else:
                    break
            out.append(i)
        return out

    lower = half(pts)
    upper = half(pts[::-1])
    idx = lower[:-1] + [n - 1 - i for i in upper[:-1]]
    h = pts[idx]
    return h[:, 0], h[:, 1]


def convex_hull(df: DataFrame, by: str | None = None) -> DataFrame:
    """Hull corners of the (minx, miny) point set as (rank, x, y) with
    rank = 1-based position in lexicographic (x, y) order. Duplicates
    are deduped; fewer than 3 distinct points return them all.

    ``by`` (r17) computes one hull PER GROUP — the natural composition
    with dbscan (cluster -> footprint): phase 1 reduces each partition
    to its per-key local hull corners (one sort + chain per key inside
    mapInArrow — no shuffle), phase 2 shuffles only those O(h) corners
    by key and re-chains per key in applyInPandas (one task per key
    group, executor-side). Output (by, rank, x, y), rank 1-based
    lexicographic within the group. NULL group keys are not supported
    (they don't order) — filter or fill them first; dbscan labels,
    the natural input, are never null."""
    import pyarrow as pa

    def local(batches):
        import numpy as np

        xs, ys = [], []
        for b in batches:
            xs.append(b.column("x").to_numpy(zero_copy_only=False))
            ys.append(b.column("y").to_numpy(zero_copy_only=False))
        if xs:
            hx, hy = _chain(np.concatenate(xs), np.concatenate(ys))
            yield pa.RecordBatch.from_arrays(
                [pa.array(hx, pa.float64()), pa.array(hy, pa.float64())],
                names=["x", "y"],
            )

    if by is None:
        pts = df.select(F.col("minx").alias("x"),
                        F.col("miny").alias("y"))
        local_hulls = pts.mapInArrow(local, "x double, y double")
        corners = local_hulls.repartition(1).mapInArrow(
            local, "x double, y double"
        )
        from pyspark.sql import Window

        w = Window.orderBy("x", "y")
        return corners.select(
            F.row_number().over(w).cast("long").alias("rank"), "x", "y"
        )

    ktype = df.schema[by].dataType.simpleString()
    pts = df.select(F.col(by).alias("k"), F.col("minx").alias("x"),
                    F.col("miny").alias("y"))

    def local_keyed(batches):
        import numpy as np

        ks, xs, ys = [], [], []
        ktyp = None
        for b in batches:
            if ktyp is None:
                ktyp = b.schema.field("k").type
            ks.append(b.column("k").to_numpy(zero_copy_only=False))
            xs.append(b.column("x").to_numpy(zero_copy_only=False))
            ys.append(b.column("y").to_numpy(zero_copy_only=False))
        if not ks:
            return
        k = np.concatenate(ks)
        x = np.concatenate(xs)
        y = np.concatenate(ys)
        order = np.argsort(k, kind="stable")
        k, x, y = k[order], x[order], y[order]
        starts = np.nonzero(
            np.concatenate([[True], k[1:] != k[:-1]])
        )[0]
        ends = np.append(starts[1:], len(k))
        out_k, out_x, out_y = [], [], []
        for s, e in zip(starts, ends):
            hx, hy = _chain(x[s:e], y[s:e])
            out_k.extend([k[s]] * len(hx))
            out_x.append(hx)
            out_y.append(hy)
        yield pa.RecordBatch.from_arrays(
            [pa.array(out_k, ktyp),
             pa.array(np.concatenate(out_x), pa.float64()),
             pa.array(np.concatenate(out_y), pa.float64())],
            names=["k", "x", "y"],
        )

    local_hulls = pts.mapInArrow(
        local_keyed, f"k {ktype}, x double, y double"
    )

    def final(pdf):
        import numpy as np
        import pandas as pd

        hx, hy = _chain(pdf["x"].to_numpy(), pdf["y"].to_numpy())
        order = np.lexsort((hy, hx))
        return pd.DataFrame({
            "k": [pdf["k"].iloc[0]] * len(hx),
            "rank": np.arange(1, len(hx) + 1, dtype=np.int64),
            "x": np.asarray(hx)[order],
            "y": np.asarray(hy)[order],
        })

    out = local_hulls.groupBy("k").applyInPandas(
        final, f"k {ktype}, rank long, x double, y double"
    )
    return out.withColumnRenamed("k", by)


def hull_sql(points_sql: str) -> str:
    """Closed-form ANSI-SQL hull-corner test (the DuckDB oracle): p is a
    corner iff SOME other point b makes every remaining q either
    strictly left of ray p->b, or collinear strictly between p and b —
    true exactly for b = the next corner CCW, false for every b when p
    is interior or edge-interior collinear. O(n^3) — oracle-scale only,
    which is exactly why the distributed path exists."""
    return f"""
WITH pts0 AS ({points_sql}),
pts AS (SELECT DISTINCT minx AS x, miny AS y FROM pts0),
corner AS (
  SELECT DISTINCT p.x, p.y FROM pts p JOIN pts b
    ON NOT (b.x = p.x AND b.y = p.y)
  WHERE NOT EXISTS (
    SELECT 1 FROM pts q
    WHERE NOT (q.x = p.x AND q.y = p.y)
      AND NOT (q.x = b.x AND q.y = b.y)
      AND NOT (
        (b.x - p.x) * (q.y - p.y) - (b.y - p.y) * (q.x - p.x) > 0
        OR (
          (b.x - p.x) * (q.y - p.y) - (b.y - p.y) * (q.x - p.x) = 0
          AND (q.x - p.x) * (b.x - p.x) + (q.y - p.y) * (b.y - p.y) > 0
          AND (q.x - p.x) * (b.x - p.x) + (q.y - p.y) * (b.y - p.y)
              < (b.x - p.x) * (b.x - p.x) + (b.y - p.y) * (b.y - p.y)
        )
      )
  )
)
SELECT CAST(row_number() OVER (ORDER BY x, y) AS BIGINT) AS rank, x, y
FROM corner
"""


def hull_by_sql(points_sql: str, key: str) -> str:
    """Per-group closed-form hull-corner oracle: the hull_sql corner
    test restricted to points sharing ``key``, plus the 1-distinct-point
    groups the pairwise test cannot see (a lone point has no b — the
    operator returns it; so does this). 2-point groups fall out of the
    pairwise test itself (every q-set is empty, both points corners).
    O(n^3) within each group — oracle-scale only."""
    return f"""
WITH pts0 AS ({points_sql}),
pts AS (SELECT DISTINCT {key} AS g, minx AS x, miny AS y FROM pts0),
corner AS (
  SELECT DISTINCT p.g, p.x, p.y FROM pts p JOIN pts b
    ON b.g = p.g AND NOT (b.x = p.x AND b.y = p.y)
  WHERE NOT EXISTS (
    SELECT 1 FROM pts q
    WHERE q.g = p.g
      AND NOT (q.x = p.x AND q.y = p.y)
      AND NOT (q.x = b.x AND q.y = b.y)
      AND NOT (
        (b.x - p.x) * (q.y - p.y) - (b.y - p.y) * (q.x - p.x) > 0
        OR (
          (b.x - p.x) * (q.y - p.y) - (b.y - p.y) * (q.x - p.x) = 0
          AND (q.x - p.x) * (b.x - p.x) + (q.y - p.y) * (b.y - p.y) > 0
          AND (q.x - p.x) * (b.x - p.x) + (q.y - p.y) * (b.y - p.y)
              < (b.x - p.x) * (b.x - p.x) + (b.y - p.y) * (b.y - p.y)
        )
      )
  )
),
singles AS (
  SELECT g, min(x) AS x, min(y) AS y FROM pts
  GROUP BY g HAVING count(*) = 1
),
allc AS (
  SELECT g, x, y FROM corner UNION ALL SELECT g, x, y FROM singles
)
SELECT g, CAST(row_number() OVER (PARTITION BY g ORDER BY x, y)
               AS BIGINT) AS rank, x, y
FROM allc
"""
