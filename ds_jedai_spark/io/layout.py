"""Z-order (Morton) spatial parquet layout — the scan-pruning lever.

At 100 TB the cheapest query is the one that never reads the bytes: a
parquet scan prunes files and row groups whose column min/max footer
statistics cannot satisfy the filter, so the LAYOUT of rows across
files decides how much of a bounding-box query is I/O and how much is
skipped. A naturally-ordered write gives every file near-global x/y
extents (nothing prunes); sorting by an interleaved Morton key gives
every file a tight x AND y extent simultaneously, so a small bbox
touches a handful of files. This is the same idea as Delta/Iceberg's
``OPTIMIZE ZORDER BY`` (public: the Morton curve, Morton 1966; z-value
indexing, Orenstein & Merrett 1984) re-expressed as plain DataFrame
operations over open parquet:

    repartitionByRange(z) . sortWithinPartitions(z) . write.parquet

The Morton key reuses the geohash module's closed-form bit-interleave
(pure whole-stage-codegen arithmetic, no UDF); ``repartitionByRange``
samples the key distribution, so files stay balanced by ROW COUNT even
under heavy spatial skew — hot regions get many small-extent files,
empty regions share one file, and no executor sorts more than one
partition's rows.

The reference engine has no persisted-layout surface at all (it
re-reads raw CSV/WKT per run); this module is beyond-reference scale
engineering alongside io/bucketed.py (bucketing co-locates a JOIN;
z-order localizes a SCAN — complementary, composable).

``scan_stats``/``pruned_fraction`` read ONLY parquet footers
(O(files) driver work, no data I/O) and report what a bbox filter
would touch — the measurement tool behind the probe script and tests.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, functions as F

from ds_jedai_spark.operators.geohash import _cell_sql, _interleave_sql, _nbits

ZKEY = "__zkey"


def morton_key_sql(
    x: str,
    y: str,
    precision: int = 8,
    bounds: tuple[float, float, float, float] = (-180.0, -90.0, 180.0, 90.0),
) -> str:
    """The Morton (z-order) integer of (x, y) on a ``precision``-deep
    base-32 bisection of ``bounds`` as one closed-form SQL expression —
    the geohash integer generalized to any rectangular domain.
    Out-of-bounds coordinates clamp into the edge cells (ordering, not
    validation, is the contract here). Exact IEEE-double arithmetic for
    precision <= 10 (50 bits)."""
    minx, miny, maxx, maxy = (float(v) for v in bounds)
    if not (maxx > minx and maxy > miny):
        raise ValueError(f"degenerate bounds {bounds!r}")
    _, nx, ny = _nbits(precision)
    return _interleave_sql(
        _cell_sql(x, -minx, maxx - minx, nx),
        _cell_sql(y, -miny, maxy - miny, ny),
        precision,
    )


def zorder_frame(
    df: DataFrame,
    x_col: str = "x",
    y_col: str = "y",
    precision: int = 8,
    bounds: tuple[float, float, float, float] = (-180.0, -90.0, 180.0, 90.0),
    files: int | None = None,
) -> DataFrame:
    """The z-ordered frame: range-partitioned and partition-sorted by
    the Morton key, key column dropped (the x/y parquet statistics are
    what pruning reads; the key is layout scaffolding). ``files``
    bounds the output file count (default: spark.sql.shuffle.partitions
    — on a real cluster set it so files land near the 128 MB-1 GB
    sweet spot)."""
    from ds_jedai_spark.operators.ranking import shuffle_parts

    n = shuffle_parts(df) if files is None else int(files)
    if n < 1:
        raise ValueError(f"files must be >= 1, got {n}")
    keyed = df.withColumn(
        ZKEY, F.expr(morton_key_sql(x_col, y_col, precision, bounds))
    )
    return (
        keyed.repartitionByRange(n, ZKEY)
        .sortWithinPartitions(ZKEY)
        .drop(ZKEY)
    )


def write_zordered(
    df: DataFrame,
    path: str,
    x_col: str = "x",
    y_col: str = "y",
    precision: int = 8,
    bounds: tuple[float, float, float, float] = (-180.0, -90.0, 180.0, 90.0),
    files: int | None = None,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` to ``path`` as z-ordered parquet (see module doc)."""
    zorder_frame(df, x_col, y_col, precision, bounds, files).write.mode(
        mode
    ).parquet(path)


# ------------------------------------------------- footer-only metrics


def scan_stats(path: str, x_col: str, y_col: str) -> list[dict]:
    """Per-row-group (file, rows, x/y min/max) from parquet FOOTERS only
    — O(row groups) driver-side metadata reads, zero data I/O. The
    ground truth of what a min/max-pruning scan can skip."""
    import pyarrow.parquet as pq

    out = []
    names = sorted(
        f for f in os.listdir(path)
        if f.endswith(".parquet") and not f.startswith(("_", "."))
    )
    for fname in names:
        pf = pq.ParquetFile(os.path.join(path, fname))
        idx = {c: i for i, c in enumerate(pf.schema_arrow.names)}
        for g in range(pf.metadata.num_row_groups):
            rg = pf.metadata.row_group(g)
            sx = rg.column(idx[x_col]).statistics
            sy = rg.column(idx[y_col]).statistics
            out.append({
                "file": fname,
                "rows": rg.num_rows,
                "minx": sx.min, "maxx": sx.max,
                "miny": sy.min, "maxy": sy.max,
            })
    return out


def pruned_fraction(
    stats: list[dict], bbox: tuple[float, float, float, float]
) -> dict:
    """What a (minx, miny, maxx, maxy) bbox filter touches under
    row-group min/max pruning: touched/total row groups and rows."""
    minx, miny, maxx, maxy = bbox
    touched = [
        s for s in stats
        if s["maxx"] >= minx and s["minx"] <= maxx
        and s["maxy"] >= miny and s["miny"] <= maxy
    ]
    total_rows = sum(s["rows"] for s in stats) or 1
    return {
        "groups": len(stats),
        "groups_touched": len(touched),
        "rows_touched": sum(s["rows"] for s in touched),
        "rows_fraction": sum(s["rows"] for s in touched) / total_rows,
    }
