"""Checkpoint helper for ITERATIVE DataFrame algorithms.

Spark's ``Dataset.localCheckpoint`` truncates the LINEAGE but seeds the
resulting LogicalRDD with the origin plan's ESTIMATED statistics. In an
iterative algorithm whose round joins a frame with itself (label
propagation, semi-naive transitive closure), the next round's estimate
multiplies two copies of the inherited estimate — so sizeInBytes
roughly SQUARES every round. The statistic is an unbounded BigInteger:
measured on this engine's connected-components loop (sf0.1, 15k nodes,
206k edges), its decimal digits double per round (26 -> 65 -> 141 ->
... -> 2439 by round 6), and from round ~16 the driver stalls inside
``SizeInBytesOnlyStatsPlanVisitor`` multiplying million-digit numbers
via Karatsuba/Toom-Cook — wall-clock DOUBLES per round (0.9s at round
15, 280s at round 22) with ZERO jobs running (statusTracker shows no
active stages; jstack shows BigInteger.multiply under
Dataset.checkpoint). Persisting instead of checkpointing does not help:
the logical plan then grows by one round per iteration and analysis +
cache-lookup costs take over.

``fresh_stats_checkpoint`` is the fix: localCheckpoint (materialize +
truncate) and then REBUILD the DataFrame from the materialized
InternalRow RDD via ``internalCreateDataFrame`` — the rebuilt
LogicalRDD carries the session default sizeInBytes
(spark.sql.defaultSizeInBytes = Long.MaxValue) instead of the inherited
estimate, so round cost stays FLAT no matter how many rounds run. The
default also means frames pinned this way are never auto-broadcast —
irrelevant for propagation loops (the label frame joins shuffle-side
anyway, and the huge inherited estimates prevented broadcast too).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def fresh_stats_checkpoint(df: DataFrame) -> DataFrame:
    """Eager localCheckpoint whose result does NOT inherit the origin
    plan's estimated statistics (see module docstring). JVM-only: the
    rebuild re-wraps the already-materialized InternalRow RDD; no data
    moves, no Python roundtrip.

    Leans on py4j-visible Spark internals (``internalCreateDataFrame``,
    the classic-mode DataFrame constructor) that are stable across
    pyspark 4.x classic sessions but are NOT public API — the guards
    below turn a pyspark upgrade or a connect-mode session into a
    diagnosable error instead of an AttributeError deep inside an
    iteration loop. The graceful fallback is plain localCheckpoint:
    correct, just exposed to the stats-squaring stall past ~16 rounds."""
    ck = df.localCheckpoint()
    try:
        # connect-mode DataFrames have no _jdf; classic module layout
        # is pyspark>=4.0 (pyspark.sql.classic) — probe both up front
        from pyspark.sql.classic.dataframe import DataFrame as _CDF

        jdf = ck._jdf
        jspark = df.sparkSession._jsparkSession
        fresh = jspark.internalCreateDataFrame(
            jdf.queryExecution().toRdd(), jdf.schema(), False
        )
        return _CDF(fresh, df.sparkSession)
    except (ImportError, AttributeError) as exc:  # pragma: no cover
        import warnings

        warnings.warn(
            "fresh_stats_checkpoint: pyspark internals moved "
            f"({exc!r}; supported: pyspark 4.x classic sessions) — "
            "falling back to plain localCheckpoint; iterative loops "
            "beyond ~16 rounds may hit the Catalyst stats-squaring "
            "driver stall documented in ds_jedai_spark/iterative.py",
            RuntimeWarning,
            stacklevel=2,
        )
        return ck
