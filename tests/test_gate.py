"""Driver-gate invariants: the round driver only checks the FIRST 50
queries() entries, so the composite surface must stay under the cap and
must not silently drop any per-operator check."""

import __spark_entry__ as entry
from ds_jedai_spark.plans import gate
from ds_jedai_spark.plans import pipeline_plans as pl


def test_gate_under_driver_cap():
    qs = entry.queries()
    assert len(qs) <= 50, "driver ignores entries past 50"
    assert list(qs) == list(gate.QUERIES)


def test_every_query_has_oracle():
    qs, os_ = entry.queries(), entry.oracle_sql()
    assert set(qs) == set(os_)
    assert all(isinstance(s, str) and s.strip() for s in os_.values())


def test_gate_composites_cover_all_pipeline_queries():
    """Every pipeline_plans query must be reachable from the gate —
    either kept under its own name or folded into a composite's parts
    (the composite oracles embed the per-operator oracle SQL)."""
    gate_sql = " ".join(gate.ORACLES.values())
    for name, sql in pl.ORACLES.items():
        probe = sql.strip().rstrip(";").strip()
        assert name in gate.QUERIES or probe in gate_sql, (
            f"{name} not in gate and its oracle not embedded in any composite"
        )


def test_tagged_union_and_wide_join_column_agreement(spark):
    """Combinator self-check on a live example: Spark columns match the
    oracle projection for one union and one wide join."""
    import duckdb

    con = duckdb.connect()
    for t in (
        "region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents", "embeddings",
    ):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('/root/testdata/sf0.001/{t}.parquet')"
        )
    for name in ("line_relate_counts", "eval_stats"):
        sdf = gate.QUERIES[name](spark, "/root/testdata/sf0.001")
        ocols = [d[0] for d in con.execute(gate.ORACLES[name]).description]
        assert sorted(sdf.columns) == sorted(ocols)


def test_every_composite_column_aligns_with_its_oracle(spark):
    """Column-name alignment across ALL gate composites at sf0.001: the
    driver's compare sorts columns by name before hashing, so an alias
    drifting on either side fails the hash even with identical values —
    this is the most common way a green composite silently turns red.
    Catch it at test time, not at round time.

    Full-tier only (r18): executing all 50 oracle SQLs + building all
    50 Spark plans (their eager pins included) is ~3.5 min, and
    scripts/check_correctness.py verifies the identical alignment
    (schema_match) on every run of the gate. The default profile keeps
    the two-composite live check above."""
    import pytest

    from conftest import FULL_SUITE

    if not FULL_SUITE:
        pytest.skip("oracle-gate duplicate; DSJ_FULL_SUITE=1 restores")
    import duckdb

    con = duckdb.connect()
    for t in (
        "region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents", "embeddings",
    ):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('/root/testdata/sf0.001/{t}.parquet')"
        )
    mismatches = []
    for name, fn in gate.QUERIES.items():
        scols = sorted(fn(spark, "/root/testdata/sf0.001").columns)
        ocols = sorted(
            d[0] for d in con.execute(gate.ORACLES[name]).description
        )
        if scols != ocols:
            mismatches.append((name, scols, ocols))
    assert not mismatches, mismatches
