"""Declarative data-validation (expectation checks) over any frame.

A 100 TB training-data pipeline runs validation as a first-class stage:
before documents reach dedup/packing, an expectations pass counts how
many rows violate each contract (nullability, ranges, domains, regex
shape, cross-column invariants) so a bad upstream delivery is caught as
a number, not as a downstream mystery. This is the Great-Expectations /
Deequ idea reduced to its Spark-native core: each rule is ONE SQL
boolean expression, the whole rule set evaluates in ONE aggregate pass
over the data (a single scan, partial/final aggregation, no shuffle of
data rows — only the 1-row aggregate moves), and the result is exact
integer counts that any engine reproduces bit-for-bit.

NULL semantics: a rule counts a row as PASSING only when its predicate
evaluates to TRUE; NULL (unknown) counts as a violation — the
conservative reading a data contract wants (``email rlike '...'`` must
flag NULL emails, not skip them). That is ``when(pred, 0).otherwise(1)``,
not ``NOT pred`` (whose NULL would vanish from a sum).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def _violation_aggs(rules: dict[str, str]) -> list:
    if not rules:
        raise ValueError("rules must name at least one predicate")
    aggs = [F.count(F.lit(1)).alias("total")]
    for name, pred in rules.items():
        aggs.append(
            F.sum(
                F.when(F.expr(pred), F.lit(0)).otherwise(F.lit(1))
            ).cast("long").alias(name)
        )
    return aggs


def validate_wide(df: DataFrame, rules: dict[str, str]) -> DataFrame:
    """One-row frame: ``total`` plus one violation-count column per
    rule name. One aggregate pass regardless of rule count."""
    return df.agg(*_violation_aggs(rules))


def validate(df: DataFrame, rules: dict[str, str]) -> DataFrame:
    """(rule, violations, total) — one row per rule, computed from the
    same single aggregate pass as :func:`validate_wide` (the unpivot is
    a ``stack`` over the 1-row aggregate, not a second scan)."""
    wide = validate_wide(df, rules)
    pairs = ", ".join(f"'{name}', {name}" for name in rules)
    return wide.select(
        F.expr(f"stack({len(rules)}, {pairs}) AS (rule, violations)"),
        "total",
    )


def profile(df: DataFrame, cols: list[str] | None = None) -> DataFrame:
    """Per-column profile — (column, n, nulls, n_distinct, min_str,
    max_str) — the discovery companion to :func:`validate` (profile
    first, then freeze what you learned into rules).

    One aggregate pass; the N countDistinct aggregates expand the scan
    N-way (Spark's distinct-aggregate rewrite), so profile the columns
    you care about rather than a 500-column frame wholesale. min/max
    are reported as strings for schema uniformity across column types
    (numeric ordering happens BEFORE the cast — these are the true
    extrema, rendered)."""
    names = cols if cols is not None else df.columns
    if not names:
        raise ValueError("profile needs at least one column")
    aggs = [F.count(F.lit(1)).alias("total")]
    for i, c in enumerate(names):
        aggs += [
            F.sum(F.col(c).isNull().cast("long")).alias(f"nu{i}"),
            F.countDistinct(F.col(c)).alias(f"nd{i}"),
            F.min(F.col(c)).cast("string").alias(f"mn{i}"),
            F.max(F.col(c)).cast("string").alias(f"mx{i}"),
        ]
    wide = df.agg(*aggs)
    parts = ", ".join(
        f"'{c}', nu{i}, nd{i}, mn{i}, mx{i}" for i, c in enumerate(names)
    )
    return wide.select(
        F.expr(
            f"stack({len(names)}, {parts}) AS "
            "(column, nulls, n_distinct, min_str, max_str)"
        ),
        F.col("total").alias("n"),
    ).select("column", "n", "nulls", "n_distinct", "min_str", "max_str")


def validate_sql(from_sql: str, rules: dict[str, str]) -> str:
    """DuckDB twin of :func:`validate_wide` over ``FROM (from_sql)`` —
    shares every predicate string verbatim."""
    if not rules:
        raise ValueError("rules must name at least one predicate")
    cols = ["count(*) AS total"]
    for name, pred in rules.items():
        cols.append(
            f"CAST(sum(CASE WHEN ({pred}) THEN 0 ELSE 1 END) AS BIGINT)"
            f" AS {name}"
        )
    return f"SELECT {', '.join(cols)} FROM ({from_sql})"
