"""Metamorphic equivalence over the NON-CONVEX geometry space: the tile
join followed by the exact general verifier must produce the identical
relation results as the brute-force cross join — the reference's
IntersectionMatrixTest pattern (src/test/scala/IntersectionMatrixTest.
scala:29-38: optimized verification == plain geometry.relate for every
pair) run over a generated corpus of donuts, concave C-shapes,
multipolygons, lines, points and rects whose envelopes overlap freely.

This complements the fixed-truth hole gate (fixtures/wkt_holes_*.tsv):
the gate proves absolute correctness on constructed cases; this test
proves the OPTIMIZED PLAN (tile explode, hash join, reference-point
dedup across multi-tile envelopes) loses or duplicates nothing relative
to the naive plan on a denser, overlapping corpus.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ds_jedai_spark.model.geometry import valid_geometries, with_parsed_geometry
from ds_jedai_spark.model.tiles import compute_theta
from ds_jedai_spark.operators.relate_general import with_general_relations
from ds_jedai_spark.operators.spatial_join import brute_force_join, tile_join

RELS = ("intersects", "contains", "within", "covers", "coveredby",
        "equals", "touches", "overlaps", "crosses", "disjoint")


def _wkts(n, kind_shift):
    """Deterministic mixed corpus on a 40x40 area with heavy overlap:
    donuts, concave Cs, two-part multipolygons, rects, lines, points."""
    rows = []
    for i in range(n):
        k = (i + kind_shift) % 6
        x = (i * 7) % 40
        y = (i * 11) % 40
        if k == 0:  # donut
            w = 6 + (i % 5)
            rows.append(
                f"POLYGON (({x} {y}, {x + w} {y}, {x + w} {y + w}, "
                f"{x} {y + w}, {x} {y}), "
                f"({x + 2} {y + 2}, {x + w - 2} {y + 2}, "
                f"{x + w - 2} {y + w - 2}, {x + 2} {y + w - 2}, "
                f"{x + 2} {y + 2}))"
            )
        elif k == 1:  # concave C (opens right)
            rows.append(
                f"POLYGON (({x} {y}, {x + 6} {y}, {x + 6} {y + 2}, "
                f"{x + 2} {y + 2}, {x + 2} {y + 4}, {x + 6} {y + 4}, "
                f"{x + 6} {y + 6}, {x} {y + 6}, {x} {y}))"
            )
        elif k == 2:  # two-part multipolygon
            rows.append(
                f"MULTIPOLYGON ((({x} {y}, {x + 3} {y}, {x + 3} {y + 3}, "
                f"{x} {y + 3}, {x} {y})), "
                f"(({x + 5} {y}, {x + 8} {y}, {x + 8} {y + 3}, "
                f"{x + 5} {y + 3}, {x + 5} {y})))"
            )
        elif k == 3:  # rect
            rows.append(
                f"POLYGON (({x} {y}, {x + 4} {y}, {x + 4} {y + 5}, "
                f"{x} {y + 5}, {x} {y}))"
            )
        elif k == 4:  # line
            rows.append(f"LINESTRING ({x} {y}, {x + 9} {y + 4})")
        else:  # point
            rows.append(f"POINT ({x + 1} {y + 1})")
    return rows


def _frame(spark, n, kind_shift):
    df = spark.createDataFrame(
        list(enumerate(_wkts(n, kind_shift))), "id long, wkt string"
    )
    # Pinned: the brute-force crossJoin below plans as a
    # CartesianProduct whose task pairs re-execute both sides' parse
    # subtrees, and _rel_rows evaluates each candidate frame twice
    # (agg + pair collect) — pinning the 48-row inputs keeps this a
    # seconds-scale test without changing what it proves.
    return valid_geometries(
        with_parsed_geometry(df, "wkt")
    ).drop("wkt").localCheckpoint()


def _rel_rows(cand):
    v = with_general_relations(cand)
    agg = v.groupBy().agg(
        F.count(F.lit(1)).alias("verifications"),
        *[F.count(F.when(F.col(f"r_{r}"), True)).alias(f"n_{r}")
          for r in RELS],
    )
    pairs = {
        (r["s_id"], r["t_id"])
        for r in v.where("r_intersects").select("s_id", "t_id").collect()
    }
    return agg.first().asDict(), pairs


def test_tile_join_equals_brute_force_on_nonconvex_corpus(spark):
    src = _frame(spark, 48, 0)
    tgt = _frame(spark, 48, 3)
    theta = compute_theta(src)
    extras = ("gtype", "coords")
    tiled = tile_join(src, tgt, theta=theta,
                      source_extra=extras, target_extra=extras)
    brute = brute_force_join(src, tgt, extras, extras)
    got, got_pairs = _rel_rows(tiled)
    want, want_pairs = _rel_rows(brute)
    # identical candidate set (the envelope filter is the same), so every
    # counter and the qualifying pair SET must agree exactly — any
    # reference-point dedup slip on a multi-tile donut would double-count
    assert got == want, (got, want)
    assert got_pairs == want_pairs
    assert got["verifications"] > 100 and got["n_disjoint"] > 0
    # non-trivial coverage across the relation space
    assert got["n_touches"] + got["n_overlaps"] + got["n_crosses"] > 0
