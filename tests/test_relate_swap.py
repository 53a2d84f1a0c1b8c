"""swap_relation: predicate(swap(r), s, t) == predicate(r, t, s) on real
candidate pairs — the reference's Constants.swappingStrategy contract."""

import pytest

from ds_jedai_spark.io.synthetic import load_sql, source_box_sql, target_box_sql
from ds_jedai_spark.operators.relate import relation_predicates, swap_relation
from ds_jedai_spark.operators.spatial_join import tile_join

SF = "/root/testdata/sf0.001"


@pytest.mark.parametrize(
    "rel", ["within", "contains", "covers", "coveredby", "equals", "touches",
            "overlaps", "intersects"]
)
def test_swap_matches_operand_flip(spark, rel):
    source = load_sql(spark, SF, source_box_sql())
    target = load_sql(spark, SF, target_box_sql())
    cand = tile_join(source, target, theta=(1.0, 1.0))
    fwd = relation_predicates("s_", "t_")
    rev = relation_predicates("t_", "s_")
    mismatch = cand.where(
        f"({fwd[swap_relation(rel)]}) != ({rev[rel]})"
    ).count()
    assert mismatch == 0
