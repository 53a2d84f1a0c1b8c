"""Result sinks (reference: src/main/scala/utils/Utils.scala:34-98).

CSV pair export, GeoSPARQL RDF triples per qualifying relation, fixed-
predicate N-Triples, and matching-pairs TSV. All are plain DataFrame
writes — distributed, no driver collection (the reference's coalesce(1)
for N-Triples is kept as an option for small outputs only).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

GEOSPARQL = "http://www.opengis.net/ont/geosparql#"
RELATION_PREDICATES = {
    "contains": "sfContains",
    "coveredby": "ehCoveredBy",
    "covers": "ehCovers",
    "crosses": "sfCrosses",
    "equals": "sfEquals",
    "intersects": "sfIntersects",
    "overlaps": "sfOverlaps",
    "touches": "sfTouches",
    "within": "sfWithin",
}


def export_csv_pairs(pairs: DataFrame, path: str) -> None:
    """(s_id, t_id) pairs with header (reference exportCSV)."""
    pairs.select("s_id", "t_id").write.option("header", True).mode(
        "overwrite"
    ).csv(path)


def export_matching_pairs_tsv(pairs: DataFrame, path: str) -> None:
    """``s\\tt\\t1.0`` lines (reference exportMatchingPairs)."""
    pairs.select(
        F.col("s_id").cast("string"),
        F.col("t_id").cast("string"),
        F.lit("1.0"),
    ).write.option("delimiter", "\t").mode("overwrite").csv(path)


def export_rdf(relations: DataFrame, path: str) -> None:
    """One GeoSPARQL triple per true relation flag per pair (reference
    exportRDF): expects r_<relation> boolean columns."""
    triples = None
    for rel, pred in RELATION_PREDICATES.items():
        col = f"r_{rel}"
        if col not in relations.columns:
            continue
        t = relations.where(F.col(col)).select(
            F.concat(
                F.lit("<"),
                F.col("s_id").cast("string"),
                F.lit(f"> <{GEOSPARQL}{pred}> <"),
                F.col("t_id").cast("string"),
                F.lit("> ."),
            ).alias("value")
        )
        triples = t if triples is None else triples.union(t)
    if triples is not None:
        triples.write.mode("overwrite").text(path)


def export_ntriples(
    pairs: DataFrame, path: str, predicate: str = f"{GEOSPARQL}sfIntersects", single_file: bool = False
) -> None:
    """Fixed-predicate triples (reference exportNTRIPLES)."""
    out = pairs.select(
        F.concat(
            F.lit("<"),
            F.col("s_id").cast("string"),
            F.lit(f"> <{predicate}> <"),
            F.col("t_id").cast("string"),
            F.lit("> ."),
        ).alias("value")
    )
    if single_file:
        out = out.coalesce(1)
    out.write.mode("overwrite").text(path)
