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


def geojson_lines(entities: DataFrame) -> DataFrame:
    """One NDJSON Feature per entity from the engine row format
    (id, gtype, coords) — the inverse of readers.read_geojson. Arrow-
    batched; export is off the hot path by design."""
    import json

    from ds_jedai_spark.model.geometry import regroup_rings

    def to_feature(gtype: str, parts) -> dict | None:
        parts = [[list(map(float, p)) for p in part] for part in parts]
        if gtype == "POINT":
            return {"type": "Point", "coordinates": parts[0][0]}
        if gtype == "LINESTRING":
            return {"type": "LineString", "coordinates": parts[0]}
        if gtype == "POLYGON":
            return {"type": "Polygon", "coordinates": parts}
        if gtype == "MULTIPOINT":
            return {"type": "MultiPoint", "coordinates": [p[0] for p in parts]}
        if gtype == "MULTILINESTRING":
            return {"type": "MultiLineString", "coordinates": parts}
        if gtype == "MULTIPOLYGON":
            # Row-format multipolygon parts are flattened rings, shell
            # first per polygon; recover the OGC per-polygon grouping
            # with the exact nesting test (model/geometry.regroup_rings)
            # so hole-bearing multipolygons export structurally correct.
            return {"type": "MultiPolygon", "coordinates": regroup_rings(parts)}
        return None

    # A ts column round-trips through properties (read back with
    # read_geojson(date_field="ts")); the default date pattern both
    # sides share makes the export/ingest loop lossless to the second.
    has_ts = "ts" in entities.columns

    def run(batches):
        import pandas as pd

        for pdf in batches:
            lines = []
            tss = (pdf["ts"] if has_ts
                   else pd.Series([None] * len(pdf)))
            for rid, gtype, coords, ts in zip(
                pdf["id"], pdf["gtype"], pdf["coords"], tss
            ):
                geom = to_feature(gtype, coords)
                if geom is None:
                    continue
                props = {"id": str(rid)}
                if ts is not None and ts == ts:  # skip NULL/NaT
                    props["ts"] = ts.strftime("%Y-%m-%d %H:%M:%S")
                lines.append(json.dumps({
                    "type": "Feature",
                    "geometry": geom,
                    "properties": props,
                }))
            yield pd.DataFrame({"value": lines})

    cols = ["id", "gtype", "coords"] + (["ts"] if has_ts else [])
    return entities.select(*cols).mapInPandas(run, "value string")


def export_geojson(entities: DataFrame, path: str) -> None:
    """NDJSON GeoJSON feature export (splittable on re-read)."""
    geojson_lines(entities).write.mode("overwrite").text(path)


def export_geoparquet(entities: DataFrame, path: str) -> None:
    """WKB-parquet export from the engine row format: id + a binary
    ``geometry`` column (little-endian ISO WKB via model/geometry.
    format_wkb) — the inverse of read_parquet_dataset's WKB path, which
    re-detects the binary ``geometry`` column by name. A distributed
    write cannot stamp the GeoParquet ``geo`` footer JSON (Spark's
    parquet writer owns the footer), so interoperability rests on the
    standard column name + WKB encoding, which GeoPandas/GDAL also
    accept. Arrow-batched; export is off the hot path by design."""
    import pandas as pd

    from ds_jedai_spark.model.geometry import format_wkb

    def run(batches):
        for pdf in batches:
            wkbs = [
                format_wkb(g, c) for g, c in zip(pdf["gtype"], pdf["coords"])
            ]
            yield pd.DataFrame({"id": pdf["id"].astype(str),
                                "geometry": wkbs})

    (
        entities.select("id", "gtype", "coords")
        .mapInPandas(run, "id string, geometry binary")
        .write.mode("overwrite")
        .parquet(path)
    )
