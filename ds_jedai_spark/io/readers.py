"""Source readers: delimited WKT, GeoJSON, RDF N-Triples, directories.

Re-expresses the reference reader surface (reference:
src/main/scala/utils/readers/Reader.scala:38-203) Spark-first: every
format lands in the engine's geometry row format (id, ts?, gtype, coords,
minx..maxy) via ``spark.read`` + JVM-side projection, with the WKT parse
as the only Python step (Arrow-batched; model/geometry.py).

Scale notes: CSV/JSON/text scans are splittable and predicate/column
pruning applies before the parse UDF (only the id/geom/date columns are
selected). Directory paths glob natively in ``spark.read`` — the
reference's per-file union loop (Reader.scala:63-70) is unnecessary.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ds_jedai_spark.model.geometry import (
    flatten_collection_wkt,
    valid_geometries,
    with_parsed_geometry,
)

DEFAULT_DATE_PATTERN = "yyyy-MM-dd HH:mm:ss"


def explode_collections(df: DataFrame, wkt_col: str = "wkt") -> DataFrame:
    """One row per GEOMETRYCOLLECTION member, other columns propagated
    (reference GeometryUtils.scala:26-37). Arrow-batched; non-collection
    rows pass through unchanged."""
    def run(batches):
        for pdf in batches:
            out = pdf.copy()
            # Vectorized member expansion: map to member lists, then one
            # pandas-level explode — no per-row Python loop over the frame.
            out[wkt_col] = out[wkt_col].map(flatten_collection_wkt)
            out = out.explode(wkt_col, ignore_index=True)
            yield out[out[wkt_col].notna()]

    fields = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in df.schema)
    return df.mapInPandas(run, fields)


def _finish(df: DataFrame, date_field: str | None, date_pattern: str) -> DataFrame:
    out = with_parsed_geometry(df, "wkt")
    out = valid_geometries(out).drop("wkt")
    if date_field is not None:
        out = out.withColumn("ts", F.to_timestamp("ts_raw", date_pattern)).drop(
            "ts_raw"
        )
    return out


def read_wkt_delimited(
    spark: SparkSession,
    path: str,
    id_field: str,
    geom_field: str,
    delimiter: str = "\t",
    date_field: str | None = None,
    date_pattern: str = DEFAULT_DATE_PATTERN,
    header: bool = True,
) -> DataFrame:
    """CSV/TSV scan with a WKT column (reference Reader.loadDelimitedFile)."""
    raw = spark.read.option("header", header).option("delimiter", delimiter).csv(path)
    cols = [F.col(id_field).alias("id"), F.col(geom_field).alias("wkt")]
    if date_field is not None:
        cols.append(F.col(date_field).alias("ts_raw"))
    return _finish(raw.select(*cols), date_field, date_pattern)


def read_geojson(
    spark: SparkSession,
    path: str,
    id_field: str = "id",
    date_field: str | None = None,
    date_pattern: str = DEFAULT_DATE_PATTERN,
) -> DataFrame:
    """GeoJSON feature scan (reference Reader.loadGeoJSON): newline-
    delimited features parsed with the stdlib json module inside an
    Arrow-batched mapInPandas — all geometry types, no schema-inference
    fights with ragged coordinate nesting. Splittable text scan."""
    return _geojson_from_lines(
        spark.read.text(path), id_field=id_field,
        date_field=date_field, date_pattern=date_pattern,
    )


def _geojson_from_lines(
    lines: DataFrame,
    id_field: str,
    date_field: str | None,
    date_pattern: str,
) -> DataFrame:
    """Shared feature-parsing pipeline over a one-JSON-object-per-row
    ``value`` column (used by both the NDJSON and FeatureCollection
    readers)."""
    import json

    import pandas as pd

    def to_wkt(geom: dict) -> str | None:
        t = (geom or {}).get("type", "")
        c = (geom or {}).get("coordinates")
        if c is None:
            return None

        def pt(p):
            return f"{p[0]} {p[1]}"

        def ring(r):
            return "(" + ", ".join(pt(p) for p in r) + ")"

        if t == "Point":
            return f"POINT ({pt(c)})"
        if t == "LineString":
            return f"LINESTRING {ring(c)}"
        if t == "Polygon":
            return "POLYGON (" + ", ".join(ring(r) for r in c) + ")"
        if t == "MultiPoint":
            return "MULTIPOINT (" + ", ".join(f"({pt(p)})" for p in c) + ")"
        if t == "MultiLineString":
            return "MULTILINESTRING (" + ", ".join(ring(r) for r in c) + ")"
        if t == "MultiPolygon":
            return (
                "MULTIPOLYGON ("
                + ", ".join("(" + ", ".join(ring(r) for r in p) + ")" for p in c)
                + ")"
            )
        return None

    def parse(batches):
        for pdf in batches:
            ids, wkts, dates = [], [], []
            for line in pdf["value"]:
                try:
                    feat = json.loads(line)
                except (ValueError, TypeError):
                    continue
                props = feat.get("properties") or {}
                rid = props.get(id_field)
                # Properties may carry numeric ids; the row format's id is
                # a string column — stringify so Arrow serialization holds.
                ids.append(None if rid is None else str(rid))
                wkts.append(to_wkt(feat.get("geometry")))
                dates.append(props.get(date_field) if date_field else None)
            out = {"id": ids, "wkt": wkts}
            if date_field is not None:
                out["ts_raw"] = dates
            yield pd.DataFrame(out)

    fields = "id string, wkt string" + (
        ", ts_raw string" if date_field is not None else ""
    )
    return _finish(lines.mapInPandas(parse, fields), date_field, date_pattern)


GEOMETRY_PREDICATE = "<http://www.opengis.net/ont/geosparql#asWKT>"


def read_ntriples(
    spark: SparkSession,
    path: str,
    geometry_predicate: str = GEOMETRY_PREDICATE,
) -> DataFrame:
    """RDF N-Triples scan (reference Reader.loadRdfAsTextual): keep triples
    whose predicate is the geometry predicate, strip IRI brackets and
    literal quotes, parse the WKT object."""
    raw = spark.read.text(path)
    pred = geometry_predicate.replace("<", "").replace(">", "")
    parts = F.split(F.col("value"), " ", 3)
    df = (
        raw.select(
            F.regexp_replace(parts[0], "[<>]", "").alias("id"),
            F.regexp_replace(parts[1], "[<>]", "").alias("predicate"),
            F.regexp_extract(parts[2], '"(.*)"', 1).alias("wkt"),
        )
        .where(F.col("predicate") == pred)
        .drop("predicate")
    )
    return _finish(df, None, DEFAULT_DATE_PATTERN)


def read_geojson_collection(
    spark: SparkSession,
    path: str,
    id_field: str = "id",
    date_field: str | None = None,
    date_pattern: str = DEFAULT_DATE_PATTERN,
) -> DataFrame:
    """Whole-document GeoJSON FeatureCollection scan.

    Real-world GeoJSON often ships one FeatureCollection object per file
    rather than newline-delimited features. A whole-file JSON document is
    NOT splittable, so this reader targets many-small-files layouts (one
    task per file via wholeTextFiles-style `wholetext`); for a single
    multi-GB collection, convert to NDJSON first and use read_geojson.
    Parsing reuses read_geojson's feature pipeline by re-emitting each
    feature as its own JSON line inside the batch iterator."""
    import json

    import pandas as pd

    def split_features(batches):
        for pdf in batches:
            lines = []
            for doc in pdf["value"]:
                try:
                    obj = json.loads(doc)
                except (ValueError, TypeError):
                    continue
                feats = (
                    obj.get("features", [])
                    if obj.get("type") == "FeatureCollection"
                    else [obj]
                )
                lines.extend(json.dumps(f) for f in feats)
            yield pd.DataFrame({"value": lines})

    ndjson = (
        spark.read.option("wholetext", True)
        .text(path)
        .mapInPandas(split_features, "value string")
    )
    return _geojson_from_lines(
        ndjson, id_field=id_field, date_field=date_field,
        date_pattern=date_pattern,
    )


def read_parquet_dataset(
    spark: SparkSession,
    path: str,
    id_field: str = "id",
) -> DataFrame:
    """Engine-native parquet ingestion: a dataset already in the row
    format (gtype/coords/envelope columns) loads with zero parsing — the
    fast path for data previously exported by this engine or prepared
    upstream. Column pruning and predicate pushdown apply directly."""
    df = spark.read.parquet(path)
    cols = {"gtype", "coords", "minx", "miny", "maxx", "maxy"}
    missing = cols - set(df.columns)
    if missing:
        raise ValueError(
            f"parquet dataset missing row-format columns: {sorted(missing)}"
        )
    if id_field != "id":
        df = df.withColumnRenamed(id_field, "id")
    return df
