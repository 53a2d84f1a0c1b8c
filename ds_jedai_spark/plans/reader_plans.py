"""End-to-end WKT ingestion under the DuckDB oracle gate.

The driver-oracled spatial queries elsewhere derive geometry from parquet
keys; this plan instead runs the actual reader chain the reference exposes
(reference utils/readers/Reader.scala:85-112 -> experiments/GiantExp):

    read_wkt_delimited (delimited scan, WKT parse, validity filter,
    envelope derivation) -> tile_join -> counts

over a committed WKT fixture (fixtures/wkt_source.tsv, regenerable via
scripts/make_wkt_fixture.py). The fixture carries ground-truth columns
(gtype/valid/envelope) that ONLY the oracle reads — the engine sees just
id+wkt — so a hash match proves the reader, not formula transcription.
"""

from __future__ import annotations

from pathlib import Path

from pyspark.sql import DataFrame, SparkSession, functions as F

from ds_jedai_spark.operators.spatial_join import tile_join

FIXTURE = str(Path(__file__).resolve().parents[2] / "fixtures" / "wkt_source.tsv")

_ENV = (
    "s.minx <= t.maxx AND t.minx <= s.maxx AND "
    "s.miny <= t.maxy AND t.miny <= s.maxy"
)


GEO_FIXTURE = str(
    Path(__file__).resolve().parents[2] / "fixtures" / "geo_source.geojson"
)


def _reader_counts(src: DataFrame) -> DataFrame:
    """Entity mix + self-join pair count of a parsed fixture frame."""
    ents = src.agg(
        F.count(F.lit(1)).alias("n_entities"),
        F.count(F.when(F.col("gtype").startswith("MULTI"), True)).alias("n_multi"),
        F.count(F.when(F.col("gtype") == "POLYGON", True)).alias("n_polygons"),
        F.count(F.when(F.col("gtype") == "LINESTRING", True)).alias("n_lines"),
        F.count(F.when(F.col("gtype") == "POINT", True)).alias("n_points"),
    )
    pairs = (
        tile_join(src, src, theta=(1.0, 1.0))
        .where(F.col("s_id") < F.col("t_id"))
        .agg(F.count(F.lit(1)).alias("pairs"))
    )
    return ents.crossJoin(pairs)


def _reader_counts_oracle(src_cte: str) -> str:
    return (
        f"WITH src AS ({src_cte}), "
        f"ent AS (SELECT count(*) AS n_entities, "
        f"COUNT(*) FILTER (WHERE gtype LIKE 'MULTI%') AS n_multi, "
        f"COUNT(*) FILTER (WHERE gtype = 'POLYGON') AS n_polygons, "
        f"COUNT(*) FILTER (WHERE gtype = 'LINESTRING') AS n_lines, "
        f"COUNT(*) FILTER (WHERE gtype = 'POINT') AS n_points FROM src), "
        f"pr AS (SELECT count(*) AS pairs FROM src s JOIN src t "
        f"ON {_ENV} AND s.id < t.id) "
        f"SELECT n_entities, n_multi, n_polygons, n_lines, n_points, pairs "
        f"FROM ent, pr"
    )


def wkt_reader_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ds_jedai_spark.io.readers import read_wkt_delimited

    src = read_wkt_delimited(
        spark, FIXTURE, id_field="id", geom_field="wkt"
    ).withColumn("id", F.col("id").cast("long"))
    return _reader_counts(src)


def wkt_reader_counts_oracle() -> str:
    return _reader_counts_oracle(
        f"SELECT CAST(id AS BIGINT) AS id, gtype, minx, miny, maxx, maxy "
        f"FROM read_csv('{FIXTURE}', delim='\t', header=true) WHERE valid = 1"
    )


WKB_FIXTURE = str(
    Path(__file__).resolve().parents[2] / "fixtures" / "geo_source_wkb.parquet"
)


def wkb_reader_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same gate through the GeoParquet/WKB reader: the parquet fixture
    (scripts/make_wkb_fixture.py) embeds the identical entity set as the
    WKT fixture, geometry as ISO-WKB binary, detection via the GeoParquet
    `geo` footer metadata (no geom_field passed) — all four §2.1 geometry
    readers must land on identical counts, and the oracle reads only the
    fixture's ground-truth columns, which the engine never touches."""
    from ds_jedai_spark.io.readers import read_parquet_dataset

    src = read_parquet_dataset(spark, WKB_FIXTURE).withColumn(
        "id", F.col("id").cast("long")
    )
    return _reader_counts(src)


def wkb_reader_counts_oracle() -> str:
    return _reader_counts_oracle(
        f"SELECT CAST(id AS BIGINT) AS id, gtype, minx, miny, maxx, maxy "
        f"FROM read_parquet('{WKB_FIXTURE}') WHERE valid = 1"
    )


SHP_FIXTURE = str(
    Path(__file__).resolve().parents[2] / "fixtures" / "shp_source"
)
SHP_TRUTH = str(
    Path(__file__).resolve().parents[2] / "fixtures"
    / "shp_source_truth.parquet"
)


def shp_reader_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same gate through the ESRI Shapefile reader: the fixture
    directory (scripts/make_shp_fixture.py) carries the WKT fixture's
    entity set across four per-kind shapefiles (.shp/.shx/.dbf, ids in
    the dbf) with the invalid rows as deliberately corrupt records; the
    oracle reads only the sidecar ground-truth parquet, which the
    engine never touches. gtype truth applies the format's inherent
    promotions (single-part MULTILINESTRING -> LINESTRING, single-shell
    MULTIPOLYGON -> POLYGON)."""
    from ds_jedai_spark.io.shapefile import read_shapefile

    src = read_shapefile(spark, SHP_FIXTURE, id_field="id").withColumn(
        "id", F.col("id").cast("long")
    )
    return _reader_counts(src)


def shp_reader_counts_oracle() -> str:
    return _reader_counts_oracle(
        f"SELECT CAST(id AS BIGINT) AS id, gtype, minx, miny, maxx, maxy "
        f"FROM read_parquet('{SHP_TRUTH}') WHERE valid = 1"
    )


GPKG_FIXTURE = str(
    Path(__file__).resolve().parents[2] / "fixtures" / "geo_source.gpkg"
)


def gpkg_reader_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same gate through the GeoPackage reader: the .gpkg fixture
    (scripts/make_gpkg_fixture.py) carries the WKT fixture's entities
    as GPB-wrapped WKB cells (cycling envelope indicators, corrupt
    cells for the invalid rows); the oracle is the WKT fixture's own
    ground-truth columns — GeoPackage has no gtype promotions, so the
    truth is identical to the WKT reader's."""
    from ds_jedai_spark.io.geopackage import read_geopackage

    src = read_geopackage(spark, GPKG_FIXTURE, id_field="id").withColumn(
        "id", F.col("id").cast("long")
    )
    return _reader_counts(src)


def gpkg_reader_counts_oracle() -> str:
    return wkt_reader_counts_oracle()


FGB_FIXTURE = str(
    Path(__file__).resolve().parents[2] / "fixtures" / "geo_source.fgb"
)


def fgb_reader_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same gate through the FlatGeobuf reader: the .fgb fixture
    (scripts/make_fgb_fixture.py) carries the WKT fixture's entities as
    flatbuffer features behind a packed R-tree (header type Unknown so
    per-feature types are exercised; the invalid rows are correctly
    framed corrupt features cycling a malformation zoo); the oracle is
    the WKT fixture's own ground-truth columns — FlatGeobuf has no
    gtype promotions."""
    from ds_jedai_spark.io.flatgeobuf import read_flatgeobuf

    src = read_flatgeobuf(spark, FGB_FIXTURE, id_field="id").withColumn(
        "id", F.col("id").cast("long")
    )
    return _reader_counts(src)


def fgb_reader_counts_oracle() -> str:
    return wkt_reader_counts_oracle()


HOLES_SRC = str(
    Path(__file__).resolve().parents[2] / "fixtures" / "wkt_holes_source.tsv"
)
HOLES_TGT = str(
    Path(__file__).resolve().parents[2] / "fixtures" / "wkt_holes_target.tsv"
)

_HOLE_RELS = (
    "intersects", "contains", "within", "covers", "coveredby",
    "equals", "touches", "overlaps", "crosses", "disjoint",
)


def wkt_hole_relate_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end EXACT DE-9IM over ingested hole/concave/multipolygon
    WKT (the reference's IntersectionMatrixTest.scala:29-38 pattern run
    through the full chain): delimited scan -> WKT parse -> validity
    filter -> tile join -> relate_general (which routes these
    non-convex shapes through relate_poly's scaled-integer classifier)
    -> the 11 counters.

    The fixture (scripts/make_holes_fixture.py) places one source and
    one target per 128-unit grid cell so the tile join yields exactly
    the within-cell pairs, every one of which has INTERSECTING ENVELOPES
    while the true relation is often 'disjoint' (target inside a hole /
    concavity / multipolygon gap) — the pairs an envelope approximation
    answers wrong by construction. The oracle reads the fixture's
    hand-derived truth flags, which the engine never sees."""
    from ds_jedai_spark.io.readers import read_wkt_delimited
    from ds_jedai_spark.operators.relate_general import with_general_relations

    src = read_wkt_delimited(
        spark, HOLES_SRC, id_field="id", geom_field="wkt"
    ).withColumn("id", F.col("id").cast("long"))
    tgt = read_wkt_delimited(
        spark, HOLES_TGT, id_field="id", geom_field="wkt"
    ).withColumn("id", F.col("id").cast("long"))
    cand = tile_join(
        src, tgt, theta=(8.0, 8.0),
        source_extra=("gtype", "coords"), target_extra=("gtype", "coords"),
    )
    v = with_general_relations(cand)
    return v.agg(
        F.count(F.lit(1)).alias("verifications"),
        *[F.count(F.when(F.col(f"r_{r}"), True)).alias(f"n_{r}")
          for r in _HOLE_RELS],
    )


def wkt_hole_relate_counts_oracle() -> str:
    env = (
        "s.minx <= t.maxx AND t.minx <= s.maxx AND "
        "s.miny <= t.maxy AND t.miny <= s.maxy"
    )
    flag_sums = ", ".join(
        f"COALESCE(CAST(sum(t.f_{r}) AS BIGINT), 0) AS n_{r}"
        for r in _HOLE_RELS
    )
    return (
        f"WITH s AS (SELECT CAST(id AS BIGINT) AS id, minx, miny, maxx, "
        f"maxy FROM read_csv('{HOLES_SRC}', delim='\t', header=true) "
        f"WHERE valid = 1), "
        f"t AS (SELECT * FROM read_csv('{HOLES_TGT}', delim='\t', "
        f"header=true) WHERE valid = 1) "
        f"SELECT count(*) AS verifications, {flag_sums} "
        f"FROM s JOIN t ON {env}"
    )


NT_FIXTURE = str(
    Path(__file__).resolve().parents[2] / "fixtures" / "nt_source.nt"
)


def ntriples_reader_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same gate through the RDF N-Triples reader: the .nt fixture embeds
    the identical WKT set, ids are the subject-IRI numeric suffix, the
    truth columns come from the sibling TSV — all three §2.1 readers must
    land on identical counts."""
    from ds_jedai_spark.io.readers import read_ntriples

    src = read_ntriples(spark, NT_FIXTURE).withColumn(
        "id", F.regexp_extract(F.col("id"), r"e(\d+)$", 1).cast("long")
    )
    return _reader_counts(src)


def ntriples_reader_counts_oracle() -> str:
    return wkt_reader_counts_oracle()



def _sink_dir(spark: SparkSession, name: str) -> str:
    """Fixed per-application scratch dir for sink round trips: the
    writers run mode("overwrite"), so repeated gate invocations reuse
    one directory instead of leaking a fresh mkdtemp per run."""
    import os
    import tempfile

    out = os.path.join(
        tempfile.gettempdir(),
        f"jedai_{name}_{spark.sparkContext.applicationId}",
    )
    os.makedirs(out, exist_ok=True)
    return out


def sink_roundtrip_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CSV pair sink under the oracle gate: write the qualifying
    intersecting pairs with writers.export_csv_pairs, read the files
    back, and report count + key extrema — the oracle computes the same
    directly from the pairs CTE, so the write/rescan round trip must be
    lossless."""
    from ds_jedai_spark.io.writers import export_csv_pairs
    from ds_jedai_spark.plans.giant import relation_pairs

    pairs = relation_pairs("intersects")(spark, sf_dir)
    out = _sink_dir(spark, "sink_csv")
    export_csv_pairs(pairs, out)
    back = (
        spark.read.option("header", True)
        .schema("s_id long, t_id long")
        .csv(out)
    )
    return back.agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.min("s_id").alias("min_s"),
        F.max("s_id").alias("max_s"),
        F.min("t_id").alias("min_t"),
        F.max("t_id").alias("max_t"),
        F.sum(F.col("s_id") + F.col("t_id")).alias("key_sum"),
    )


def sink_roundtrip_counts_oracle() -> str:
    from ds_jedai_spark.plans.giant import relation_pairs_oracle

    return (
        f"WITH rt AS ({relation_pairs_oracle('intersects')}) "
        f"SELECT count(*) AS n_pairs, min(s_id) AS min_s, max(s_id) AS max_s, "
        f"min(t_id) AS min_t, max(t_id) AS max_t, "
        f"CAST(sum(s_id + t_id) AS BIGINT) AS key_sum FROM rt"
    )


def ntriples_sink_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N-Triples sink round trip: qualifying pairs out through
    export_ntriples, parsed back with the same regex surface the reader
    uses, aggregated against the direct pairs oracle."""
    from ds_jedai_spark.io.writers import export_ntriples
    from ds_jedai_spark.plans.giant import relation_pairs

    pairs = relation_pairs("intersects")(spark, sf_dir)
    out = _sink_dir(spark, "sink_nt")
    export_ntriples(pairs, out)
    back = spark.read.text(out).select(
        F.regexp_extract("value", r"^<(\d+)> <[^>]+> <(\d+)> \.$", 1)
        .cast("long")
        .alias("s_id"),
        F.regexp_extract("value", r"^<(\d+)> <[^>]+> <(\d+)> \.$", 2)
        .cast("long")
        .alias("t_id"),
    )
    return back.agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.min("s_id").alias("min_s"),
        F.max("s_id").alias("max_s"),
        F.min("t_id").alias("min_t"),
        F.max("t_id").alias("max_t"),
        F.sum(F.col("s_id") + F.col("t_id")).alias("key_sum"),
    )


def ntriples_sink_roundtrip_oracle() -> str:
    return sink_roundtrip_counts_oracle()


def tsv_sink_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Matching-pairs TSV sink round trip (reference exportMatchingPairs:
    ``s\tt\t1.0`` lines): write, re-read with the TSV schema, aggregate
    against the direct pairs oracle. Score column correctness (constant
    "1.0") is pinned by pytest; the gate checks the id round trip."""
    from ds_jedai_spark.io.writers import export_matching_pairs_tsv
    from ds_jedai_spark.plans.giant import relation_pairs

    pairs = relation_pairs("intersects")(spark, sf_dir)
    out = _sink_dir(spark, "sink_tsv")
    export_matching_pairs_tsv(pairs, out)
    back = (
        spark.read.option("delimiter", "\t")
        .schema("s_id long, t_id long, score string")
        .csv(out)
    )
    return back.agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.min("s_id").alias("min_s"),
        F.max("s_id").alias("max_s"),
        F.min("t_id").alias("min_t"),
        F.max("t_id").alias("max_t"),
        F.sum(F.col("s_id") + F.col("t_id")).alias("key_sum"),
    )


def tsv_sink_roundtrip_oracle() -> str:
    return sink_roundtrip_counts_oracle()


def rdf_sink_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GeoSPARQL RDF sink round trip (reference exportRDF: one triple
    per TRUE relation flag per pair): run the relation-flagged join,
    write all triples, parse them back, and aggregate — the oracle
    re-derives the same multiset as a UNION ALL of the 9 per-relation
    pair queries over the pairs CTE."""
    from ds_jedai_spark.io.writers import export_rdf
    from ds_jedai_spark.operators.relate import with_relations
    from ds_jedai_spark.operators.spatial_join import tile_join
    from ds_jedai_spark.io.synthetic import (
        load_sql,
        source_box_sql,
        target_box_sql,
    )
    from ds_jedai_spark.plans.giant import cached_theta

    src = load_sql(spark, sf_dir, source_box_sql())
    tgt = load_sql(spark, sf_dir, target_box_sql())
    theta = cached_theta(spark, sf_dir, "source_box", src)
    rel = with_relations(tile_join(src, tgt, theta=theta))
    out = _sink_dir(spark, "sink_rdf")
    export_rdf(rel, out)
    back = spark.read.text(out).select(
        F.regexp_extract("value", r"^<(\d+)> <[^>]+> <(\d+)> \.$", 1)
        .cast("long")
        .alias("s_id"),
        F.regexp_extract("value", r"^<(\d+)> <[^>]+> <(\d+)> \.$", 2)
        .cast("long")
        .alias("t_id"),
    )
    return back.agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.min("s_id").alias("min_s"),
        F.max("s_id").alias("max_s"),
        F.min("t_id").alias("min_t"),
        F.max("t_id").alias("max_t"),
        F.sum(F.col("s_id") + F.col("t_id")).alias("key_sum"),
    )


def rdf_sink_roundtrip_oracle() -> str:
    from ds_jedai_spark.io.writers import RELATION_PREDICATES
    from ds_jedai_spark.plans.giant import _pairs_cte
    from ds_jedai_spark.operators.relate import relation_predicates

    preds = relation_predicates("s_", "t_")
    union = " UNION ALL ".join(
        f"SELECT s_id, t_id FROM pairs WHERE {preds[rel]}"
        for rel in RELATION_PREDICATES
    )
    return (
        f"{_pairs_cte()}, tr AS ({union}) "
        "SELECT count(*) AS n_pairs, min(s_id) AS min_s, "
        "max(s_id) AS max_s, min(t_id) AS min_t, max(t_id) AS max_t, "
        "CAST(sum(s_id + t_id) AS BIGINT) AS key_sum FROM tr"
    )


def geojson_reader_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same gate through the GeoJSON reader (NDJSON features; truth lives
    in properties, the engine parses only the geometry objects)."""
    from ds_jedai_spark.io.readers import read_geojson

    src = read_geojson(spark, GEO_FIXTURE, id_field="id").withColumn(
        "id", F.col("id").cast("long")
    )
    return _reader_counts(src)


def geojson_reader_counts_oracle() -> str:
    cols = (
        "STRUCT(id BIGINT, gtype VARCHAR, valid INTEGER, "
        "minx DOUBLE, miny DOUBLE, maxx DOUBLE, maxy DOUBLE)"
    )
    return _reader_counts_oracle(
        f"SELECT properties.id AS id, properties.gtype AS gtype, "
        f"properties.minx AS minx, properties.miny AS miny, "
        f"properties.maxx AS maxx, properties.maxy AS maxy "
        f"FROM read_json('{GEO_FIXTURE}', format='newline_delimited', "
        f"columns={{'properties': '{cols}'}}) WHERE properties.valid = 1"
    )


def _box_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-format polygons from the derived SOURCE boxes — the sharded
    sinks' round-trip input (every coordinate a multiple of 1/16, so
    the envelope checksums below are exact integers both sides)."""
    from ds_jedai_spark.io.synthetic import load_sql, source_box_sql

    return load_sql(spark, sf_dir, source_box_sql()).selectExpr(
        "CAST(id AS STRING) AS id",
        "'POLYGON' AS gtype",
        "array(array(array(minx, miny), array(maxx, miny),"
        " array(maxx, maxy), array(minx, maxy), array(minx, miny)))"
        " AS coords",
        "minx", "miny", "maxx", "maxy",
    )


def _sharded_agg(back: DataFrame) -> DataFrame:
    """Count + id extrema + lattice envelope checksums of a reread
    corpus — named onto the sink_roundtrips composite schema."""
    t = back.selectExpr(
        "CAST(id AS LONG) AS idl", "minx", "miny", "maxx", "maxy"
    )
    return t.agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.min("idl").alias("min_s"),
        F.max("idl").alias("max_s"),
        F.sum(F.round(F.col("minx") * 16)).cast("long").alias("min_t"),
        F.sum(F.round(F.col("maxy") * 16)).cast("long").alias("max_t"),
        F.sum(F.round((F.col("maxx") + F.col("miny")) * 16))
        .cast("long").alias("key_sum"),
    )


def gpkg_sharded_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed GeoPackage sink under the oracle gate: boxes out
    through export_geopackage_sharded (4 executor-written shards, each
    its own SQLite container + R*Tree), reread as one corpus; the
    oracle recomputes count/extrema/checksums from the boxes CTE, so
    the parallel write + corpus read must be lossless."""
    from ds_jedai_spark.io.geopackage import (
        export_geopackage_sharded,
        read_geopackage,
    )

    src = _box_rows(spark, sf_dir)
    out = _sink_dir(spark, "sink_gpkg_shards")
    export_geopackage_sharded(src.repartition(4), out)
    return _sharded_agg(read_geopackage(spark, out, id_field="id"))


def fgb_sharded_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same gate for the distributed FlatGeobuf sink (4 Hilbert-indexed
    shards reread as one corpus)."""
    from ds_jedai_spark.io.flatgeobuf import (
        export_flatgeobuf_sharded,
        read_flatgeobuf,
    )

    src = _box_rows(spark, sf_dir)
    out = _sink_dir(spark, "sink_fgb_shards")
    export_flatgeobuf_sharded(src.repartition(4), out)
    return _sharded_agg(read_flatgeobuf(spark, out, id_field="id"))


def zorder_sink_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-ordered parquet layout under the oracle gate: source-box
    centers written through io.layout.write_zordered (Morton-key range
    partition + partition sort), reread, and bbox-filtered through the
    normal parquet pruning path; count/extrema/checksums must match the
    oracle computing the same filter directly on the boxes CTE — the
    layout shuffle/sort/write/rescan must be lossless and the pruning
    must not drop qualifying rows. Centers are multiples of 1/32, so
    the *32 checksums are exact integers in both engines."""
    from ds_jedai_spark.io.layout import write_zordered
    from ds_jedai_spark.io.synthetic import load_sql, source_box_sql

    src = load_sql(spark, sf_dir, source_box_sql()).selectExpr(
        "id",
        "(minx + maxx) / 2.0e0 AS cx",
        "(miny + maxy) / 2.0e0 AS cy",
    )
    out = _sink_dir(spark, "sink_zorder")
    write_zordered(
        src, out, x_col="cx", y_col="cy", precision=8,
        bounds=(0.0, 0.0, 128.0, 128.0), files=8,
    )
    back = spark.read.parquet(out).where(
        "cx >= 20.0e0 AND cx <= 44.0e0 AND cy >= 30.0e0 AND cy <= 54.0e0"
    )
    return back.agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.min("id").alias("min_s"),
        F.max("id").alias("max_s"),
        F.sum(F.round(F.col("cx") * 32)).cast("long").alias("min_t"),
        F.sum(F.round(F.col("cy") * 32)).cast("long").alias("max_t"),
        F.sum(F.col("id") * 3 + 1).alias("key_sum"),
    )


def zorder_sink_roundtrip_oracle() -> str:
    from ds_jedai_spark.io.synthetic import source_box_sql

    return (
        f"WITH b AS ({source_box_sql()}), c AS ("
        "SELECT id, (minx + maxx) / 2 AS cx, (miny + maxy) / 2 AS cy "
        "FROM b) "
        "SELECT count(*) AS n_pairs, min(id) AS min_s, max(id) AS max_s, "
        "CAST(sum(round(cx * 32)) AS BIGINT) AS min_t, "
        "CAST(sum(round(cy * 32)) AS BIGINT) AS max_t, "
        "CAST(sum(id * 3 + 1) AS BIGINT) AS key_sum "
        "FROM c WHERE cx >= 20 AND cx <= 44 AND cy >= 30 AND cy <= 54"
    )


def sharded_roundtrip_oracle() -> str:
    from ds_jedai_spark.io.synthetic import source_box_sql

    return (
        f"WITH b AS ({source_box_sql()}) "
        "SELECT count(*) AS n_pairs, min(id) AS min_s, max(id) AS max_s, "
        "CAST(sum(round(minx * 16)) AS BIGINT) AS min_t, "
        "CAST(sum(round(maxy * 16)) AS BIGINT) AS max_t, "
        "CAST(sum(round((maxx + miny) * 16)) AS BIGINT) AS key_sum "
        "FROM b"
    )
