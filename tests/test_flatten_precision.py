"""Collection flatten + precision reduce operators."""

from ds_jedai_spark.io.readers import explode_collections
from ds_jedai_spark.model.geometry import (
    flatten_collection_wkt,
    parse_wkt,
    snap_precision,
    valid_geometries,
    with_parsed_geometry,
)


def test_flatten_collection_wkt_nested():
    wkt = (
        "GEOMETRYCOLLECTION (POINT (1 2), "
        "GEOMETRYCOLLECTION (LINESTRING (0 0, 1 1)), "
        "POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0)))"
    )
    members = flatten_collection_wkt(wkt)
    assert [m.split(" ")[0] for m in members] == ["POINT", "LINESTRING", "POLYGON"]
    assert all(parse_wkt(m) is not None for m in members)


def test_flatten_noop_for_simple():
    assert flatten_collection_wkt("POINT (3 4)") == ["POINT (3 4)"]


def test_explode_collections_df(spark):
    rows = [
        (1, "GEOMETRYCOLLECTION (POINT (1 2), LINESTRING (0 0, 2 2))"),
        (2, "POINT (5 5)"),
    ]
    df = explode_collections(spark.createDataFrame(rows, ["id", "wkt"]))
    got = sorted((r.id, r.wkt.split(" ")[0]) for r in df.collect())
    assert got == [(1, "LINESTRING"), (1, "POINT"), (2, "POINT")]
    # members parse into valid geometry rows with the id propagated
    parsed = valid_geometries(with_parsed_geometry(df))
    assert parsed.count() == 3


def test_snap_precision():
    parts = [[[0.1 + 1e-13, 2.0 - 1e-13], [3.0, 4.0]]]
    snapped = snap_precision(parts, scale=1e11)
    assert snapped == [[[0.1, 2.0], [3.0, 4.0]]]
    # idempotent
    assert snap_precision(snapped, scale=1e11) == snapped
