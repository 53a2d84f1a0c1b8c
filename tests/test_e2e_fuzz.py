"""End-to-end differential fuzz: random mixed-geometry WKT datasets
through the FULL api.run pipeline (WKT ingestion, theta sampling, tile
join, reference-point dedup, the auto skew dispatcher, exact DE-9IM
verification, counts aggregation) must reproduce a driver-side
brute-force relate_pair double loop over all cross pairs.

What the fixed gate corpora cannot produce, this does: all-point
datasets (zero-extent theta), identical stacked geometries, single-tile
layouts, multi-type mixes, and duplicate-heavy inputs — the layouts
where tile assignment or the reference-point dedup would double- or
zero-count a pair. Reference contract: experiments/GiantExp.scala
(counts row) on arbitrary inputs."""

import pytest
from hypothesis import HealthCheck, example, given, settings, strategies as st

from ds_jedai_spark import api
from ds_jedai_spark.config import DatasetSpec, JedaiConfig
from ds_jedai_spark.model.geometry import format_wkt
from ds_jedai_spark.operators.relate import RELATIONS
from ds_jedai_spark.operators.relate_general import relate_pair
from conftest import fuzz_examples

_lat = st.integers(-24, 24).map(lambda v: v / 16.0)


def _box_ring(x1, y1, w, h):
    return [[x1, y1], [x1 + w, y1], [x1 + w, y1 + h], [x1, y1 + h],
            [x1, y1]]


@st.composite
def geom(draw):
    kind = draw(st.integers(0, 8))
    if kind == 0:
        return "POINT", [[[draw(_lat), draw(_lat)]]]
    if kind == 1:
        x1, y1 = draw(_lat), draw(_lat)
        w = draw(st.integers(1, 32)) / 16.0
        h = draw(st.integers(1, 32)) / 16.0
        return "POLYGON", [_box_ring(x1, y1, w, h)]
    if kind == 2:
        a = (draw(_lat), draw(_lat))
        b = (draw(_lat), draw(_lat))
        if a == b:
            b = (b[0] + 1 / 16.0, b[1])
        return "LINESTRING", [[list(a), list(b)]]
    if kind == 3:
        from hypothesis import assume

        pts = [(draw(_lat), draw(_lat)) for _ in range(3)]
        area2 = (pts[1][0] - pts[0][0]) * (pts[2][1] - pts[0][1]) - (
            pts[1][1] - pts[0][1]) * (pts[2][0] - pts[0][0])
        assume(area2 != 0)
        return "POLYGON", [[list(p) for p in pts] + [list(pts[0])]]
    if kind == 4:  # multipoint: one point per part (parser convention)
        n = draw(st.integers(2, 4))
        return "MULTIPOINT", [[[draw(_lat), draw(_lat)]] for _ in range(n)]
    if kind == 5:  # polyline: 3-4 vertices, consecutive distinct
        pts = [(draw(_lat), draw(_lat))]
        for _ in range(draw(st.integers(2, 3))):
            p = (draw(_lat), draw(_lat))
            if p == pts[-1]:
                p = (p[0] + 1 / 16.0, p[1])
            pts.append(p)
        return "LINESTRING", [[list(p) for p in pts]]
    if kind == 6:  # multilinestring: two 2-point chains
        chains = []
        for _ in range(2):
            a = (draw(_lat), draw(_lat))
            b = (draw(_lat), draw(_lat))
            if a == b:
                b = (b[0] + 1 / 16.0, b[1])
            chains.append([list(a), list(b)])
        return "MULTILINESTRING", chains
    if kind == 7:  # polygon with a strictly-interior hole
        x1, y1 = draw(_lat), draw(_lat)
        w = draw(st.integers(3, 32)) / 16.0
        h = draw(st.integers(3, 32)) / 16.0
        s = 1 / 16.0
        return "POLYGON", [
            _box_ring(x1, y1, w, h),
            _box_ring(x1 + s, y1 + s, w - 2 * s, h - 2 * s),
        ]
    # multipolygon: two boxes with a strict horizontal gap (rings of one
    # geometry sharing a collinear run are out of relate_poly's contract,
    # COVERAGE.md r11 find)
    x1, y1 = draw(_lat), draw(_lat)
    w1 = draw(st.integers(1, 16)) / 16.0
    h1 = draw(st.integers(1, 16)) / 16.0
    gap = draw(st.integers(1, 8)) / 16.0
    y2 = draw(_lat)
    w2 = draw(st.integers(1, 16)) / 16.0
    h2 = draw(st.integers(1, 16)) / 16.0
    return "MULTIPOLYGON", [
        _box_ring(x1, y1, w1, h1),
        _box_ring(x1 + w1 + gap, y2, w2, h2),
    ]


@st.composite
def dataset(draw):
    n = draw(st.integers(1, 8))
    rows = [draw(geom()) for _ in range(n)]
    # duplicate-heavy option: stack a copy of row 0 (same geometry,
    # new id) to stress the reference-point dedup on identical shapes
    if n >= 2 and draw(st.booleans()):
        rows.append(rows[0])
    return rows


def _fmt(gt, parts):
    """WKT for all generated types; multi-forms are test-local because
    the flattened at-rest representation has no polygon grouping to
    invert in general (here each part IS one polygon/chain/point)."""
    if gt == "MULTIPOINT":
        return "MULTIPOINT (" + ", ".join(
            f"({p[0][0]} {p[0][1]})" for p in parts) + ")"
    if gt == "MULTILINESTRING":
        return "MULTILINESTRING (" + ", ".join(
            "(" + ", ".join(f"{x} {y}" for x, y in c) + ")" for c in parts
        ) + ")"
    if gt == "MULTIPOLYGON":
        return "MULTIPOLYGON (" + ", ".join(
            "((" + ", ".join(f"{x} {y}" for x, y in r) + "))" for r in parts
        ) + ")"
    return format_wkt(gt, parts)


def _write(path, rows):
    with open(path, "w") as f:
        f.write("id\twkt\n")
        for i, (gt, parts) in enumerate(rows):
            f.write(f"{i}\t{_fmt(gt, parts)}\n")


_POINTS_ONLY = [("POINT", [[[i / 16.0, (i * 3 % 7) / 16.0]]])
                for i in range(6)]
_BOXES = [("POLYGON", [[[0.0, 0.0], [4.0, 0.0], [4.0, 4.0], [0.0, 4.0],
                        [0.0, 0.0]]]),
          ("POLYGON", [[[-2.0, -2.0], [1.0, -2.0], [1.0, 1.0], [-2.0, 1.0],
                        [-2.0, -2.0]]])]
_STACKED = [("POINT", [[[0.25, 0.25]]])] * 4
# single holed polygon vs itself: vertex cost 10x10 > 64 engages the
# AUTO skew dispatcher with exactly ONE distinct target — the n-1
# sample-stddev divisor was 0 (ANSI DIVIDE_BY_ZERO, r11 fuzz find)
_HOLED = [("POLYGON", [_box_ring(0.0, 0.0, 0.1875, 0.1875),
                       _box_ring(0.0625, 0.0625, 0.0625, 0.0625)])]


def _brute_counts(src, tgt):
    want = {f"n_{r}": 0 for r in RELATIONS if r != "disjoint"}
    want["qualifying_pairs"] = 0
    for gs, ps in src:
        for gt_, pt_ in tgt:
            rel = relate_pair(gs, ps, gt_, pt_)
            if rel["intersects"]:
                want["qualifying_pairs"] += 1
            for r in RELATIONS:
                if r != "disjoint" and rel[r]:
                    want[f"n_{r}"] += 1
    return want


def _cfg(d, **kw):
    return JedaiConfig(
        source=DatasetSpec(path=str(d / "s.tsv"), id_field="id",
                           geom_field="wkt"),
        target=DatasetSpec(path=str(d / "t.tsv"), id_field="id",
                           geom_field="wkt"),
        **kw,
    )


def _shift(rows, dx, dy):
    """Translate every coordinate — offsets are lattice multiples so
    exactness (and the scaled-integer relate) is preserved."""
    return [
        (gt, [[[x + dx, y + dy] for x, y in part] for part in parts])
        for gt, parts in rows
    ]


@pytest.mark.usefixtures("spark")
@given(dataset(), dataset(),
       # wide-domain stress: far-from-origin and negative domains hit
       # the floor(x/theta) tile indices and the ref-point dedup at
       # realistic geographic magnitudes
       st.sampled_from([(0.0, 0.0), (4096.0, -4096.0),
                        (-4096.0, 4096.0), (262144.0, 262144.0)]))
# regression pins for the r11 degenerate-theta finds: an all-point
# source (avg extent 0 -> theta would be MIN_THETA and a 4-unit box
# would explode to ~1.6e19 tiles, executor OOM) and a zero-domain
# stacked source vs real-domain targets (the cross-dataset case
# floor_theta guards)
@example(src=_POINTS_ONLY, tgt=_BOXES, off=(0.0, 0.0))
@example(src=_STACKED, tgt=_BOXES, off=(0.0, 0.0))
@example(src=_HOLED, tgt=_HOLED, off=(0.0, 0.0))
@settings(max_examples=fuzz_examples(12), deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_de9im_counts_match_brute_force(spark, tmp_path_factory, src, tgt,
                                        off):
    d = tmp_path_factory.mktemp("fuzz")
    src, tgt = _shift(src, *off), _shift(tgt, *off)
    _write(d / "s.tsv", src)
    _write(d / "t.tsv", tgt)
    got = api.run(spark, _cfg(d, relation="DE9IM")).first().asDict()
    want = _brute_counts(src, tgt)
    got.pop("verifications")  # plan-dependent candidate count
    assert got == want, (src, tgt, got, want)


# Every non-default api.run route: the decomposed fine-envelope
# pre-filter, the sampled-quantile partitioned join, the forced
# skew-split verification join, and the single-relation pairs output.
# All are exact (conservative filters / plan-only changes), so each
# must reproduce the same brute force as the default route.
_PATHS = [
    {"relation": "DE9IM", "entity_type": "DECOMPOSED_ENTITY"},
    {"relation": "DE9IM", "grid_type": "KDBTREE", "partitions": 16},
    {"relation": "DE9IM", "extra": {"loadBalancer": "ON"}},
    {"relation": "TOUCHES"},
    {"relation": "WITHIN"},
    {"relation": "OVERLAPS"},
    {"relation": "CROSSES"},
    # theta modes: "min" collapses to 0 whenever ANY point row exists
    # (the domain/GRID_CAP floor is what keeps this from exploding)
    {"relation": "DE9IM", "theta_granularity": "min"},
    {"relation": "DE9IM", "theta_granularity": "max"},
    {"relation": "DE9IM", "theta_granularity": "avg2"},
]


@pytest.mark.usefixtures("spark")
@given(dataset(), dataset(), st.integers(0, len(_PATHS) - 1))
@example(src=_POINTS_ONLY, tgt=_BOXES, variant=1)  # degenerate theta,
@example(src=_STACKED, tgt=_BOXES, variant=0)      # non-default joins
# multipoint members are isolated vertices: fine_envelopes emitted no
# boxes for them and the decomposed pre-filter dropped true pairs
@example(src=[("POINT", [[[0.0, 0.0]]])],
         tgt=[("MULTIPOINT", [[[0.0, 0.0]], [[0.0, 0.0625]]])], variant=0)
@settings(max_examples=fuzz_examples(12), deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_variant_paths_match_brute_force(spark, tmp_path_factory, src,
                                         tgt, variant):
    d = tmp_path_factory.mktemp("fuzzv")
    _write(d / "s.tsv", src)
    _write(d / "t.tsv", tgt)
    kw = _PATHS[variant]
    out = api.run(spark, _cfg(d, **kw))
    want = _brute_counts(src, tgt)
    if kw["relation"] == "DE9IM":
        got = out.first().asDict()
        got.pop("verifications")
        assert got == want, (src, tgt, kw, got, want)
    else:
        rel = kw["relation"].lower()
        got_pairs = {(int(r.s_id), int(r.t_id)) for r in out.collect()}
        want_pairs = {
            (i, j)
            for i, (gs, ps) in enumerate(src)
            for j, (gt_, pt_) in enumerate(tgt)
            if relate_pair(gs, ps, gt_, pt_)[rel]
        }
        assert got_pairs == want_pairs, (src, tgt, rel, got_pairs,
                                         want_pairs)


@pytest.mark.parametrize("alg", [None, "PROGRESSIVE_GIANT", "TOPK",
                                 "RECIPROCAL_TOPK", "RANDOM",
                                 "DYNAMIC_PROGRESSIVE_GIANT",
                                 "EARLY_STOPPING"])
def test_empty_and_invalid_inputs_yield_zero(spark, tmp_path, alg):
    """Header-only and all-invalid-WKT inputs must produce a zero counts
    row on every route — the empty extent previously crashed
    _total_blocks (None/float TypeError) on the progressive routes."""
    _write(tmp_path / "s.tsv", [])
    _write(tmp_path / "t.tsv", _BOXES)
    with open(tmp_path / "s2.tsv", "w") as f:
        f.write("id\twkt\n0\tGARBAGE (1 2)\n1\tPOINT EMPTY\n")
    kw = {"progressive_algorithm": alg, "budget": 100} if alg else {}
    for src_name in ("s.tsv", "s2.tsv"):
        cfg = _cfg(tmp_path, relation="DE9IM", **kw)
        cfg.source.path = str(tmp_path / src_name)
        row = api.run(spark, cfg).first().asDict()
        assert row["qualifying_pairs"] == 0 and row["n_intersects"] == 0
    # empty TARGET side too
    cfg = _cfg(tmp_path, relation="DE9IM", **kw)
    cfg.source.path, cfg.target.path = cfg.target.path, cfg.source.path
    row = api.run(spark, cfg).first().asDict()
    assert row["qualifying_pairs"] == 0


def _write_dated(path, rows, days):
    with open(path, "w") as f:
        f.write("id\twkt\tdt\n")
        for i, (gt, parts) in enumerate(rows):
            f.write(f"{i}\t{_fmt(gt, parts)}\t"
                    f"2020-01-{days[i]:02d} 00:00:00\n")


@pytest.mark.usefixtures("spark")
@given(dataset(), dataset(), st.integers(0, 5), st.integers(0, 5))
@settings(max_examples=fuzz_examples(8), deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_spatiotemporal_counts_match_brute_force(
        spark, tmp_path_factory, src, tgt, sseed, tseed):
    """The spatio-temporal route: both sides dated, candidates must pass
    |datediff| < 2 days before verification (reference GiantExp's
    spatiotemporal qualifier)."""
    d = tmp_path_factory.mktemp("fuzzt")
    sdays = [(sseed + 3 * i) % 6 + 1 for i in range(len(src))]
    tdays = [(tseed + 2 * i) % 6 + 1 for i in range(len(tgt))]
    _write_dated(d / "s.tsv", src, sdays)
    _write_dated(d / "t.tsv", tgt, tdays)
    cfg = JedaiConfig(
        source=DatasetSpec(path=str(d / "s.tsv"), id_field="id",
                           geom_field="wkt", date_field="dt"),
        target=DatasetSpec(path=str(d / "t.tsv"), id_field="id",
                           geom_field="wkt", date_field="dt"),
        relation="DE9IM",
    )
    got = api.run(spark, cfg).first().asDict()
    got.pop("verifications")
    want = {f"n_{r}": 0 for r in RELATIONS if r != "disjoint"}
    want["qualifying_pairs"] = 0
    for i, (gs, ps) in enumerate(src):
        for j, (gt_, pt_) in enumerate(tgt):
            if abs(sdays[i] - tdays[j]) >= 2:
                continue
            rel = relate_pair(gs, ps, gt_, pt_)
            if rel["intersects"]:
                want["qualifying_pairs"] += 1
            for r in RELATIONS:
                if r != "disjoint" and rel[r]:
                    want[f"n_{r}"] += 1
    assert got == want, (src, tgt, sdays, tdays, got, want)


@pytest.mark.usefixtures("spark")
@given(dataset(), dataset(), st.booleans())
@settings(max_examples=fuzz_examples(6), deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_export_sinks_roundtrip_brute_force(spark, tmp_path_factory, src,
                                            tgt, rdf):
    """api.run's export wiring: DE9IM exports one GeoSPARQL triple per
    true relation flag per pair; single-relation exports a CSV pair
    file. Read the files back and compare against brute force."""
    import glob
    import re

    d = tmp_path_factory.mktemp("fuzzx")
    _write(d / "s.tsv", src)
    _write(d / "t.tsv", tgt)
    out = str(d / "out")
    if rdf:
        api.run(spark, _cfg(d, relation="DE9IM", export_path=out)).first()
        got = set()
        for f in glob.glob(out + "/part-*"):
            for line in open(f):
                m = re.match(
                    r"<(\d+)> <http://www\.opengis\.net/ont/geosparql#"
                    r"(?:sf|eh)(\w+)> <(\d+)> \.", line.strip())
                assert m, line
                got.add((int(m.group(1)), m.group(2).lower(),
                         int(m.group(3))))
        want = {
            (i, r, j)
            for i, (gs, ps) in enumerate(src)
            for j, (gt_, pt_) in enumerate(tgt)
            for r, v in relate_pair(gs, ps, gt_, pt_).items()
            if v and r != "disjoint"
        }
    else:
        api.run(spark, _cfg(d, relation="INTERSECTS",
                            export_path=out)).count()
        got = set()
        for f in glob.glob(out + "/part-*.csv"):
            lines = open(f).read().splitlines()
            for line in lines:
                if line == "s_id,t_id":
                    continue
                a, b = line.split(",")
                got.add((int(a), int(b)))
        want = {
            (i, j)
            for i, (gs, ps) in enumerate(src)
            for j, (gt_, pt_) in enumerate(tgt)
            if relate_pair(gs, ps, gt_, pt_)["intersects"]
        }
    assert got == want, (src, tgt, rdf, got, want)


def _geojson_geom(gt, parts):
    if gt == "POINT":
        return {"type": "Point", "coordinates": parts[0][0]}
    if gt == "LINESTRING":
        return {"type": "LineString", "coordinates": parts[0]}
    if gt == "POLYGON":
        return {"type": "Polygon", "coordinates": parts}
    if gt == "MULTIPOINT":
        return {"type": "MultiPoint", "coordinates": [p[0] for p in parts]}
    if gt == "MULTILINESTRING":
        return {"type": "MultiLineString", "coordinates": parts}
    if gt == "MULTIPOLYGON":  # generator emits one ring per polygon
        return {"type": "MultiPolygon", "coordinates": [[r] for r in parts]}
    raise AssertionError(gt)


def _write_geojson(path, rows):
    import json

    with open(path, "w") as f:
        for i, (gt, parts) in enumerate(rows):
            f.write(json.dumps({
                "type": "Feature", "geometry": _geojson_geom(gt, parts),
                "properties": {"id": i},
            }) + "\n")


def _write_nt(path, rows):
    with open(path, "w") as f:
        for i, (gt, parts) in enumerate(rows):
            f.write(f"<urn:g:{i}> "
                    "<http://www.opengis.net/ont/geosparql#asWKT> "
                    f'"{_fmt(gt, parts)}" .\n')


@pytest.mark.usefixtures("spark")
@given(dataset(), dataset())
@settings(max_examples=fuzz_examples(6), deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_geojson_and_ntriples_readers_match_brute_force(
        spark, tmp_path_factory, src, tgt):
    """Same brute-force law through the OTHER ingestion formats: GeoJSON
    feature lines on the source side, RDF N-Triples on the target side
    (api.read_dataset extension dispatch)."""
    d = tmp_path_factory.mktemp("fuzzr")
    _write_geojson(d / "s.geojson", src)
    _write_nt(d / "t.nt", tgt)
    cfg = JedaiConfig(
        source=DatasetSpec(path=str(d / "s.geojson"), id_field="id",
                           geom_field="geometry"),
        target=DatasetSpec(path=str(d / "t.nt"), id_field="id",
                           geom_field="wkt"),
        relation="DE9IM",
    )
    got = api.run(spark, cfg).first().asDict()
    want = _brute_counts(src, tgt)
    got.pop("verifications")
    assert got == want, (src, tgt, got, want)


def _write_wkb_parquet(path, rows):
    """GeoParquet-shaped file: binary WKB `geometry` + `geo` footer
    metadata (format_wkb is the engine's sink-side mirror; parse_wkb is
    what the reader exercises)."""
    import json

    import pyarrow as pa
    import pyarrow.parquet as pq

    from ds_jedai_spark.model.geometry import format_wkb

    table = pa.table({
        "id": pa.array([str(i) for i in range(len(rows))], pa.string()),
        "geometry": pa.array(
            [format_wkb(gt, parts) for gt, parts in rows], pa.binary()
        ),
    }).replace_schema_metadata({
        b"geo": json.dumps({"version": "1.0.0",
                            "primary_column": "geometry"}).encode()
    })
    pq.write_table(table, str(path))


@pytest.mark.usefixtures("spark")
@given(dataset(), dataset())
@settings(max_examples=fuzz_examples(6), deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_wkb_parquet_reader_matches_brute_force(
        spark, tmp_path_factory, src, tgt):
    """Same brute-force law through the GeoParquet/WKB ingestion path
    (r12): binary WKB geometry on the source side, auto-detected from
    the geo footer metadata (geom_field deliberately left at a name the
    file lacks); WKT TSV on the target side."""
    d = tmp_path_factory.mktemp("fuzzw")
    _write_wkb_parquet(d / "s.parquet", src)
    _write(d / "t.tsv", tgt)
    cfg = JedaiConfig(
        source=DatasetSpec(path=str(d / "s.parquet"), id_field="id",
                           geom_field="wkt"),
        target=DatasetSpec(path=str(d / "t.tsv"), id_field="id",
                           geom_field="wkt"),
        relation="DE9IM",
    )
    got = api.run(spark, cfg).first().asDict()
    want = _brute_counts(src, tgt)
    got.pop("verifications")
    assert got == want, (src, tgt, got, want)


@pytest.mark.usefixtures("spark")
@given(dataset(), dataset())
@settings(max_examples=fuzz_examples(5), deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_early_stopping_is_subset_of_brute_force(spark, tmp_path_factory,
                                                 src, tgt):
    """EARLY_STOPPING may legitimately stop short, so the law is weaker:
    every count must be <= brute force, and with <= one batch of
    candidates (batch_size 100 > 9x9) nothing can be cut, so counts are
    exactly brute force."""
    d = tmp_path_factory.mktemp("fuzze")
    _write(d / "s.tsv", src)
    _write(d / "t.tsv", tgt)
    got = api.run(spark, _cfg(
        d, relation="DE9IM", progressive_algorithm="EARLY_STOPPING",
    )).first().asDict()
    want = _brute_counts(src, tgt)
    got.pop("verifications")
    assert got == want, (src, tgt, got, want)


# Progressive algorithms are budget-bounded SUBSET selectors; with a
# budget (or per-entity k) at least the candidate count they must
# degenerate to full verification. EARLY_STOPPING is excluded — it may
# legitimately stop short by design. Budget 200000 also exercises the
# LARGE_BUDGET local-budget dispatch (api.LARGE_BUDGET = 100000).
_PROG = [
    ("PROGRESSIVE_GIANT", 50_000),
    ("PROGRESSIVE_GIANT", 200_000),  # local_budget_top dispatch
    ("TOPK", 50_000),
    ("RECIPROCAL_TOPK", 50_000),
    ("RANDOM", 50_000),
    ("DYNAMIC_PROGRESSIVE_GIANT", 50_000),
]


@pytest.mark.usefixtures("spark")
@given(dataset(), dataset(), st.integers(0, len(_PROG) - 1))
@settings(max_examples=fuzz_examples(10), deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_progressive_full_budget_is_full_verification(
        spark, tmp_path_factory, src, tgt, variant):
    d = tmp_path_factory.mktemp("fuzzp")
    _write(d / "s.tsv", src)
    _write(d / "t.tsv", tgt)
    alg, budget = _PROG[variant]
    got = api.run(spark, _cfg(
        d, relation="DE9IM", progressive_algorithm=alg, budget=budget,
    )).first().asDict()
    want = _brute_counts(src, tgt)
    got.pop("verifications")
    assert got == want, (src, tgt, alg, got, want)
