"""Decomposition invariants — the reference's DecompositionTest pattern:
decomposition preserves length (lines) and area (polygons, incl. holes);
refined envelopes cover the geometry and tile the original envelope."""

import math

import pytest

from ds_jedai_spark.operators.decompose import (
    decompose_line,
    decompose_polygon,
    fine_envelopes,
    polygon_area,
    seg_slice_envelope_exprs,
)

DELTA = 1e-9


def length(parts):
    return sum(
        math.dist(p, q) for part in parts for p, q in zip(part, part[1:])
    )


LINES = [
    [[(0.0, 0.0), (10.0, 0.0)]],
    [[(0.2, 0.3), (3.7, 5.1), (9.9, 2.2)]],
    [[(-2.5, -1.5), (4.5, 3.25), (4.5, 9.0), (-1.0, 9.0)]],
    [[(0.0, 0.0), (0.0, 7.3)], [(1.1, 1.1), (8.8, 8.8)]],
]


@pytest.mark.parametrize("parts", LINES)
@pytest.mark.parametrize("theta", [(1.0, 1.0), (2.5, 0.75)])
def test_line_decomposition_preserves_length(parts, theta):
    pieces = decompose_line(parts, theta)
    assert abs(length(parts) - length([p for p in pieces])) < DELTA
    # every piece fits inside one tile (allowing boundary contact)
    for piece in pieces:
        xs = [p[0] for p in piece]
        ys = [p[1] for p in piece]
        assert max(xs) - min(xs) <= theta[0] + DELTA
        assert max(ys) - min(ys) <= theta[1] + DELTA


SQUARE = [[(0.0, 0.0), (8.0, 0.0), (8.0, 8.0), (0.0, 8.0), (0.0, 0.0)]]
TRIANGLE = [[(0.0, 0.0), (9.0, 1.0), (4.0, 7.0), (0.0, 0.0)]]
L_SHAPE = [[(0.0, 0.0), (6.0, 0.0), (6.0, 2.0), (2.0, 2.0), (2.0, 6.0),
            (0.0, 6.0), (0.0, 0.0)]]
HOLED = [
    [(0.0, 0.0), (10.0, 0.0), (10.0, 10.0), (0.0, 10.0), (0.0, 0.0)],
    [(3.0, 3.0), (3.0, 6.0), (6.0, 6.0), (6.0, 3.0), (3.0, 3.0)],
]


@pytest.mark.parametrize("rings", [SQUARE, TRIANGLE, L_SHAPE, HOLED])
@pytest.mark.parametrize("theta", [(2.0, 2.0), (3.5, 1.5)])
def test_polygon_decomposition_preserves_area(rings, theta):
    pieces = decompose_polygon(rings, theta)
    total = sum(polygon_area(piece) for piece in pieces)
    assert abs(total - polygon_area(rings)) < 1e-6
    for piece in pieces:
        xs = [p[0] for r in piece for p in r]
        ys = [p[1] for r in piece for p in r]
        assert max(xs) - min(xs) <= theta[0] + DELTA
        assert max(ys) - min(ys) <= theta[1] + DELTA


@pytest.mark.parametrize("parts", LINES)
def test_fine_envelopes_cover_vertices(parts):
    envs = fine_envelopes("LINESTRING", parts, k=4)
    assert 1 <= len(envs) <= 4
    for part in parts:
        for x, y in part:
            assert any(
                e[0] - DELTA <= x <= e[2] + DELTA and e[1] - DELTA <= y <= e[3] + DELTA
                for e in envs
            )


def test_fine_envelopes_tighter_than_mbr():
    # Diagonal segment: 4 slice boxes each 1/16 the MBR area.
    envs = fine_envelopes("LINESTRING", [[(0.0, 0.0), (8.0, 8.0)]], k=4)
    assert len(envs) == 4
    total = sum((e[2] - e[0]) * (e[3] - e[1]) for e in envs)
    assert total == pytest.approx(4 * 4.0)  # vs 64 for the MBR


def test_seg_slice_exprs_match_python(spark):
    rows = [(0.0, 0.0, 8.0, 4.0), (5.0, 7.0, 1.0, -3.0)]
    df = spark.createDataFrame(rows, ["x1", "y1", "x2", "y2"])
    exprs = seg_slice_envelope_exprs("", k=4)
    sel = []
    for i, e in enumerate(exprs):
        for c in ("minx", "miny", "maxx", "maxy"):
            sel.append(f"{e[c]} AS b{i}_{c}")
    got = df.selectExpr("x1", "y1", *sel).collect()
    for (x1, y1, x2, y2), r in zip(rows, got):
        for i in range(4):
            t0, t1 = i / 4, (i + 1) / 4
            px = sorted([x1 + (x2 - x1) * t0, x1 + (x2 - x1) * t1])
            py = sorted([y1 + (y2 - y1) * t0, y1 + (y2 - y1) * t1])
            assert r[f"b{i}_minx"] == px[0] and r[f"b{i}_maxx"] == px[1]
            assert r[f"b{i}_miny"] == py[0] and r[f"b{i}_maxy"] == py[1]
