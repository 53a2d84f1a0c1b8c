"""MULTIPOLYGON ring regrouping: exact nesting, not bbox heuristics.

The row format flattens multipolygon rings (shell first per polygon);
OGC-structured sinks (format_wkb, geojson_lines) must recover the
per-polygon grouping. r12 judging reproduced two bbox-heuristic
mis-nestings — a sibling in a U-shaped shell's notch and an island
inside a hole — both serialized as phantom holes. The regrouper now
uses the exact scaled-integer locator; this suite pins the two
exhibits and a seeded recursive generator with grouping known by
construction (depth parity: even = shell, odd = hole of its parent).
No Spark needed — pure geometry."""

from __future__ import annotations

import random

from ds_jedai_spark.model.geometry import (
    format_wkb,
    parse_wkb,
    regroup_rings,
)

U_SHELL = [[0, 0], [10, 0], [10, 10], [7, 10], [7, 3], [3, 3], [3, 10],
           [0, 10], [0, 0]]
NOTCH_SQ = [[4, 5], [6, 5], [6, 7], [4, 7], [4, 5]]
SHELL = [[0, 0], [20, 0], [20, 20], [0, 20], [0, 0]]
HOLE = [[5, 5], [15, 5], [15, 15], [5, 15], [5, 5]]
ISLAND = [[8, 8], [12, 8], [12, 12], [8, 12], [8, 8]]


def _f(rings):
    return [[[float(x), float(y)] for x, y in r] for r in rings]


def test_notch_sibling_is_new_polygon():
    # bbox of the square is inside the U shell's bbox, but the square
    # sits in the notch — OUTSIDE the U region: two polygons, no holes.
    assert regroup_rings(_f([U_SHELL, NOTCH_SQ])) == [
        _f([U_SHELL]), _f([NOTCH_SQ])
    ]


def test_island_in_hole_is_new_polygon():
    got = regroup_rings(_f([SHELL, HOLE, ISLAND]))
    assert got == [_f([SHELL, HOLE]), _f([ISLAND])]


def test_plain_hole_stays_hole():
    assert regroup_rings(_f([SHELL, HOLE])) == [_f([SHELL, HOLE])]


def test_wkb_groups_survive_external_structure():
    """The written WKB carries the regrouped structure: re-parse at the
    struct level (not via parse_wkb, which re-flattens) and check the
    polygon count + rings-per-polygon."""
    import struct

    wkb = format_wkb("MULTIPOLYGON", _f([SHELL, HOLE, ISLAND]))
    assert wkb[0] == 1
    (t, npolys) = struct.unpack_from("<II", wkb, 1)
    assert (t, npolys) == (6, 2)
    off = 9
    rings_per = []
    for _ in range(npolys):
        assert wkb[off] == 1
        (pt, nr) = struct.unpack_from("<II", wkb, off + 1)
        assert pt == 3
        off += 9
        rings_per.append(nr)
        for _ in range(nr):
            (n,) = struct.unpack_from("<I", wkb, off)
            off += 4 + 16 * n
    assert rings_per == [2, 1]
    assert off == len(wkb)
    # and the engine's own read-back still flattens to the same rings
    assert parse_wkb(wkb) == ("MULTIPOLYGON", _f([SHELL, HOLE, ISLAND]))


def _square(cx: float, cy: float, r: float):
    return [[cx - r, cy - r], [cx + r, cy - r], [cx + r, cy + r],
            [cx - r, cy + r], [cx - r, cy - r]]


def _ushape(cx: float, cy: float, r: float):
    """Non-convex U: bbox [cx±r, cy±r], notch open at the top covering
    the middle half — anything in the notch is inside the bbox but
    outside the region."""
    w = r / 2
    return [[cx - r, cy - r], [cx + r, cy - r], [cx + r, cy + r],
            [cx + w, cy + r], [cx + w, cy - w], [cx - w, cy - w],
            [cx - w, cy + r], [cx - r, cy + r], [cx - r, cy - r]]


def _gen_scene(rng: random.Random):
    """Random nested scene with grouping known by construction.

    Recursive: each region is a lattice square or U-shape; children are
    placed strictly inside (for squares / the solid part of Us) and get
    the opposite role (shell <-> hole). U-shapes additionally spawn a
    NOTCH SIBLING — inside the bbox, outside the region — which must
    start a new polygon. Returns (flattened_parts, expected_groups).
    All coordinates are multiples of 1/16."""
    parts: list = []
    groups: list = []

    def emit_polygon(cx, cy, r, depth):
        use_u = rng.random() < 0.4
        shell = _ushape(cx, cy, r) if use_u else _square(cx, cy, r)
        group = [_f([shell])[0]]
        parts.append(group[0])
        pending: list = []  # (cx, cy, r) of islands to emit after
        if not use_u and r >= 1.0 and rng.random() < 0.8:
            # hole strictly inside the square shell
            hr = r / 2
            hole = _f([_square(cx, cy, hr)])[0]
            group.append(hole)
            parts.append(hole)
            if hr >= 1.0 and depth < 3 and rng.random() < 0.7:
                pending.append((cx, cy, hr / 2))  # island inside the hole
        groups.append(group)
        for (icx, icy, ir) in pending:
            emit_polygon(icx, icy, ir, depth + 1)
        if use_u and rng.random() < 0.8:
            # sibling in the notch: bbox-nested, region-disjoint
            emit_polygon(cx, cy + r / 2, r / 8, depth + 1)

    n_roots = rng.randint(1, 3)
    for i in range(n_roots):
        cx = 64.0 * i + rng.randrange(0, 16)
        cy = float(rng.randrange(0, 16))
        emit_polygon(cx, cy, float(rng.choice([4, 8, 16])), 0)
    return parts, groups


def test_seeded_nesting_property():
    rng = random.Random(1302)
    for _ in range(300):
        parts, expected = _gen_scene(rng)
        assert regroup_rings(parts) == expected
        # and the full WKB round trip preserves the flattened rings
        assert parse_wkb(format_wkb("MULTIPOLYGON", parts)) == (
            "MULTIPOLYGON", parts
        )
