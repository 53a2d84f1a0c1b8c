"""Geometry parsing & representation without a geometry library.

The reference parses WKT with JTS (reference:
src/main/scala/utils/readers/Reader.scala:85-112) and drops empty /
invalid / GeometryCollection rows (Reader.scala:59-61). This environment
has no shapely/JTS, so the engine ships a small from-scratch WKT parser
running inside Arrow-batched pandas UDFs.

Representation at rest (the engine's row format):
    gtype  : string — POINT | LINESTRING | POLYGON | MULTI* variants
    coords : array<array<array<double>>> — parts × points × [x, y]
             (POINT: 1 part, 1 point; POLYGON: rings as parts;
              MULTIPOLYGON: flattened ring list with ring-starts encoded
              by part boundaries — outer ring first per polygon)
    minx, miny, maxx, maxy : double — cached envelope (the columns every
             join/filter in the engine runs on; the wide coords column
             stays behind until exact verification needs it)

Structural validity (stand-in for JTS isValid): finite coordinates,
LINESTRING >= 2 points, polygon rings closed with >= 4 points.
"""

from __future__ import annotations

import re
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

GEOM_FIELDS = "gtype string, coords array<array<array<double>>>, minx double, miny double, maxx double, maxy double"

_NUM = re.compile(r"[-+]?\d*\.?\d+(?:[eE][-+]?\d+)?")


def _parse_ring_text(txt: str) -> list[list[float]] | None:
    pts = []
    for pair in txt.split(","):
        nums = _NUM.findall(pair)
        if len(nums) < 2:
            return None
        x, y = float(nums[0]), float(nums[1])
        if not (np.isfinite(x) and np.isfinite(y)):
            return None
        pts.append([x, y])
    return pts


def _split_top(s: str) -> list[str]:
    """Split a parenthesized group list at depth 0 commas."""
    out, depth, cur = [], 0, []
    for ch in s:
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        if ch == "," and depth == 0:
            out.append("".join(cur))
            cur = []
        else:
            cur.append(ch)
    if cur:
        out.append("".join(cur))
    return out


def parse_wkt(s: str) -> tuple[str, list[list[list[float]]]] | None:
    """Parse WKT → (gtype, parts). None for malformed/empty/unsupported."""
    if s is None:
        return None
    s = s.strip()
    m = re.match(r"^([A-Za-z]+)\s*(.*)$", s, re.S)
    if not m:
        return None
    gtype = m.group(1).upper()
    body = m.group(2).strip()
    if body.upper() == "EMPTY" or not body:
        return None
    if gtype == "GEOMETRYCOLLECTION":
        return None  # dropped at load, like the reference
    if not (body.startswith("(") and body.endswith(")")):
        return None
    inner = body[1:-1]
    try:
        if gtype == "POINT":
            pts = _parse_ring_text(inner)
            if not pts or len(pts) != 1:
                return None
            return gtype, [pts]
        if gtype == "LINESTRING":
            pts = _parse_ring_text(inner)
            if not pts or len(pts) < 2:
                return None
            return gtype, [pts]
        if gtype == "MULTIPOINT":
            parts = []
            for g in _split_top(inner):
                pts = _parse_ring_text(g.strip().strip("()"))
                if not pts:
                    return None
                parts.append(pts)
            return gtype, parts
        if gtype in ("POLYGON", "MULTILINESTRING"):
            parts = []
            for g in _split_top(inner):
                g = g.strip()
                if not (g.startswith("(") and g.endswith(")")):
                    return None
                pts = _parse_ring_text(g[1:-1])
                if pts is None:
                    return None
                if gtype == "POLYGON":
                    if len(pts) < 4 or pts[0] != pts[-1]:
                        return None
                elif len(pts) < 2:
                    return None
                parts.append(pts)
            return (gtype, parts) if parts else None
        if gtype == "MULTIPOLYGON":
            parts = []
            for poly in _split_top(inner):
                poly = poly.strip()
                if not (poly.startswith("(") and poly.endswith(")")):
                    return None
                for ring in _split_top(poly[1:-1]):
                    ring = ring.strip()
                    if not (ring.startswith("(") and ring.endswith(")")):
                        return None
                    pts = _parse_ring_text(ring[1:-1])
                    if pts is None or len(pts) < 4 or pts[0] != pts[-1]:
                        return None
                    parts.append(pts)
            return (gtype, parts) if parts else None
    except (ValueError, IndexError):
        return None
    return None


# --- WKB (GeoParquet's at-rest geometry encoding) ---------------------
#
# The reference era ingested binary geometry via Sedona's readers
# (reference utils/readers/Reader.scala:85-168); the modern equivalent
# surface is GeoParquet, whose geometry column is ISO/EWKB binary. The
# parser mirrors parse_wkt's contract exactly: same (gtype, parts)
# output, same validity rules, None for malformed/empty/collection.

_WKB_BASE_TYPES = {
    1: "POINT", 2: "LINESTRING", 3: "POLYGON",
    4: "MULTIPOINT", 5: "MULTILINESTRING", 6: "MULTIPOLYGON",
    7: "GEOMETRYCOLLECTION",
}


def _wkb_header(buf: bytes, off: int) -> tuple[str, int, int, int]:
    """Read (endianness, base type, extra-dims-per-point, new offset).
    Handles ISO WKB (type + 1000/2000/3000 for Z/M/ZM) and EWKB flag
    bits (0x80000000 Z, 0x40000000 M, 0x20000000 embedded SRID)."""
    import struct

    bo = buf[off]
    if bo not in (0, 1):
        raise ValueError("bad byte order")
    e = "<" if bo == 1 else ">"
    (t,) = struct.unpack_from(e + "I", buf, off + 1)
    off += 5
    extra = int(bool(t & 0x80000000)) + int(bool(t & 0x40000000))
    if t & 0x20000000:  # EWKB SRID: 4 bytes to skip
        off += 4
    t &= 0x1FFFFFFF
    iso, base = divmod(t, 1000)
    if iso in (1, 2):
        extra += 1
    elif iso == 3:
        extra += 2
    elif iso != 0:
        raise ValueError("bad ISO dimension code")
    return e, base, extra, off


def _wkb_points(
    buf: bytes, e: str, extra: int, n: int, off: int
) -> tuple[list[list[float]], int]:
    import struct

    dim = 2 + extra
    # Bound-check BEFORE building the unpack format: a crafted count
    # (e.g. 2^32-1 points) would otherwise allocate a multi-GB format
    # string ahead of struct's own buffer check — an ingestion path fed
    # untrusted files must fail on the 4-byte count, not on memory.
    if off + 8 * dim * n > len(buf):
        raise ValueError("truncated WKB point array")
    vals = struct.unpack_from(e + "d" * (dim * n), buf, off)
    pts = [[vals[i * dim], vals[i * dim + 1]] for i in range(n)]
    if not all(np.isfinite(p[0]) and np.isfinite(p[1]) for p in pts):
        raise ValueError("non-finite coordinate")
    return pts, off + 8 * dim * n


def _wkb_count(buf: bytes, e: str, off: int) -> tuple[int, int]:
    import struct

    (n,) = struct.unpack_from(e + "I", buf, off)
    return n, off + 4


def _parse_wkb_geom(
    buf: bytes, off: int
) -> tuple[str | None, list[list[list[float]]], int]:
    """One geometry (recursive for MULTI*); (None, [], off) marks a
    structurally-sound but engine-invalid geometry (empty, open ring,
    collection) so the caller can still resync — malformed bytes raise."""
    e, base, extra, off = _wkb_header(buf, off)
    name = _WKB_BASE_TYPES.get(base)
    if name is None:
        raise ValueError(f"unknown WKB type {base}")
    if base == 1:  # POINT: bare coords, no count
        try:
            pts, off = _wkb_points(buf, e, extra, 1, off)
        except ValueError:
            # NaN-coordinate point = the WKB "POINT EMPTY" convention:
            # consume and drop, like WKT EMPTY
            off += 8 * (2 + extra)
            return None, [], off
        return name, [pts], off
    if base == 2:  # LINESTRING
        n, off = _wkb_count(buf, e, off)
        pts, off = _wkb_points(buf, e, extra, n, off)
        return (name, [pts], off) if n >= 2 else (None, [], off)
    if base == 3:  # POLYGON: rings as parts
        nr, off = _wkb_count(buf, e, off)
        rings = []
        ok = nr > 0
        for _ in range(nr):
            n, off = _wkb_count(buf, e, off)
            pts, off = _wkb_points(buf, e, extra, n, off)
            if len(pts) < 4 or pts[0] != pts[-1]:
                ok = False
            rings.append(pts)
        return (name, rings, off) if ok else (None, [], off)
    if base == 7:  # collection: dropped at load, like the reference
        n, off = _wkb_count(buf, e, off)
        for _ in range(n):
            _, _, off = _parse_wkb_geom(buf, off)
        return None, [], off
    # MULTI*: each member is a full nested WKB geometry
    n, off = _wkb_count(buf, e, off)
    member = {"MULTIPOINT": "POINT", "MULTILINESTRING": "LINESTRING",
              "MULTIPOLYGON": "POLYGON"}[name]
    parts: list[list[list[float]]] = []
    ok = n > 0
    for _ in range(n):
        g, sub, off = _parse_wkb_geom(buf, off)
        if g != member:
            ok = False
        parts.extend(sub)
    return (name, parts, off) if ok and parts else (None, [], off)


def parse_wkb(buf) -> tuple[str, list[list[list[float]]]] | None:
    """Parse WKB bytes → (gtype, parts); None for malformed / empty /
    unsupported — the exact contract of parse_wkt, so both geometry
    encodings land in the identical row format."""
    if buf is None:
        return None
    try:
        b = bytes(buf)
        gtype, parts, off = _parse_wkb_geom(b, 0)
        if gtype is None or off != len(b):
            return None
        return gtype, parts
    except Exception:
        return None


def format_wkb(gtype: str, parts: list[list[list[float]]]) -> bytes:
    """Serialize the row format to little-endian ISO WKB 2D (the
    GeoParquet default encoding) — the sink-side mirror of parse_wkb,
    also used to generate test fixtures."""
    import struct

    codes = {v: k for k, v in _WKB_BASE_TYPES.items()}

    def pts(seq):
        return b"".join(struct.pack("<dd", x, y) for x, y in seq)

    def simple(code, body):
        return struct.pack("<BI", 1, code) + body

    if gtype == "POINT":
        return simple(1, pts(parts[0]))
    if gtype == "LINESTRING":
        return simple(2, struct.pack("<I", len(parts[0])) + pts(parts[0]))
    if gtype == "POLYGON":
        body = struct.pack("<I", len(parts))
        for ring in parts:
            body += struct.pack("<I", len(ring)) + pts(ring)
        return simple(3, body)
    if gtype == "MULTIPOINT":
        body = struct.pack("<I", len(parts))
        for part in parts:
            body += simple(1, pts(part))
        return simple(4, body)
    if gtype == "MULTILINESTRING":
        body = struct.pack("<I", len(parts))
        for part in parts:
            body += simple(2, struct.pack("<I", len(part)) + pts(part))
        return simple(5, body)
    if gtype == "MULTIPOLYGON":
        polys = regroup_rings(parts)
        body = struct.pack("<I", len(polys))
        for rings in polys:
            pbody = struct.pack("<I", len(rings))
            for ring in rings:
                pbody += struct.pack("<I", len(ring)) + pts(ring)
            body += simple(3, pbody)
        return simple(6, body)
    raise ValueError(f"format_wkb: unsupported {gtype}")


def regroup_rings(
    parts: list[list[list[float]]],
) -> list[list[list[list[float]]]]:
    """Re-group a flattened MULTIPOLYGON ring list into per-polygon ring
    groups (shell first), for OGC-structured sinks (WKB, GeoJSON).

    The row format stores rings flattened in original order (shell, its
    holes, next shell, ...; model docstring above), so grouping is
    sequential: a ring joins the CURRENT polygon as a hole iff a
    representative point of it is INTERIOR to that polygon's region —
    even-odd over the rings grouped so far, decided by the exact
    scaled-integer locator (operators/relate_poly.point_location), never
    a bbox heuristic. Testing the accumulated region (not the shell
    alone) makes the two adversarial shapes group right: an island
    inside a hole reads even-odd EXTERIOR (inside shell, inside hole) →
    new polygon; a sibling nested in a U-shaped shell's bbox but outside
    its region reads exterior → new polygon.
    """
    from ds_jedai_spark.operators.relate_poly import (
        _rings,
        _scale_parts,
        point_location,
    )

    polys: list[list[list[list[float]]]] = []
    for ring in parts:
        if polys:
            sring, spoly = _scale_parts([ring], polys[-1])
            region = _rings(spoly)
            # Probe vertices until one is off the region boundary; a
            # ring whose every vertex sits ON the boundary (degenerate
            # seam contact) falls back to the first edge's midpoint.
            probes = [(x, y, 1) for x, y in sring[0]]
            a = sring[0][0]
            for b in sring[0][1:]:
                if b != a:
                    probes.append((a[0] + b[0], a[1] + b[1], 2))
                    break
            loc = 1
            for p in probes:
                loc = point_location(p, region)
                if loc != 1:
                    break
            if loc == 2:
                polys[-1].append(ring)
                continue
        polys.append([ring])
    return polys


def parse_geom_text(s: str) -> tuple[str, list[list[list[float]]]] | None:
    """Parse a geometry TEXT cell: WKT, or hex-encoded WKB (the PostGIS
    ``COPY``/``geometry::text`` export format, optionally ``\\x``/``0x``
    prefixed). Unambiguous dispatch: hex WKB begins with the endian
    byte's hex ('00'/'01'); WKT begins with a letter. Same contract as
    parse_wkt — None for malformed/empty/collection."""
    if s is None:
        return None
    t = s.strip()
    if t[:2] in ("\\x", "\\X", "0x", "0X"):
        t = t[2:]
    if t[:2] in ("00", "01"):
        try:
            return parse_wkb(bytes.fromhex(t))
        except ValueError:
            return None
    return parse_wkt(s)


def flatten_collection_wkt(s: str) -> list[str]:
    """Split a GEOMETRYCOLLECTION into member WKTs (reference
    utils/geometryUtils/GeometryUtils.scala:26-37 flattens members and
    propagates userData). Non-collections return themselves; nested
    collections flatten recursively."""
    if s is None:
        return []
    txt = s.strip()
    m = re.match(r"^GEOMETRYCOLLECTION\s*\((.*)\)$", txt, re.S | re.I)
    if not m:
        return [txt]
    out: list[str] = []
    for member in _split_top(m.group(1)):
        out.extend(flatten_collection_wkt(member.strip()))
    return out


def snap_precision(
    parts: list[list[list[float]]], scale: float = 1e11
) -> list[list[list[float]]]:
    """Pointwise grid snap — the reference's GeometryPrecisionReducer at
    scale 1e11 (utils/geometryUtils/GeometryUtils.scala:18-24)."""
    return [
        [[round(x * scale) / scale, round(y * scale) / scale] for x, y in part]
        for part in parts
    ]


def format_wkt(gtype: str, parts: list[list[list[float]]]) -> str:
    def ring(pts):
        return ", ".join(f"{x} {y}" for x, y in pts)

    if gtype == "POINT":
        return f"POINT ({ring(parts[0])})"
    if gtype == "LINESTRING":
        return f"LINESTRING ({ring(parts[0])})"
    if gtype == "POLYGON":
        return "POLYGON (" + ", ".join(f"({ring(p)})" for p in parts) + ")"
    raise ValueError(f"format_wkt: unsupported {gtype}")


def _envelope(parts: list[list[list[float]]]) -> tuple[float, float, float, float]:
    arr = np.array([pt for part in parts for pt in part], dtype=float)
    return float(arr[:, 0].min()), float(arr[:, 1].min()), float(arr[:, 0].max()), float(arr[:, 1].max())


class GeometryAccumulator:
    """Flat-buffer accumulator for parsed geometries, assembled into
    arrow arrays at batch end — the shared transport core of every
    Arrow-native reader (no per-row nested Python lists ever reach
    pandas/Arrow conversion). Usage per batch: ``add(gtype, parts)`` or
    ``add_invalid()`` per row, then ``arrays()``."""

    def __init__(self, n: int):
        self.n = n
        self.i = 0
        self.gtypes: list[str | None] = []
        self.flat: list[float] = []
        self.o1 = np.zeros(n + 1, dtype=np.int32)
        self.o2: list[int] = [0]
        self.valid = np.zeros(n, dtype=bool)

    def add_invalid(self) -> None:
        self.gtypes.append(None)
        self.o1[self.i + 1] = self.o1[self.i]
        self.i += 1

    def add(self, gtype: str, parts) -> None:
        self.gtypes.append(gtype)
        self.valid[self.i] = True
        for part in parts:
            for p in part:
                self.flat += [float(p[0]), float(p[1])]
            self.o2.append(self.o2[-1] + len(part))
        self.o1[self.i + 1] = self.o1[self.i] + len(parts)
        self.i += 1

    def arrays(self):
        """(gtype, coords, minx, miny, maxx, maxy) arrow arrays."""
        import pyarrow as pa

        assert self.i == self.n
        vals = np.asarray(self.flat, dtype=np.float64)
        npts = len(vals) // 2
        xs, ys = vals[0::2], vals[1::2]
        # Per-row envelopes: valid rows tile the flat point range
        # contiguously, so reduceat over their start offsets is exact.
        env = {k: np.full(self.n, np.nan) for k in ("minx", "miny", "maxx", "maxy")}
        vrows = np.nonzero(self.valid)[0]
        if len(vrows):
            o2a = np.asarray(self.o2, dtype=np.int64)
            starts = o2a[self.o1[vrows]]
            env["minx"][vrows] = np.minimum.reduceat(xs, starts)
            env["miny"][vrows] = np.minimum.reduceat(ys, starts)
            env["maxx"][vrows] = np.maximum.reduceat(xs, starts)
            env["maxy"][vrows] = np.maximum.reduceat(ys, starts)
        pts = pa.ListArray.from_arrays(
            pa.array(np.arange(npts + 1, dtype=np.int32) * 2), pa.array(vals)
        )
        parts_arr = pa.ListArray.from_arrays(
            pa.array(np.asarray(self.o2, dtype=np.int32)), pts
        )
        coords = pa.ListArray.from_arrays(pa.array(self.o1), parts_arr)
        mask = ~self.valid
        out = [pa.array(self.gtypes, pa.string()), coords]
        for k in ("minx", "miny", "maxx", "maxy"):
            out.append(pa.array(env[k], pa.float64(), mask=mask))
        return out


def with_parsed_geometry(df: DataFrame, wkt_col: str = "wkt") -> DataFrame:
    """Append (gtype, coords, minx..maxy); rows failing to parse are kept
    with NULL gtype and empty coords (filter with ``valid_geometries``
    downstream — every caller does).

    Arrow-native (``mapInArrow``): the nested coords column is assembled
    directly from flat value/offset buffers and the envelopes come from
    two ``minimum.reduceat``/``maximum.reduceat`` passes over the flat
    coordinate array. The previous pandas version spent ~80% of reader
    wall time converting per-row nested Python lists back through
    pandas->Arrow (measured 262k rows/s end-to-end on local[32] with
    parse_wkt itself only 12.5us/row); transport, not parsing, was the
    ingest bottleneck — same lesson as the verifier (PLANS.md §7).

    Cells parse as WKT or hex-encoded WKB (``parse_geom_text``), so
    PostGIS COPY exports ingest through every delimited/text reader
    with no flag."""
    return _with_parsed(df, wkt_col, parse_geom_text)


def with_parsed_geometry_wkb(df: DataFrame, wkb_col: str = "wkb") -> DataFrame:
    """WKB-binary twin of with_parsed_geometry: same Arrow transport,
    same NULL-gtype contract for undecodable rows, parse_wkb per row."""
    return _with_parsed(df, wkb_col, parse_wkb)


def _with_parsed(df: DataFrame, col: str, parse_fn) -> DataFrame:
    names = [f.name for f in df.schema]
    i_geom = names.index(col)

    def run(batches):
        import pyarrow as pa

        for batch in batches:
            raws = batch.column(i_geom).to_pylist()
            acc = GeometryAccumulator(len(raws))
            for s in raws:
                parsed = parse_fn(s)
                if parsed is None:
                    acc.add_invalid()
                else:
                    acc.add(*parsed)
            cols = [batch.column(j) for j in range(batch.num_columns)]
            yield pa.RecordBatch.from_arrays(
                cols + acc.arrays(),
                names=names + ["gtype", "coords", "minx", "miny", "maxx", "maxy"],
            )

    in_fields = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in df.schema)
    return df.mapInArrow(run, f"{in_fields}, {GEOM_FIELDS}")


def valid_geometries(df: DataFrame) -> DataFrame:
    """Drop rows that failed parsing (empty/invalid/collection), mirroring
    the reference's load-time filter."""
    return df.where(F.col("gtype").isNotNull())
