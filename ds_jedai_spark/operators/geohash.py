"""Geohash encoding/decoding as closed-form SQL — the standard
public-domain spatial index key (Niemeyer 2008; the algorithm is the
textbook bit-interleave + base32 described on its Wikipedia page).

Beyond the reference's surface: DS-JedAI has no cell-key function, but
a geohash column is the workhorse of large-scale pipelines — a
GROUP BY geohash is a density rollup, an equi-join on geohash is a
cheap spatial block, and a prefix match is a containment query. The
engine's own tile join remains the precise path; geohash is the
interoperable, human-readable key for exchange with external systems.

Spark-first execution: the encoder is ONE closed-form SQL expression
(floor/abs arithmetic over doubles — every intermediate is an integer
< 2^52, so IEEE doubles compute it exactly and Spark and DuckDB agree
bit-for-bit), generated once per precision and shared VERBATIM between
the Spark plan and the DuckDB oracle. No UDF, no Python, no shuffle —
whole-stage codegen over the scan, free at 100 TB.

Bit layout (the published algorithm): 5 bits per character,
alternating lon, lat, lon, ... starting with lon's MSB; lon gets
ceil(5p/2) bits, lat floor(5p/2). Cell index = floor((lon + 180) /
360 * 2^nbits) clamped at BOTH edges (so lon = 180 / lat = 90 encode
instead of overflowing, and below-range input encodes the bottom edge
cell instead of a negative index whose bit arithmetic would wrap). The closed form equals the canonical
bisection for all inputs except values within one double-rounding ulp
of a cell boundary, where bisection itself is library-dependent; both
engines here share the identical expression, so results never diverge
across the gate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

BASE32 = "0123456789bcdefghjkmnpqrstuvwxyz"


def _dlit(v) -> str:
    """A literal BOTH engines parse as DOUBLE: Spark reads a plain
    '33554432.0' as DECIMAL (whose division rounds at a clamped scale —
    floor(x/32^5) came out 1 for x just under 32^5), while an exponent
    forms a floating-point literal in Spark and DuckDB alike. Exact for
    integers below 2^53."""
    return f"{float(v):.1f}e0"


def _bit(v: str, k: int) -> str:
    """Bit k of the non-negative integer-valued double expression v —
    floor(v/2^k) - 2*floor(v/2^(k+1)), exact for v < 2^52."""
    return (f"(floor(({v}) / {_dlit(1 << k)}) - "
            f"2.0 * floor(({v}) / {_dlit(1 << (k + 1))}))")


def _nbits(precision: int) -> tuple[int, int, int]:
    if not 1 <= int(precision) <= 10:
        raise ValueError("geohash precision must be in 1..10 "
                         "(50 bits; doubles are exact to 2^52)")
    p = int(precision)
    bits = 5 * p
    return bits, (bits + 1) // 2, bits // 2


def _cell_sql(v: str, offset: float, span: float, nbits: int) -> str:
    """Clamped cell index of coordinate expression ``v`` on the
    ``nbits``-deep bisection of [-offset, -offset+span): both edges
    clamp (bottom AND top), so any out-of-range input encodes into the
    nearest edge cell instead of a negative/overflowing index whose
    bit-extraction arithmetic would wrap."""
    return (f"greatest(0.0e0, least({_dlit((1 << nbits) - 1)}, "
            f"floor((({v}) + {offset!r}) / {span!r} * "
            f"{_dlit(1 << nbits)})))")


def _interleave_sql(ix: str, iy: str, precision: int) -> str:
    """Interleave two non-negative integer-valued double expressions
    (lon cell ``ix``: ceil(5p/2) bits, lat cell ``iy``: floor(5p/2))
    into the geohash integer — the shared Spark/DuckDB closed form."""
    bits, nlon, nlat = _nbits(precision)
    terms = []
    for j in range(nlon):  # lon bit j-from-MSB -> output bit bits-1-2j
        terms.append(
            f"{_bit('__IX__', nlon - 1 - j)} * {_dlit(1 << (bits - 1 - 2 * j))}"
        )
    for j in range(nlat):  # lat bit j-from-MSB -> output bit bits-2-2j
        terms.append(
            f"{_bit('__IY__', nlat - 1 - j)} * {_dlit(1 << (bits - 2 - 2 * j))}"
        )
    expr = "(" + " + ".join(terms) + ")"
    # bind the cell indices once via a two-level expansion: the __IX__
    # placeholder keeps the generated text readable and guarantees both
    # engines evaluate the same sub-expression
    return expr.replace("__IX__", ix).replace("__IY__", iy)


def geohash_int_sql(lon: str, lat: str, precision: int) -> str:
    """The interleaved geohash integer (0 .. 32^precision - 1) as one
    shared Spark/DuckDB SQL expression over lon/lat degree columns."""
    _, nlon, nlat = _nbits(precision)
    return _interleave_sql(
        _cell_sql(lon, 180.0, 360.0, nlon),
        _cell_sql(lat, 90.0, 180.0, nlat),
        precision,
    )


def _b32_chars(src: str, p: int) -> str:
    """Base32 digits of the bound geohash-integer expression ``src`` —
    substr over the alphabet literal, 1-indexed in both engines."""
    chars = []
    for c in range(p):
        hi = f"floor({src} / {_dlit(32 ** (p - c))})"
        digit = f"(floor({src} / {_dlit(32 ** (p - 1 - c))}) - 32.0 * {hi})"
        chars.append(f"substr('{BASE32}', CAST({digit} AS INT) + 1, 1)")
    return "(" + " || ".join(chars) + ")"


def geohash_str_sql(lon: str, lat: str, precision: int) -> str:
    """The base32 geohash string — shared Spark/DuckDB SQL (substr over
    the alphabet literal, 1-indexed in both engines)."""
    p = int(precision)
    return _b32_chars(f"({geohash_int_sql(lon, lat, p)})", p)


def with_geohash(
    df: DataFrame, precision: int = 7, as_int: bool = False
) -> DataFrame:
    """Add a ``geohash`` column (base32 string; ``as_int=True`` adds
    ``geohash_int`` too) keyed on the ENVELOPE CENTER — for points the
    point itself, for boxes the representative cell. Lon/lat domain is
    the caller's contract (same as the geodesic join); out-of-range
    centers clamp into the edge cells like every public implementation.
    Pure JVM projection: no shuffle, no Python, fused into the scan."""
    p = int(precision)
    cx = "((minx + maxx) / 2.0)"
    cy = "((miny + maxy) / 2.0)"
    # bind the interleaved integer ONCE as a column, then slice base32
    # digits off it — the naive inline form repeats the ~6 KB integer
    # expression 2*precision times in the generated code
    out = df.withColumn(
        "__gh_i", F.expr(geohash_int_sql(cx, cy, p))
    )
    out = out.withColumn("geohash", F.expr(_b32_chars("__gh_i", p)))
    if as_int:
        out = out.withColumn("geohash_int", F.col("__gh_i").cast("long"))
    return out.drop("__gh_i")


def geohash_cover(
    df: DataFrame, precision: int = 5, as_int: bool = False
) -> DataFrame:
    """EXPLODE each row into the set of geohash cells its ENVELOPE
    overlaps — the geohash blocking primitive (an equi-join on the
    cover column is a spatial block that, unlike the center key, never
    misses a boundary-spanning candidate). Adds ``geohash`` (base32;
    ``as_int=True`` adds ``geohash_int``), one output row per
    (entity, covering cell).

    Pure JVM: clamped floor cell ranges + two staged
    ``explode(sequence(...))`` + the shared interleave closed form —
    no Python, no shuffle. The explode factor is
    (lon_span/cell + 1) * (lat_span/cell + 1) per row; pick the
    precision so typical envelopes cover a handful of cells (the same
    caller lever as grid_density coverage and the tile-join theta).
    Out-of-range envelopes clamp into the edge cells, like
    with_geohash."""
    p = int(precision)
    _, nlon, nlat = _nbits(p)
    out = df.withColumn(
        "__gx",
        F.explode(F.expr(
            f"sequence(CAST({_cell_sql('minx', 180.0, 360.0, nlon)} "
            f"AS BIGINT), "
            f"CAST({_cell_sql('maxx', 180.0, 360.0, nlon)} AS BIGINT))"
        )),
    ).withColumn(
        "__gy",
        F.explode(F.expr(
            f"sequence(CAST({_cell_sql('miny', 90.0, 180.0, nlat)} "
            f"AS BIGINT), "
            f"CAST({_cell_sql('maxy', 90.0, 180.0, nlat)} AS BIGINT))"
        )),
    ).withColumn(
        "__gh_i",
        F.expr(_interleave_sql("CAST(__gx AS DOUBLE)",
                               "CAST(__gy AS DOUBLE)", p)),
    )
    out = out.withColumn("geohash", F.expr(_b32_chars("__gh_i", p)))
    if as_int:
        out = out.withColumn("geohash_int", F.col("__gh_i").cast("long"))
    return out.drop("__gx", "__gy", "__gh_i")


def geohash_cover_sql(
    src_cte: str, precision: int, cols: str = "id"
) -> str:
    """The cover-set as DuckDB oracle SQL over a source exposing
    minx/miny/maxx/maxy: staged ``unnest(generate_series(...))`` (one
    per nesting level) + the SAME interleave closed form text
    (_interleave_sql), emitting (``cols``..., geohash_int)."""
    p = int(precision)
    _, nlon, nlat = _nbits(p)
    gi = _interleave_sql("CAST(gx AS DOUBLE)", "CAST(gy AS DOUBLE)", p)
    return (
        f"SELECT {cols}, CAST({gi} AS BIGINT) AS geohash_int FROM ("
        f"SELECT {cols}, gx, "
        f"unnest(generate_series("
        f"CAST({_cell_sql('miny', 90.0, 180.0, nlat)} AS BIGINT), "
        f"CAST({_cell_sql('maxy', 90.0, 180.0, nlat)} AS BIGINT)))"
        f" AS gy FROM ("
        f"SELECT {cols}, miny, maxy, "
        f"unnest(generate_series("
        f"CAST({_cell_sql('minx', 180.0, 360.0, nlon)} AS BIGINT), "
        f"CAST({_cell_sql('maxx', 180.0, 360.0, nlon)} AS BIGINT)))"
        f" AS gx FROM ({src_cte}) s) t0) t1"
    )


def geohash_bounds(
    df: DataFrame, precision: int, col: str = "geohash"
) -> DataFrame:
    """Decode a geohash string column (fixed ``precision`` — the caller
    encoded it, so the length is known) back to its cell bounding box
    (gh_minx, gh_miny, gh_maxx, gh_maxy). JVM-only flat expression: one
    instr-lookup per character and one additive term per bit — the
    oracle gate covers the ENCODER; the decoder is pinned by the
    encode->decode containment + cell-width laws in tests."""
    p = int(precision)
    bits = 5 * p
    nlon = (bits + 1) // 2
    nlat = bits // 2
    # digit value of char c, bit k (MSB first) of that digit, as flat
    # SQL over the string column
    lon_terms, lat_terms = [], []
    for c in range(p):
        d = f"(instr('{BASE32}', substr({col}, {c + 1}, 1)) - 1)"
        for k in range(5):  # bit k from MSB: weight 2^(4-k) within d
            g = 5 * c + k  # global bit index, 0 = overall MSB (lon)
            b = (f"(floor({d} / {_dlit(1 << (4 - k))}) - "
                 f"2.0 * floor({d} / {_dlit(1 << (5 - k))}))")
            if g % 2 == 0:  # lon bit, index g/2 from lon MSB
                lon_terms.append(f"{b} * {_dlit(1 << (nlon - 1 - g // 2))}")
            else:  # lat bit, index (g-1)/2 from lat MSB
                lat_terms.append(f"{b} * {_dlit(1 << (nlat - 1 - g // 2))}")
    lon_i = "(" + " + ".join(lon_terms) + ")"
    lat_i = "(" + " + ".join(lat_terms) + ")"
    wlon = 360.0 / float(1 << nlon)
    wlat = 180.0 / float(1 << nlat)
    return (
        df.withColumn("gh_minx", F.expr(f"{lon_i} * {wlon!r} - 180.0"))
        .withColumn("gh_miny", F.expr(f"{lat_i} * {wlat!r} - 90.0"))
        .withColumn("gh_maxx", F.col("gh_minx") + F.lit(wlon))
        .withColumn("gh_maxy", F.col("gh_miny") + F.lit(wlat))
    )
