"""Schema-agnostic blocking + meta-blocking for entity resolution.

The reference engine is the geospatial member of the JedAI family
(its docs point users to the JedAI toolkit for non-spatial ER); the
family's core pipeline is schema-agnostic token blocking refined by
META-BLOCKING: model the block collisions as a weighted pair graph,
then prune it with global/local weight or cardinality rules
(Papadakis et al., "Meta-blocking: Taking entity resolution to the
next level", TKDE 2014; "Scaling entity resolution to large,
heterogeneous data with enriched meta-blocking", EDBT 2016). This
module re-expresses that pipeline in pure DataFrame algebra:

  block_index     (id, key) distinct blocking keys per entity —
                  word n-gram shingles by default (the corpus here has
                  a tiny flat vocabulary, so single words block
                  everything with everything; n-grams are the
                  schema-agnostic key with usable selectivity)
  purge_blocks    block purging: drop singleton blocks (no pairs) and
                  oversized stopword-like blocks (bounded join fan-out
                  — the standard scale guarantee of blocking)
  weighted_pairs  the meta-blocking graph: one equi-join on the purged
                  block key, then one groupBy — cbs (common-block
                  count) and js (Jaccard over kept block sets) weights
  wep / wnp       weighted edge / node pruning: keep pairs at or above
                  the global (wep) or either-endpoint (wnp) mean weight
  cep / cnp       cardinality edge / node pruning: global top-K /
                  per-entity top-k
  er_pairs        the composed pipeline

Determinism contract: pruning thresholds compare INTEGER cbs weights
via exact integer arithmetic (``cbs * m >= total`` instead of
``cbs >= avg``), so the kept set is bit-reproducible across engines —
a float mean differs in the last ulp with summation order, an integer
cross-multiplication never does. The reported ``js`` weight is a
single two-integer division (deterministic per IEEE-754).

Scale notes (100 TB): the only joins are equi-joins on the block key
(fan-out bounded by ``max_block``) and on entity ids; every aggregate
is a Catalyst partial/final groupBy; the pruning thresholds are one
broadcast scalar (wep/cep) or a per-entity aggregate co-partitioned
with the pair graph (wnp/cnp). Nothing is all-pairs, nothing funnels
through the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from ds_jedai_spark.operators import textops

PURGE_MAX = 64  # block purging cap: larger blocks are stopword-like
CNP_K = 5       # per-entity retained neighbors (cardinality node pruning)
CEP_K = 200     # global retained pairs (cardinality edge pruning)

SNB_WINDOW = 4  # sorted-neighborhood sliding-window size (w-1 neighbors)
# Multi-pass sorted-neighborhood sort keys (Hernandez & Stolfo, SIGMOD
# '95): a prefix key and a suffix-derived key so a typo near either end
# of the record still sorts the pair together in at least one pass. Both
# are closed-form SQL shared verbatim with the DuckDB oracle.
SNB_KEYS = (
    "substring(replace(text, ' ', ''), 1, 16)",
    "substring(reverse(replace(text, ' ', '')), 1, 16)",
)


def block_index(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text", n: int = 3
) -> DataFrame:
    """(doc_id, key): distinct word n-gram blocking keys per entity."""
    base = docs.select(
        F.col(id_col).alias("doc_id"), F.col(text_col).alias("text")
    )
    return textops.shingles(base, n=n).select(
        "doc_id", F.col("shingle").alias("key")
    )


def purge_blocks(bi: DataFrame, max_block: int = PURGE_MAX) -> DataFrame:
    """Keep keys appearing in [2, max_block] entities.

    Size-1 blocks generate no pairs; blocks above ``max_block`` are
    stopword-like keys whose C(size, 2) fan-out dominates the join while
    carrying near-zero match signal — dropping them is the standard
    block-purging step and is what bounds the candidate graph at scale.
    """
    if max_block < 2:
        raise ValueError(f"max_block must be >= 2, got {max_block}")
    sizes = bi.groupBy("key").agg(F.count(F.lit(1)).alias("c"))
    kept = sizes.where((F.col("c") >= 2) & (F.col("c") <= max_block)).select("key")
    return bi.join(kept, "key").select("doc_id", "key")


def block_filtering(
    bi: DataFrame, ratio: tuple[int, int] = (4, 5)
) -> DataFrame:
    """Block filtering (Papadakis et al., EDBT 2016): each entity keeps
    only the ``ceil(r * n)`` SMALLEST of its ``n`` blocks — small blocks
    are the discriminative ones, and dropping every entity's bulkiest
    keys shrinks the pair graph quadratically while losing almost no
    matches (the papers' measured sweet spot is r = 0.8).

    ``ratio`` is the exact rational (p, q) — the retention test is the
    integer cross-multiplication ``rn * q <= p * n + q - 1``
    (equivalent to ``rn <= ceil(p * n / q)``), never a float multiply,
    so the kept set is bit-reproducible across engines. Ranking is by
    (block size ASC, key ASC): fully deterministic because an entity's
    keys are distinct.

    Scale notes: one groupBy for block sizes, one equi-join to attach
    them, one PER-ENTITY window (partitioned by doc_id — parallel, no
    global sort), one count aggregate joined back. Everything keyed by
    entity or block key; nothing all-pairs.
    """
    p, q = int(ratio[0]), int(ratio[1])
    if p < 1 or q < 1 or p > q:
        raise ValueError(f"ratio must be a rational 0 < p/q <= 1, got {ratio}")
    sizes = bi.groupBy("key").agg(F.count(F.lit(1)).alias("bsz"))
    ranked = (
        bi.join(sizes, "key")
        .withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("doc_id").orderBy(
                    F.col("bsz").asc(), F.col("key").asc()
                )
            ),
        )
    )
    nblocks = bi.groupBy("doc_id").agg(F.count(F.lit(1)).alias("nbl"))
    return (
        ranked.join(nblocks, "doc_id")
        .where(F.col("rn") * q <= p * F.col("nbl") + (q - 1))
        .select("doc_id", "key")
    )


def weighted_pairs(bi: DataFrame) -> DataFrame:
    """The meta-blocking graph over a PURGED block index.

    (d1, d2, cbs, n1, n2, js): cbs = number of shared kept blocks
    (common-block scheme), n_i = kept blocks of entity i, js = Jaccard
    of the kept block sets. One self-equi-join on the key (fan-out
    bounded by the purge cap) + one pair groupBy + two id joins.
    """
    nb = bi.groupBy("doc_id").agg(F.count(F.lit(1)).alias("nb"))
    a = bi.alias("a")
    b = bi.alias("b")
    pairs = (
        a.join(b, "key")
        .where(F.col("a.doc_id") < F.col("b.doc_id"))
        .groupBy(
            F.col("a.doc_id").alias("d1"), F.col("b.doc_id").alias("d2")
        )
        .agg(F.count(F.lit(1)).alias("cbs"))
    )
    return (
        pairs.join(nb.select(F.col("doc_id").alias("d1"), F.col("nb").alias("n1")), "d1")
        .join(nb.select(F.col("doc_id").alias("d2"), F.col("nb").alias("n2")), "d2")
        .select(
            "d1",
            "d2",
            "cbs",
            "n1",
            "n2",
            (
                F.col("cbs").cast("double")
                / (F.col("n1") + F.col("n2") - F.col("cbs")).cast("double")
            ).alias("js"),
        )
    )


def wep(pairs: DataFrame) -> DataFrame:
    """Weighted edge pruning: keep pairs with cbs >= mean cbs.

    The comparison is the exact integer cross-multiplication
    ``cbs * m >= total`` (m = #pairs, total = sum cbs) — never a float
    mean. Threshold rides in as one broadcast 1-row aggregate.
    """
    gs = pairs.agg(
        F.sum("cbs").alias("tot"), F.count(F.lit(1)).alias("m")
    )
    return (
        pairs.crossJoin(F.broadcast(gs))
        .where(F.col("cbs") * F.col("m") >= F.col("tot"))
        .drop("tot", "m")
    )


def wnp(pairs: DataFrame) -> DataFrame:
    """Weighted node pruning: keep a pair if its cbs reaches the mean
    cbs of EITHER endpoint's incident pairs (the redefined node-centric
    rule of the meta-blocking papers — each entity votes with its local
    weight distribution; the union of votes survives).

    Exact integer arithmetic as in wep; the per-entity threshold is one
    groupBy over the direction-unioned edge list, joined back on each
    endpoint.
    """
    ew = pairs.select(F.col("d1").alias("id"), "cbs").unionByName(
        pairs.select(F.col("d2").alias("id"), "cbs")
    )
    th = ew.groupBy("id").agg(
        F.sum("cbs").alias("tot"), F.count(F.lit(1)).alias("m")
    )
    return (
        pairs.join(
            th.select(F.col("id").alias("d1"), F.col("tot").alias("t1"),
                      F.col("m").alias("m1")),
            "d1",
        )
        .join(
            th.select(F.col("id").alias("d2"), F.col("tot").alias("t2"),
                      F.col("m").alias("m2")),
            "d2",
        )
        .where(
            (F.col("cbs") * F.col("m1") >= F.col("t1"))
            | (F.col("cbs") * F.col("m2") >= F.col("t2"))
        )
        .drop("t1", "m1", "t2", "m2")
    )


def cnp(pairs: DataFrame, k: int = CNP_K) -> DataFrame:
    """Cardinality node pruning: keep a pair if it ranks in the top-k
    incident pairs of EITHER endpoint by (cbs DESC, other-id ASC) —
    per-entity windows over the direction-unioned edge list, never a
    global sort."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    direc = pairs.select(
        F.col("d1").alias("id"), F.col("d2").alias("other"), "cbs"
    ).unionByName(
        pairs.select(F.col("d2").alias("id"), F.col("d1").alias("other"), "cbs")
    )
    rn = F.row_number().over(
        Window.partitionBy("id").orderBy(F.col("cbs").desc(), F.col("other").asc())
    )
    kept = direc.withColumn("rn", rn).where(F.col("rn") <= k)
    # symmetrize instead of least/greatest-canonicalizing: the pair
    # frame's orientation is (d1 < d2) for dirty graphs but
    # (left id, right id) for clean-clean graphs, so the keep set must
    # match EITHER orientation of a surviving edge
    keep = (
        kept.select(F.col("id").alias("d1"), F.col("other").alias("d2"))
        .unionByName(
            kept.select(F.col("other").alias("d1"), F.col("id").alias("d2"))
        )
        .distinct()
    )
    return pairs.join(keep, ["d1", "d2"], "leftsemi")


def cep(pairs: DataFrame, k: int = CEP_K) -> DataFrame:
    """Cardinality edge pruning: global top-K pairs by
    (cbs DESC, d1, d2) — a TakeOrderedAndProject, deterministic because
    (d1, d2) is unique."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    return pairs.orderBy(F.col("cbs").desc(), "d1", "d2").limit(k)


def er_pairs_cross(
    left: DataFrame,
    right: DataFrame,
    prune: str = "wnp",
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    max_block: int = PURGE_MAX,
    k: int | None = None,
    filter_ratio: tuple[int, int] | None = None,
) -> DataFrame:
    """CLEAN-CLEAN (cross-dataset) ER — the JedAI family's second
    workflow mode: two individually-clean datasets, candidates only
    ACROSS them (a record never pairs with its own dataset). Same
    pipeline as :func:`er_pairs` — block, purge (block sizes counted
    over BOTH datasets, the standard multi-source rule), optional
    block filtering, CBS/JS pair graph, pruning — but the graph join is
    side-0 x side-1 only, so the candidate space is |L|x|R|-bounded and
    the (d1, d2) orientation is (left id, right id).

    CONTRACT: the two datasets' ids must be disjoint (offset one side
    if needed) — the weighted/cardinality pruners aggregate per entity
    id across both endpoints.

    Returns (d1, d2, cbs, n1, n2, js); n1/n2 are each entity's KEPT
    block counts within its own dataset's index.
    """
    if prune not in _PRUNERS:
        raise ValueError(
            f"unknown prune scheme {prune!r}; expected one of {sorted(_PRUNERS)}"
        )
    bl = block_index(left, id_col, text_col, n)
    br = block_index(right, id_col, text_col, n)
    both = (
        bl.withColumn("side", F.lit(0))
        .unionByName(br.withColumn("side", F.lit(1)))
    )
    sizes = both.groupBy("key").agg(F.count(F.lit(1)).alias("c"))
    if max_block < 2:
        raise ValueError(f"max_block must be >= 2, got {max_block}")
    kept = sizes.where(
        (F.col("c") >= 2) & (F.col("c") <= max_block)
    ).select("key")
    kb = both.join(kept, "key").select("doc_id", "key", "side")
    if filter_ratio is not None:
        fi = block_filtering(kb.select("doc_id", "key"), filter_ratio)
        kb = kb.join(fi, ["doc_id", "key"]).select("doc_id", "key", "side")
    nb = kb.groupBy("doc_id").agg(F.count(F.lit(1)).alias("nb"))
    a = kb.where(F.col("side") == 0).alias("a")
    b = kb.where(F.col("side") == 1).alias("b")
    pairs = (
        a.join(b, "key")
        .groupBy(
            F.col("a.doc_id").alias("d1"), F.col("b.doc_id").alias("d2")
        )
        .agg(F.count(F.lit(1)).alias("cbs"))
    )
    graph = (
        pairs.join(
            nb.select(F.col("doc_id").alias("d1"), F.col("nb").alias("n1")),
            "d1",
        )
        .join(
            nb.select(F.col("doc_id").alias("d2"), F.col("nb").alias("n2")),
            "d2",
        )
        .select(
            "d1", "d2", "cbs", "n1", "n2",
            (
                F.col("cbs").cast("double")
                / (F.col("n1") + F.col("n2") - F.col("cbs")).cast("double")
            ).alias("js"),
        )
    )
    fn = _PRUNERS[prune]
    if fn is None:
        return graph
    if prune in ("cnp", "cep") and k is not None:
        return fn(graph, k)
    return fn(graph)


def sorted_neighborhood(
    docs: DataFrame,
    window: int = SNB_WINDOW,
    keys: tuple[str, ...] = SNB_KEYS,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Multi-pass sorted-neighborhood blocking (Hernandez & Stolfo,
    SIGMOD '95) — the OTHER classic blocking workflow of the JedAI
    family alongside token meta-blocking.

    Each pass sorts every entity by one ``keys`` expression (ties broken
    by id, so the total order is unique and both engines agree on it)
    and pairs each entity with the ``window - 1`` entities that follow
    it in the sort. Passes are unioned; a pair's ``gap`` is its minimal
    rank distance over all passes. Returns (d1, d2, gap) with d1 < d2.

    Scale notes (100 TB): the global sort rank comes from
    ``ranking.global_rank`` — range partition + partition-local
    row_number + O(numPartitions) offset broadcast, never a
    SinglePartition window. Neighbor generation is one
    ``explode(sequence(1, w-1))`` (linear, n*(w-1) rows) followed by an
    equi-join on the dense unique rank — uniformly distributed by
    construction, so no skew regardless of key distribution. Nothing is
    all-pairs and nothing funnels rows through the driver.
    """
    from ds_jedai_spark.operators.ranking import global_rank

    if window < 2:
        raise ValueError(f"window must be >= 2, got {window}")
    if not keys:
        raise ValueError("keys must name at least one sort-key expression")
    base = docs.select(
        F.col(id_col).alias("doc_id"), F.col(text_col).alias("text")
    )
    # ALL passes ride one STACKED ranked frame (r17 optimization round):
    # rank over (pass, key, doc_id) assigns contiguous ranks within each
    # pass in exactly that pass's (key, doc_id) order, and the neighbor
    # equi-join keys on (pass, nrank) so a window can never leak across
    # the pass boundary — identical pair set, but ONE range shuffle +
    # offset collect for the whole operator instead of one per pass.
    stacked = None
    for p, kexpr in enumerate(keys):
        keyed = base.select(
            F.lit(p).alias("pass"), "doc_id", F.expr(kexpr).alias("key")
        )
        stacked = keyed if stacked is None else stacked.unionByName(keyed)
    ranked = global_rank(
        stacked, asc_cols=["pass", "key", "doc_id"]
    ).select("pass", "doc_id", "rank")
    nb = ranked.select(
        "pass",
        "doc_id",
        "rank",
        F.explode(
            F.sequence(F.lit(1), F.lit(window - 1))
        ).alias("off"),
    ).withColumn("nrank", F.col("rank") + F.col("off"))
    allp = (
        nb.alias("a")
        .join(
            ranked.select(
                "pass",
                F.col("doc_id").alias("n_id"),
                F.col("rank").alias("nrank"),
            ),
            ["pass", "nrank"],
        )
        .select(
            F.least("a.doc_id", "n_id").alias("d1"),
            F.greatest("a.doc_id", "n_id").alias("d2"),
            F.col("off").alias("gap"),
        )
    )
    return allp.groupBy("d1", "d2").agg(F.min("gap").alias("gap"))


def sorted_neighborhood_cross(
    left: DataFrame,
    right: DataFrame,
    window: int = SNB_WINDOW,
    keys: tuple[str, ...] = SNB_KEYS,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Clean-clean sorted-neighborhood: both datasets sort into ONE
    sequence per pass (the multi-source SNB of Hernandez & Stolfo),
    but only pairs whose members come from DIFFERENT datasets are
    emitted. Returns (d1, d2, gap) with d1 from ``left``, d2 from
    ``right``; ids must be disjoint. Same distributed-rank machinery
    and scale shape as :func:`sorted_neighborhood`."""
    from ds_jedai_spark.operators.ranking import global_rank

    if window < 2:
        raise ValueError(f"window must be >= 2, got {window}")
    if not keys:
        raise ValueError("keys must name at least one sort-key expression")
    base = (
        left.select(
            F.col(id_col).alias("doc_id"), F.col(text_col).alias("text")
        ).withColumn("side", F.lit(0))
        .unionByName(
            right.select(
                F.col(id_col).alias("doc_id"), F.col(text_col).alias("text")
            ).withColumn("side", F.lit(1))
        )
    )
    # stacked single-rank form — see sorted_neighborhood (r17): one
    # range shuffle + offset collect for all passes, neighbor join keyed
    # on (pass, nrank) so windows never leak across passes
    stacked = None
    for p, kexpr in enumerate(keys):
        keyed = base.select(
            F.lit(p).alias("pass"), "doc_id", "side",
            F.expr(kexpr).alias("key"),
        )
        stacked = keyed if stacked is None else stacked.unionByName(keyed)
    ranked = global_rank(
        stacked, asc_cols=["pass", "key", "doc_id"]
    ).select("pass", "doc_id", "side", "rank")
    nb = ranked.select(
        "pass",
        "doc_id",
        "side",
        "rank",
        F.explode(F.sequence(F.lit(1), F.lit(window - 1))).alias("off"),
    ).withColumn("nrank", F.col("rank") + F.col("off"))
    joined = nb.alias("a").join(
        ranked.select(
            "pass",
            F.col("doc_id").alias("n_id"),
            F.col("side").alias("n_side"),
            F.col("rank").alias("nrank"),
        ),
        ["pass", "nrank"],
    ).where(F.col("a.side") != F.col("n_side"))
    allp = joined.select(
        F.when(F.col("a.side") == 0, F.col("a.doc_id"))
        .otherwise(F.col("n_id")).alias("d1"),
        F.when(F.col("a.side") == 0, F.col("n_id"))
        .otherwise(F.col("a.doc_id")).alias("d2"),
        F.col("off").alias("gap"),
    )
    return allp.groupBy("d1", "d2").agg(F.min("gap").alias("gap"))


def snb_cross_sql(
    left_pred: str,
    right_pred: str,
    corpus_cte: str,
    window: int = SNB_WINDOW,
    keys: tuple[str, ...] = SNB_KEYS,
) -> str:
    """DuckDB twin of :func:`sorted_neighborhood_cross` over a CTE
    named ``corpus`` (doc_id, text) split by two boolean predicates
    (e.g. parity) — d1 always the ``left_pred`` side."""
    parts = []
    for kexpr in keys:
        rk = (
            f"(SELECT doc_id, CASE WHEN {left_pred} THEN 0 ELSE 1 END "
            f"AS side, row_number() OVER (ORDER BY {kexpr}, doc_id) AS rk "
            f"FROM corpus WHERE ({left_pred}) OR ({right_pred}))"
        )
        parts.append(
            f"(SELECT CASE WHEN a.side = 0 THEN a.doc_id ELSE b.doc_id END "
            f"AS d1, CASE WHEN a.side = 0 THEN b.doc_id ELSE a.doc_id END "
            f"AS d2, b.rk - a.rk AS gap "
            f"FROM {rk} a JOIN {rk} b "
            f"ON b.rk > a.rk AND b.rk - a.rk <= {window - 1} "
            f"AND a.side <> b.side)"
        )
    u = " UNION ALL ".join(f"SELECT * FROM {p}" for p in parts)
    return (
        f"WITH {corpus_cte}, u AS ({u}) "
        "SELECT d1, d2, min(gap) AS gap FROM u GROUP BY d1, d2"
    )


def snb_sql(
    corpus_cte: str,
    window: int = SNB_WINDOW,
    keys: tuple[str, ...] = SNB_KEYS,
) -> str:
    """DuckDB twin of :func:`sorted_neighborhood` over a CTE named
    ``corpus`` (doc_id, text) — shares the SNB_KEYS expressions
    verbatim; the window rank is a plain ``row_number()`` (the oracle
    runs single-node, so the distributed two-phase rank is unnecessary
    there but ranks identically by the unique (key, doc_id) order)."""
    parts = []
    for kexpr in keys:
        parts.append(
            f"(SELECT least(a.doc_id, b.doc_id) AS d1, "
            f"greatest(a.doc_id, b.doc_id) AS d2, b.rk - a.rk AS gap "
            f"FROM (SELECT doc_id, row_number() OVER (ORDER BY {kexpr}, "
            f"doc_id) AS rk FROM corpus) a "
            f"JOIN (SELECT doc_id, row_number() OVER (ORDER BY {kexpr}, "
            f"doc_id) AS rk FROM corpus) b "
            f"ON b.rk > a.rk AND b.rk - a.rk <= {window - 1})"
        )
    u = " UNION ALL ".join(f"SELECT * FROM {p}" for p in parts)
    return (
        f"WITH {corpus_cte}, u AS ({u}) "
        "SELECT d1, d2, min(gap) AS gap FROM u GROUP BY d1, d2"
    )


_PRUNERS = {"wep": wep, "wnp": wnp, "cnp": cnp, "cep": cep, "none": None}


def er_pairs(
    docs: DataFrame,
    prune: str = "wnp",
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    max_block: int = PURGE_MAX,
    k: int | None = None,
    filter_ratio: tuple[int, int] | None = None,
) -> DataFrame:
    """The composed ER pipeline: block -> purge -> [filter] -> weight
    -> prune.

    Returns (d1, d2, cbs, n1, n2, js) candidate matches. ``prune`` is
    one of wep / wnp / cnp / cep / none; ``k`` overrides the
    cardinality pruners' budget; ``filter_ratio`` (p, q) engages block
    filtering between purging and the pair graph.
    """
    if prune not in _PRUNERS:
        raise ValueError(
            f"unknown prune scheme {prune!r}; expected one of {sorted(_PRUNERS)}"
        )
    bi = purge_blocks(block_index(docs, id_col, text_col, n), max_block)
    if filter_ratio is not None:
        bi = block_filtering(bi, filter_ratio)
    graph = weighted_pairs(bi)
    fn = _PRUNERS[prune]
    if fn is None:
        return graph
    if prune in ("cnp", "cep") and k is not None:
        return fn(graph, k)
    return fn(graph)
