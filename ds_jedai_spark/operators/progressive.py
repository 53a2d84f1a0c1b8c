"""Progressive (budget-bounded) interlinking as window / top-k plans.

The reference implements these as per-partition priority queues
(reference: src/main/scala/linkers/progressive/ProgressiveGIAnt.scala:25-42,
TopKPairs.scala:25-76, ReciprocalTopK.scala:26-69,
RandomScheduling.scala:24-43, model/structures/ComparisonPQ.scala:45-70).
Spark-first, a budget-capped PQ is simply a top-k: ``ORDER BY weight
LIMIT budget`` compiles to TakeOrderedAndProject (distributed partial
top-k per partition + driver merge — no global sort shuffle), and
per-entity k-capping is ``row_number() OVER (PARTITION BY id)``.

Determinism: the reference breaks weight ties by PQ insertion counter
(non-reproducible across runs); we fix the documented deterministic
ordering (weight DESC, s_id, t_id) instead (SURVEY.md §7 hard-part 3).

RANDOM scheduling uses a seeded multiplicative hash of the pair ids
rather than ``rand()`` so the plan stays reproducible and oracle-checkable
across engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

RANDOM_WEIGHT_SQL = (
    "(CAST((s_id * 2654435761 + t_id * 40503) % 1000003 AS DOUBLE) / 1000003.0)"
)


def with_weight(cand: DataFrame, weight_sql: str) -> DataFrame:
    return cand.withColumn("w", F.expr(weight_sql))


def progressive_top_budget(cand: DataFrame, weight_sql: str, budget: int) -> DataFrame:
    """PROGRESSIVE_GIANT scheduling: keep the top-``budget`` weighted pairs."""
    return (
        with_weight(cand, weight_sql)
        .select("s_id", "t_id", "w")
        .orderBy(F.desc("w"), "s_id", "t_id")
        .limit(budget)
    )


def topk_per_entity(cand: DataFrame, weight_sql: str, k: int) -> DataFrame:
    """TOPK: per-source-entity top-k candidates by weight."""
    w = Window.partitionBy("s_id").orderBy(F.desc("w"), "t_id")
    return (
        with_weight(cand, weight_sql)
        .select("s_id", "t_id", "w")
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= k)
        .drop("rn")
    )


def reciprocal_topk(cand: DataFrame, weight_sql: str, k: int) -> DataFrame:
    """RECIPROCAL_TOPK: pair kept iff it is in the source-side top-k AND the
    target-side top-k (the reference's mutual-best semi-join)."""
    ws = Window.partitionBy("s_id").orderBy(F.desc("w"), "t_id")
    wt = Window.partitionBy("t_id").orderBy(F.desc("w"), "s_id")
    return (
        with_weight(cand, weight_sql)
        .select("s_id", "t_id", "w")
        .withColumn("rn_s", F.row_number().over(ws))
        .withColumn("rn_t", F.row_number().over(wt))
        .where((F.col("rn_s") <= k) & (F.col("rn_t") <= k))
        .drop("rn_s", "rn_t")
    )


def topk_per_entity_dynamic(cand: DataFrame, weight_sql: str) -> DataFrame:
    """topk_per_entity with k taken from a per-row ``k`` column (derived
    from a broadcast aggregate) instead of a Python literal — lets the
    engine fold counts like ceil(budget / |sources|) into the plan with no
    driver action."""
    w = Window.partitionBy("s_id").orderBy(F.desc("w"), "t_id")
    return (
        with_weight(cand, weight_sql)
        .select("s_id", "t_id", "w", "k")
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= F.col("k"))
        .drop("rn", "k")
    )


def reciprocal_topk_dynamic(cand: DataFrame, weight_sql: str) -> DataFrame:
    """reciprocal_topk with the per-row ``k`` column contract of
    topk_per_entity_dynamic."""
    ws = Window.partitionBy("s_id").orderBy(F.desc("w"), "t_id")
    wt = Window.partitionBy("t_id").orderBy(F.desc("w"), "s_id")
    return (
        with_weight(cand, weight_sql)
        .select("s_id", "t_id", "w", "k")
        .withColumn("rn_s", F.row_number().over(ws))
        .withColumn("rn_t", F.row_number().over(wt))
        .where((F.col("rn_s") <= F.col("k")) & (F.col("rn_t") <= F.col("k")))
        .drop("rn_s", "rn_t", "k")
    )


def composite_top_budget(
    cand: DataFrame, main_sql: str, secondary_sql: str, budget: int
) -> DataFrame:
    """COMPOSITE weighting scheme: the secondary weight breaks main-weight
    ties (reference: model/weightedPairs/CompositeWP.scala:27-44 — with its
    documented non-transitivity consciously replaced by a total order)."""
    return (
        cand.withColumn("w", F.expr(main_sql))
        .withColumn("w2", F.expr(secondary_sql))
        .select("s_id", "t_id", "w", "w2")
        .orderBy(F.desc("w"), F.desc("w2"), "s_id", "t_id")
        .limit(budget)
    )


def hybrid_top_budget(
    cand: DataFrame, main_sql: str, secondary_sql: str, budget: int
) -> DataFrame:
    """HYBRID weighting scheme: product of the two weights
    (reference: model/weightedPairs/HybridWP.scala:28-39)."""
    return progressive_top_budget(cand, f"(({main_sql}) * ({secondary_sql}))", budget)


def thin_multi_top_budget(
    cand: DataFrame, w1_sql: str, w2_sql: str, w3_sql: str, budget: int
) -> DataFrame:
    """THIN_MULTI_COMPOSITE scheme: lexicographic (w1, w2, w3) ordering —
    the reference fixes these to (JS, CF, MBRO)
    (model/weightedPairs/ThinMultiCompositePair.scala:8-21)."""
    return (
        cand.withColumn("w1", F.expr(w1_sql))
        .withColumn("w2", F.expr(w2_sql))
        .withColumn("w3", F.expr(w3_sql))
        .select("s_id", "t_id", "w1", "w2", "w3")
        .orderBy(F.desc("w1"), F.desc("w2"), F.desc("w3"), "s_id", "t_id")
        .limit(budget)
    )


def local_budget_top(
    cand: DataFrame,
    source: DataFrame,
    weight_sql: str,
    budget: int,
    pid_sql: str,
    source_pid_sql: str,
) -> DataFrame:
    """Budget-proportional scheduling: each spatial partition p gets
    ``localBudget = ceil(budget * |source_p| / |source|)`` and keeps its own
    top-localBudget pairs (reference: linkers/progressive/
    ProgressiveGIAnt.scala:26). Partition id is a coarse grid cell of the
    source envelope; per-pid counts are a tiny aggregate broadcast into the
    candidate stream — no driver-side action."""
    counts = (
        source.withColumn("pid", F.expr(source_pid_sql))
        .groupBy("pid")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .withColumn("total", F.sum("cnt").over(Window.partitionBy()))
        .withColumn(
            "lb",
            F.expr(f"CAST(floor(({budget} * cnt + total - 1.0) / total) AS BIGINT)"),
        )
        .select("pid", "lb")
    )
    w = Window.partitionBy("pid").orderBy(F.desc("w"), "s_id", "t_id")
    return (
        with_weight(cand, weight_sql)
        .withColumn("pid", F.expr(pid_sql))
        .select("s_id", "t_id", "w", "pid")
        .withColumn("rn", F.row_number().over(w))
        .join(F.broadcast(counts), on="pid", how="inner")
        .where(F.col("rn") <= F.col("lb"))
        .select("s_id", "t_id", "w")
    )


def random_scheduling(cand: DataFrame, budget: int) -> DataFrame:
    """RANDOM: seeded-hash weights + the same top-budget machinery."""
    return progressive_top_budget(cand, RANDOM_WEIGHT_SQL, budget)


def pgr_metrics(scheduled: DataFrame, qualifies_col: str = "qualifies") -> DataFrame:
    """Progressive Geometry Recall over the scheduled verification order
    (reference: DistributedProgressiveInterlinking.scala:229-257):
    PGR = (sum of running qualifying counts / qp-within-budget) / verifications.

    The running cumulative sum is never materialized: with rank_i the
    1-based global verification order, sum_i(running_qp_i) telescopes to
    (n + 1) * sum(q) - sum(q * rank) — so the plan is a distributed
    two-phase rank (ranking.global_rank, no single-task window) plus one
    ordinary aggregate, and survives reference-scale budgets (5M-100M
    pairs)."""
    from ds_jedai_spark.operators.ranking import global_rank

    q = F.col(qualifies_col).cast("long")
    ranked = global_rank(
        scheduled.withColumn("negw", -F.col("w")),
        asc_cols=["negw", "s_id", "t_id"],
    )
    agg = ranked.agg(
        F.count(F.lit(1)).alias("verifications"),
        F.sum(q).alias("qualifying_pairs"),
        F.sum(q * F.col("rank")).alias("qrank"),
    )
    return agg.select(
        "verifications",
        "qualifying_pairs",
        (
            (
                ((F.col("verifications") + 1) * F.col("qualifying_pairs")
                 - F.col("qrank"))
                / F.col("qualifying_pairs")
            )
            / F.col("verifications")
        ).alias("pgr"),
    )
