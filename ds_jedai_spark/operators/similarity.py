"""Embedding similarity search: brute-force cosine top-k, IVF-style
restricted search, and cosine near-dup pairs.

Beyond-reference extensions. Exactness contract: embeddings (float32) are
quantized with floor(x * 1000) into exact integers, so dot products and
norms are order-independent integer sums and the final cosine
(dot / sqrt(n1*n2)) is bit-identical across Spark and DuckDB.

Scale notes (100 TB): brute-force is the correctness baseline (O(Q·N) with
a broadcast query side — fine for small Q). The IVF variant restricts the
join to a coarse cell (here the ``label`` column stands in for a learned
centroid assignment), which is the standard route to sub-linear scan cost;
the join is an equi-join on the cell id, so Catalyst shuffles each cell
once and AQE splits skewed cells.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

QUANT = 1000


def quantized(emb: DataFrame) -> DataFrame:
    q = F.transform(
        "embedding", lambda x: F.floor(x.cast("double") * QUANT).cast("long")
    )
    dot_self = F.aggregate(
        F.zip_with("qv", "qv", lambda a, b: a * b),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    return (
        emb.select("vec_id", "label", q.alias("qv"))
        .withColumn("norm2", dot_self)
    )


def _dot(a: str, b: str):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


def _cos():
    return F.col("dot").cast("double") / F.sqrt(
        F.col("n1").cast("double") * F.col("n2").cast("double")
    )


def brute_topk(emb: DataFrame, n_queries: int = 10, k: int = 5) -> DataFrame:
    """Exact cosine top-k: small broadcast query set vs all vectors."""
    qe = quantized(emb)
    queries = qe.where(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("qid"), F.col("qv").alias("a"), F.col("norm2").alias("n1")
    )
    base = qe.select(
        F.col("vec_id").alias("vid"), F.col("qv").alias("b"), F.col("norm2").alias("n2")
    )
    scored = (
        F.broadcast(queries)
        .crossJoin(base)
        .where(F.col("qid") != F.col("vid"))
        .withColumn("dot", _dot("a", "b"))
        .withColumn("cos", _cos())
    )
    w = Window.partitionBy("qid").orderBy(F.desc("cos"), "vid")
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= k)
        .select("qid", "vid", "cos")
    )


def ivf_label_topk(emb: DataFrame, k: int = 3) -> DataFrame:
    """IVF-style ANN: search only the query's coarse cell (label)."""
    qe = quantized(emb)
    queries = qe.where(F.col("vec_id") % 50 == 0).select(
        F.col("vec_id").alias("qid"),
        F.col("label").alias("cell"),
        F.col("qv").alias("a"),
        F.col("norm2").alias("n1"),
    )
    base = qe.select(
        F.col("vec_id").alias("vid"),
        F.col("label").alias("cell"),
        F.col("qv").alias("b"),
        F.col("norm2").alias("n2"),
    )
    scored = (
        queries.join(base, "cell")
        .where(F.col("qid") != F.col("vid"))
        .withColumn("dot", _dot("a", "b"))
        .withColumn("cos", _cos())
    )
    w = Window.partitionBy("qid").orderBy(F.desc("cos"), "vid")
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= k)
        .select("qid", "vid", "cos")
    )


def cosine_neardup_pairs(emb: DataFrame, tau: float) -> DataFrame:
    """All-pairs cosine near-duplicates (v1 < v2, cos >= tau)."""
    qe = quantized(emb)
    a = qe.select(
        F.col("vec_id").alias("v1"), F.col("qv").alias("a"), F.col("norm2").alias("n1")
    )
    b = qe.select(
        F.col("vec_id").alias("v2"), F.col("qv").alias("b"), F.col("norm2").alias("n2")
    )
    return (
        a.crossJoin(b)
        .where(F.col("v1") < F.col("v2"))
        .withColumn("dot", _dot("a", "b"))
        .withColumn("cos", _cos())
        .where(F.col("cos") >= tau)
        .select("v1", "v2", "cos")
    )
