"""Stateful progressive algorithms — the irreducibly sequential pair.

DYNAMIC_PROGRESSIVE_GIANT (reference:
src/main/scala/linkers/progressive/DynamicProgressiveGIAnt.scala:25-88 +
model/structures/ComparisonPQ.scala:55-70): verify candidates in weight
order; each time a pair qualifies, boost the weight of every remaining
pair sharing an endpoint to ``w * (1 + relatedMatches)``, re-ordering the
queue mid-scan.

EARLY_STOPPING (reference:
src/main/scala/linkers/progressive/EarlyStoppingLinker.scala:34-131):
verify in weight-ordered batches; stop after ``max_violations``
consecutive batches whose match count falls below
``precision_level * first_batch_matches``.

Both mutate a priority structure as a function of verification *results*,
so they cannot be expressed as window functions. Spark-first this means:
keep candidate generation + weighting as DataFrame plans, then run the
sequential scan per partition group with ``applyInPandas`` (Arrow-batched,
one Python pass per group — the same operator-per-partition shape the
reference uses, linkers/DistributedInterlinking.scala:37-44).

Groups are formed by bucketing the source id into ``num_parts`` buckets
(``s_id % num_parts`` — portable modular bucketing so the DuckDB oracle can
reproduce the grouping bit-for-bit) and each group gets a budget share
proportional to its candidate count (reference localBudget,
ProgressiveGIAnt.scala:26). The group total needed for that share is a
broadcast one-row aggregate joined onto the candidates — no driver-side
``count()`` action, so the candidate set is scanned exactly once.
"""

from __future__ import annotations

import heapq

import pandas as pd
from pyspark.sql import DataFrame, functions as F

OUT_SCHEMA = "s_id long, t_id long, w double, verified_rank long"

GEOM_COLS = ("s_gtype", "s_coords", "t_gtype", "t_coords")


def _lazy_qualifier(pdf: pd.DataFrame, relation: str):
    """Per-row exact verifier, called only when the scan dequeues the row —
    so the budget genuinely bounds relate_pair calls on the general WKT
    path (the reference verifies inside the scan the same way,
    ProgressiveLinkerT.scala:47-63)."""
    from ds_jedai_spark.operators.relate_general import relate_pair

    sg = pdf["s_gtype"].to_numpy()
    sc = pdf["s_coords"].to_numpy()
    tg = pdf["t_gtype"].to_numpy()
    tc = pdf["t_coords"].to_numpy()

    def qual_of(i: int) -> bool:
        return bool(relate_pair(sg[i], sc[i], tg[i], tc[i])[relation])

    return qual_of


def _dynamic_scan(pdf: pd.DataFrame, budget: int, qual_of=None) -> pd.DataFrame:
    """Sequential dynamic-PQ scan over one group (pandas)."""
    n = len(pdf)
    s_ids = pdf["s_id"].to_numpy()
    t_ids = pdf["t_id"].to_numpy()
    w0 = pdf["w"].to_numpy()
    if qual_of is None:
        qual = pdf["qualifies"].to_numpy()
        qual_of = lambda i: bool(qual[i])  # noqa: E731

    by_s: dict[int, list[int]] = {}
    by_t: dict[int, list[int]] = {}
    for i in range(n):
        by_s.setdefault(int(s_ids[i]), []).append(i)
        by_t.setdefault(int(t_ids[i]), []).append(i)

    rm = [0] * n  # relatedMatches per pending pair
    eff = [float(w0[i]) for i in range(n)]
    done = [False] * n
    # Heap entries: (-w_eff, s_id, t_id, idx, w_at_push); stale entries
    # (w_at_push != current eff) are skipped lazily.
    heap = [(-eff[i], int(s_ids[i]), int(t_ids[i]), i, eff[i]) for i in range(n)]
    heapq.heapify(heap)

    out_s, out_t, out_w, out_r = [], [], [], []
    rank = 0
    while heap and rank < budget:
        neg_w, _, _, i, w_at_push = heapq.heappop(heap)
        if done[i] or w_at_push != eff[i]:
            continue
        done[i] = True
        rank += 1
        out_s.append(int(s_ids[i]))
        out_t.append(int(t_ids[i]))
        out_w.append(eff[i])
        out_r.append(rank)
        if qual_of(i):
            for j in by_s.get(int(s_ids[i]), []) + by_t.get(int(t_ids[i]), []):
                if not done[j]:
                    rm[j] += 1
                    eff[j] = float(w0[j]) * (1 + rm[j])
                    heapq.heappush(
                        heap, (-eff[j], int(s_ids[j]), int(t_ids[j]), j, eff[j])
                    )
    return pd.DataFrame(
        {"s_id": out_s, "t_id": out_t, "w": out_w, "verified_rank": out_r}
    )


def dynamic_progressive(
    cand: DataFrame,
    weight_sql: str,
    qualifies_col: str | None,
    budget: int,
    num_parts: int = 32,
    relation: str | None = None,
) -> DataFrame:
    """cand must carry s_id, t_id and either a precomputed qualifies column
    (closed-form box algebra — free JVM column math) or, with
    ``relation=...``, the geometry columns (s_gtype/s_coords/t_gtype/
    t_coords) for lazy in-scan exact verification of dequeued pairs only."""
    cols = ["pid", "s_id", "t_id", "w"]
    base = cand.withColumn("w", F.expr(weight_sql)).withColumn(
        "pid", F.pmod(F.col("s_id"), F.lit(num_parts))
    )
    if relation is None:
        base = base.withColumn("qualifies", F.col(qualifies_col))
        cols.append("qualifies")
    else:
        cols.extend(GEOM_COLS)
    base = base.select(*cols)
    totals = base.agg(F.count(F.lit(1)).alias("n_total"))
    base = base.crossJoin(F.broadcast(totals))

    def scan(pdf: pd.DataFrame) -> pd.DataFrame:
        total = max(int(pdf["n_total"].iloc[0]), 1)
        # Integer-exact ceil so the SQL oracle's `(a + b - 1) // b` matches.
        local_budget = max(1, (budget * len(pdf) + total - 1) // total)
        pdf = pdf.sort_values(
            ["w", "s_id", "t_id"], ascending=[False, True, True]
        ).reset_index(drop=True)
        qual_of = _lazy_qualifier(pdf, relation) if relation else None
        return _dynamic_scan(pdf, local_budget, qual_of)

    return base.groupBy("pid").applyInPandas(scan, OUT_SCHEMA)


def early_stopping(
    cand: DataFrame,
    weight_sql: str,
    qualifies_col: str | None,
    batch_size: int = 100,
    max_violations: int = 4,
    precision_level: float = 0.18,
    num_parts: int = 32,
    relation: str | None = None,
) -> DataFrame:
    """Batch-verified scan with the reference's stopping rule (defaults are
    the reference case-class defaults, EarlyStoppingLinker.scala:21-23).
    With ``relation=...`` each batch is exactly verified lazily, so batches
    after the stopping point are never verified at all."""
    cols = ["pid", "s_id", "t_id", "w"]
    base = cand.withColumn("w", F.expr(weight_sql)).withColumn(
        "pid", F.pmod(F.col("s_id"), F.lit(num_parts))
    )
    if relation is None:
        base = base.withColumn("qualifies", F.col(qualifies_col))
        cols.append("qualifies")
    else:
        cols.extend(GEOM_COLS)
    base = base.select(*cols)

    def scan(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(
            ["w", "s_id", "t_id"], ascending=[False, True, True]
        ).reset_index(drop=True)
        qual_of = _lazy_qualifier(pdf, relation) if relation else None
        out_idx: list[int] = []
        first_batch_matches = None
        violations = 0
        for start in range(0, len(pdf), batch_size):
            batch = pdf.iloc[start : start + batch_size]
            if qual_of is None:
                matches = int(batch["qualifies"].sum())
            else:
                matches = sum(qual_of(i) for i in batch.index)
            out_idx.extend(batch.index)
            if first_batch_matches is None:
                first_batch_matches = max(matches, 1)
                continue
            if matches < precision_level * first_batch_matches:
                violations += 1
                if violations >= max_violations:
                    break
            else:
                violations = 0
        res = pdf.iloc[out_idx][["s_id", "t_id", "w"]].copy()
        res["verified_rank"] = range(1, len(res) + 1)
        return res

    return base.groupBy("pid").applyInPandas(scan, OUT_SCHEMA)
