"""JedAI-family meta-blocking ER (round 17): differential tests against
an independent pure-Python mirror, pruning-rule laws, purge laws, and
plan-shape pins."""
from __future__ import annotations

import itertools

import pytest
from pyspark.sql import functions as F

from ds_jedai_spark.operators import blocking


DOCS = [
    # two near-duplicate clusters + unrelated noise docs
    (1, "alpha beta gamma delta epsilon zeta eta theta"),
    (2, "alpha beta gamma delta epsilon zeta eta iota"),
    (3, "alpha beta gamma delta epsilon zeta kappa mu"),
    (4, "one two three four five six seven eight nine"),
    (5, "one two three four five six seven eight ten"),
    (6, "red green blue cyan magenta yellow black white"),
    (7, "solo unique words here nothing shared at all"),
    (8, "alpha beta gamma delta epsilon zeta eta theta"),  # exact dup of 1
]


def _df(spark, rows=DOCS):
    return spark.createDataFrame(rows, "doc_id long, text string")


# ------------------------------------------------- pure-Python mirror

def _py_shingles(text, n=3):
    ws = [w for w in text.split(" ") if w]
    if len(ws) < n:
        return set()
    return {"_".join(ws[i : i + n]) for i in range(len(ws) - n + 1)}


def _py_graph(rows, max_block=blocking.PURGE_MAX, n=3):
    keys = {d: _py_shingles(t, n) for d, t in rows}
    sizes: dict[str, int] = {}
    for ks in keys.values():
        for k in ks:
            sizes[k] = sizes.get(k, 0) + 1
    kept = {k for k, c in sizes.items() if 2 <= c <= max_block}
    kb = {d: ks & kept for d, ks in keys.items()}
    graph = {}
    for (d1, k1), (d2, k2) in itertools.combinations(sorted(kb.items()), 2):
        cbs = len(k1 & k2)
        if cbs:
            graph[(d1, d2)] = (cbs, len(k1), len(k2), cbs / (len(k1) + len(k2) - cbs))
    return graph


def _py_wep(graph):
    tot = sum(v[0] for v in graph.values())
    m = len(graph)
    return {p for p, v in graph.items() if v[0] * m >= tot}


def _py_wnp(graph):
    tot: dict[int, int] = {}
    m: dict[int, int] = {}
    for (d1, d2), v in graph.items():
        for e in (d1, d2):
            tot[e] = tot.get(e, 0) + v[0]
            m[e] = m.get(e, 0) + 1
    return {
        p
        for p, v in graph.items()
        if v[0] * m[p[0]] >= tot[p[0]] or v[0] * m[p[1]] >= tot[p[1]]
    }


def _py_cnp(graph, k):
    inc: dict[int, list] = {}
    for (d1, d2), v in graph.items():
        inc.setdefault(d1, []).append((-v[0], d2))
        inc.setdefault(d2, []).append((-v[0], d1))
    keep = set()
    for e, lst in inc.items():
        for _negw, other in sorted(lst)[:k]:
            keep.add((min(e, other), max(e, other)))
    return {p for p in graph if p in keep}


def _spark_graph(spark, rows=DOCS, **kw):
    return blocking.weighted_pairs(
        blocking.purge_blocks(blocking.block_index(_df(spark, rows)), **kw)
    )


def test_weighted_pairs_match_python_mirror(spark):
    got = {
        (r["d1"], r["d2"]): (r["cbs"], r["n1"], r["n2"], r["js"])
        for r in _spark_graph(spark).collect()
    }
    want = _py_graph(DOCS)
    assert set(got) == set(want)
    for p in got:
        assert got[p][:3] == want[p][:3]
        assert got[p][3] == pytest.approx(want[p][3], abs=0)


def test_wep_wnp_cnp_match_python_mirror(spark):
    g = blocking.weighted_pairs(
        blocking.purge_blocks(blocking.block_index(_df(spark)))
    )
    graph = _py_graph(DOCS)
    got_wep = {(r["d1"], r["d2"]) for r in blocking.wep(g).collect()}
    got_wnp = {(r["d1"], r["d2"]) for r in blocking.wnp(g).collect()}
    got_cnp = {(r["d1"], r["d2"]) for r in blocking.cnp(g, 2).collect()}
    assert got_wep == _py_wep(graph)
    assert got_wnp == _py_wnp(graph)
    assert got_cnp == _py_cnp(graph, 2)


def test_exact_duplicates_survive_every_pruner(spark):
    """Docs 1 and 8 share every block — the maximum-weight edge must
    survive wep, wnp, cnp and cep."""
    g = _spark_graph(spark)
    for pruned in (blocking.wep(g), blocking.wnp(g),
                   blocking.cnp(g, 1), blocking.cep(g, 1)):
        pairs = {(r["d1"], r["d2"]) for r in pruned.collect()}
        assert (1, 8) in pairs


def test_purge_drops_singleton_and_oversized_blocks(spark):
    bi = blocking.block_index(_df(spark))
    purged = blocking.purge_blocks(bi, max_block=2)
    sizes = purged.groupBy("key").count().collect()
    assert sizes, "cap 2 must keep the doc-1/doc-8 duplicate blocks"
    assert all(r["count"] == 2 for r in sizes)
    # doc 7 shares nothing: all its blocks are singletons -> purged
    assert purged.where(F.col("doc_id") == 7).count() == 0


def test_pruned_sets_are_subsets_and_wnp_contains_wep(spark):
    g = _spark_graph(spark)
    allp = {(r["d1"], r["d2"]) for r in g.collect()}
    wep_p = {(r["d1"], r["d2"]) for r in blocking.wep(g).collect()}
    wnp_p = {(r["d1"], r["d2"]) for r in blocking.wnp(g).collect()}
    assert wep_p <= allp and wnp_p <= allp
    # every entity's local mean is <= the global max constraint in the
    # other direction — wnp keeps at least each entity's best edge, so
    # it can never be empty while the graph is nonempty
    assert allp and wnp_p


def test_wnp_keeps_each_entitys_best_edge(spark):
    g = _spark_graph(spark)
    kept = {(r["d1"], r["d2"]) for r in blocking.wnp(g).collect()}
    rows = g.collect()
    best: dict[int, tuple] = {}
    for r in rows:
        for e in (r["d1"], r["d2"]):
            cur = best.get(e)
            if cur is None or r["cbs"] > cur[0]:
                best[e] = (r["cbs"], (r["d1"], r["d2"]))
    for _e, (_w, p) in best.items():
        assert p in kept, f"max-weight edge {p} of entity {_e} pruned"


def test_cep_budget_and_determinism(spark):
    g = _spark_graph(spark)
    n = g.count()
    top2a = [(r["d1"], r["d2"]) for r in blocking.cep(g, 2).collect()]
    top2b = [(r["d1"], r["d2"]) for r in blocking.cep(g, 2).collect()]
    assert len(top2a) == min(2, n)
    assert sorted(top2a) == sorted(top2b)
    assert len({*top2a}) == len(top2a)
    full = {(r["d1"], r["d2"]) for r in blocking.cep(g, n + 10).collect()}
    assert full == {(r["d1"], r["d2"]) for r in g.collect()}


def test_er_pairs_api_and_validation(spark):
    docs = _df(spark)
    out = blocking.er_pairs(docs, prune="cnp", k=1)
    assert set(out.columns) == {"d1", "d2", "cbs", "n1", "n2", "js"}
    assert out.count() > 0
    with pytest.raises(ValueError, match="unknown prune"):
        blocking.er_pairs(docs, prune="bogus")
    with pytest.raises(ValueError, match="max_block"):
        blocking.purge_blocks(blocking.block_index(docs), max_block=1)
    with pytest.raises(ValueError, match="k must be"):
        blocking.cnp(_spark_graph(spark), 0)
    none_p = blocking.er_pairs(docs, prune="none")
    assert none_p.count() >= out.count()


def test_custom_id_and_text_columns(spark):
    rows = [(r[0] * 10, r[1]) for r in DOCS]
    df = spark.createDataFrame(rows, "eid long, body string")
    out = blocking.er_pairs(df, prune="wnp", id_col="eid", text_col="body")
    pairs = {(r["d1"], r["d2"]) for r in out.collect()}
    assert (10, 80) in pairs


def test_plan_has_no_cartesian_and_no_python(spark):
    plan = (
        blocking.er_pairs(_df(spark), prune="wnp")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_cli_op_er(spark, tmp_path, monkeypatch, capsys):
    """-op er end to end: parquet in -> pruned pair parquet out, equal
    to the library call; custom columns; scheme validation."""
    import ds_jedai_spark.session as session
    from ds_jedai_spark import cli

    monkeypatch.setattr(session, "get_spark", lambda *a, **k: spark)
    monkeypatch.setattr(spark, "stop", lambda: None)

    docs = str(tmp_path / "er_docs.parquet")
    _df(spark).write.mode("overwrite").parquet(docs)
    out = str(tmp_path / "er_pairs.parquet")
    rc = cli.main(["-op", "er", "-left", docs, "-prune", "wnp", "-out", out])
    assert rc == 0
    back = spark.read.parquet(out)
    want = {
        (r["d1"], r["d2"])
        for r in blocking.er_pairs(_df(spark), prune="wnp").collect()
    }
    assert {(r["d1"], r["d2"]) for r in back.collect()} == want

    # cardinality pruner with a budget, custom id/text columns
    docs2 = str(tmp_path / "er_docs2.parquet")
    _df(spark).selectExpr("doc_id AS my_id", "text AS body").write.mode(
        "overwrite"
    ).parquet(docs2)
    rc = cli.main([
        "-op", "er", "-left", docs2, "-id-col", "my_id", "-text-col", "body",
        "-prune", "cep", "-er-k", "3", "-limit", "5",
    ])
    assert rc == 0
    assert "d1\td2" in capsys.readouterr().out

    # missing input path
    assert cli.main(["-op", "er"]) == 2
