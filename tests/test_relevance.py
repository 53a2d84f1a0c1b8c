"""TF-IDF top-term and BM25 relevance scoring (round 17).

Differential tests against independent pure-Python mirrors plus edge
cases (empty docs, absent query terms, single-doc corpus). The gated
columns are rational arithmetic only — the mirrors verify VALUES, and
the gate's DuckDB oracle separately pins cross-engine bit-equality.
"""
from __future__ import annotations

import math

from pyspark.sql import functions as F

from ds_jedai_spark.operators import textops


def _docs_df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


DOCS = [
    (1, "query table scan query fast"),
    (2, "table table table row"),
    (3, "stream window stream"),
    (4, ""),
    (5, "unique solitary specimen"),
    (6, "query stream table"),
]


def _py_tfidf_top(rows):
    n = len(rows)
    df: dict[str, int] = {}
    tfs = {}
    for doc_id, text in rows:
        words = [w for w in text.split(" ") if w]
        tf: dict[str, int] = {}
        for w in words:
            tf[w] = tf.get(w, 0) + 1
        tfs[doc_id] = tf
        for w in set(words):
            df[w] = df.get(w, 0) + 1
    out = {}
    for doc_id, tf in tfs.items():
        best = None
        for w, t in tf.items():
            score = float(t) * ((n + 1.0) / (df[w] + 1.0))
            key = (-score, w)
            if best is None or key < best[0]:
                best = (key, w, t, df[w], score)
        if best is None:
            out[doc_id] = ("", 0, 0, 0)
        else:
            _, w, t, d, score = best
            out[doc_id] = (w, t, d, int(round(score * textops.SCORE_SCALE)))
    return out


def test_tfidf_top_matches_python_mirror(spark):
    docs = _docs_df(spark, DOCS)
    got = {
        r["doc_id"]: (r["top_term"], r["top_tf"], r["top_df"], r["tfidf_micro"])
        for r in textops.tfidf_top(docs).collect()
    }
    assert got == _py_tfidf_top(DOCS)


def test_tfidf_top_empty_doc_present_with_zeroes(spark):
    got = {r["doc_id"]: r for r in textops.tfidf_top(_docs_df(spark, DOCS)).collect()}
    assert got[4]["top_term"] == ""
    assert got[4]["top_tf"] == 0 and got[4]["tfidf_micro"] == 0


def test_tfidf_tie_breaks_by_term_ascending(spark):
    # two words with identical (tf, df) -> identical score; 'alpha' wins
    docs = _docs_df(spark, [(1, "beta alpha"), (2, "beta alpha")])
    got = {r["doc_id"]: r["top_term"] for r in textops.tfidf_top(docs).collect()}
    assert got == {1: "alpha", 2: "alpha"}


def _py_bm25(rows, terms, k1, b):
    n = len(rows)
    dls = {}
    tfs = {}
    df = {t: 0 for t in terms}
    for doc_id, text in rows:
        words = [w for w in text.split(" ") if w]
        dls[doc_id] = len(words)
        tf = {t: words.count(t) for t in terms}
        tfs[doc_id] = tf
        for t in terms:
            if tf[t] > 0:
                df[t] += 1
    avgdl = sum(dls.values()) / float(n)
    out = {}
    for doc_id, tf in tfs.items():
        dl = dls[doc_id]
        score = 0.0
        hits = 0
        for t in terms:
            if tf[t] == 0:
                continue
            hits += 1
            idf = (n - df[t] + 0.5) / (df[t] + 0.5) + 1.0
            norm = k1 * ((1.0 - b) + b * (dl / avgdl))
            score = score + idf * (tf[t] * (k1 + 1.0)) / (tf[t] + norm)
        out[doc_id] = (dl, hits, int(round(score * textops.SCORE_SCALE)))
    return out


def test_bm25_matches_python_mirror(spark):
    docs = _docs_df(spark, DOCS)
    got = {
        r["doc_id"]: (r["dl"], r["n_hit"], r["bm25_micro"])
        for r in textops.bm25(docs).collect()
    }
    want = _py_bm25(DOCS, textops.BM25_QUERY, textops.BM25_K1, textops.BM25_B)
    assert set(got) == set(want)
    for k in got:
        assert got[k][:2] == want[k][:2]
        # float mirrors may differ in the last ulp of the sum; micro
        # scale leaves ~1e-6 slack
        assert abs(got[k][2] - want[k][2]) <= 1, (k, got[k], want[k])


def test_bm25_absent_terms_and_empty_doc_score_zero(spark):
    got = {r["doc_id"]: r for r in textops.bm25(_docs_df(spark, DOCS)).collect()}
    assert got[4]["dl"] == 0 and got[4]["n_hit"] == 0 and got[4]["bm25_micro"] == 0
    assert got[5]["n_hit"] == 0 and got[5]["bm25_micro"] == 0
    assert got[6]["n_hit"] == 3


def test_bm25_rejects_empty_query(spark):
    try:
        textops.bm25(_docs_df(spark, DOCS), terms=())
    except ValueError as e:
        assert "at least one" in str(e)
    else:
        raise AssertionError("expected ValueError")


def test_bm25_rank_consistent_with_ln_idf_single_term(spark):
    """Rational idf is a monotone transform of the classic ln idf, so
    single-term document RANKING must agree with a textbook-BM25 mirror."""
    rows = [(i, " ".join(["query"] * (i % 4) + ["pad"] * (3 + i))) for i in range(1, 9)]
    docs = _docs_df(spark, rows)
    got = textops.bm25(docs, terms=("query",)).collect()
    ours = sorted(got, key=lambda r: (-r["bm25_micro"], r["doc_id"]))
    n = len(rows)
    dls = {d: len([w for w in t.split() if w]) for d, t in rows}
    tf = {d: t.split().count("query") for d, t in rows}
    dfq = sum(1 for v in tf.values() if v > 0)
    avgdl = sum(dls.values()) / n
    k1, b = textops.BM25_K1, textops.BM25_B

    def classic(d):
        if tf[d] == 0:
            return 0.0
        idf = math.log((n - dfq + 0.5) / (dfq + 0.5) + 1.0)
        return idf * tf[d] * (k1 + 1) / (tf[d] + k1 * (1 - b + b * dls[d] / avgdl))

    want = sorted(rows, key=lambda r: (-classic(r[0]), r[0]))
    assert [r["doc_id"] for r in ours] == [r[0] for r in want]


def test_tfidf_plan_stays_jvm_side(spark):
    """No Python workers anywhere in either scoring plan."""
    docs = _docs_df(spark, DOCS)
    for frame in (textops.tfidf_top(docs), textops.bm25(docs)):
        plan = frame._jdf.queryExecution().executedPlan().toString()
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
