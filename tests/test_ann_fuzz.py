"""Differential fuzz for the ANN family: lattice embeddings (exact
under floor(x*1000) quantization) including zero-quantizing and
duplicate vectors, against a pure-Python mirror of the documented
contracts:

- brute_topk == python top-k by (cos DESC, vid ASC) excluding self,
  cos = dot/sqrt(n1*n2) over quantized ints, 0 for zero-norm vectors
  (the ANSI DIVIDE_BY_ZERO guard, r11)
- ivf_multiprobe_topk with nprobe >= n_cells degenerates to brute
  (every cell probed => candidate set is the whole corpus)
- lsh_neardup_pairs is a SUBSET of exact cosine pairs with correct
  values and never misses identical quantized vectors (equal vectors
  share every band bucket; cos = 1 >= tau)

The gate oracles check these on the fixed corpus; this suite covers
adversarial shapes (zero vectors, duplicates, tiny corpora) the corpus
never produces.
"""

import math

import pytest
from hypothesis import HealthCheck, given, settings, strategies as st
from pyspark.sql import functions as F

from ds_jedai_spark.operators import similarity
from conftest import fuzz_examples

_val = st.integers(-16, 16).map(lambda v: v / 8.0)


@st.composite
def corpus(draw):
    dim = draw(st.integers(2, 4))
    n = draw(st.integers(3, 10))
    rows = [[draw(_val) for _ in range(dim)] for _ in range(n)]
    if draw(st.booleans()):
        rows.append(list(rows[0]))  # exact duplicate vector
    if draw(st.booleans()):
        rows.append([0.0001] * dim)  # quantizes to the zero vector
    return [(i, 0, v) for i, v in enumerate(rows)]


def _q(v):
    return [math.floor(x * 1000) for x in v]


def _cos_py(a, b):
    qa, qb = _q(a), _q(b)
    n1 = sum(x * x for x in qa)
    n2 = sum(x * x for x in qb)
    if n1 == 0 or n2 == 0:
        return 0.0
    return sum(x * y for x, y in zip(qa, qb)) / math.sqrt(float(n1) * float(n2))


def _brute_py(rows, k):
    out = set()
    for qid, _, qv in rows:
        scored = sorted(
            ((-_cos_py(qv, v), vid) for vid, _, v in rows if vid != qid)
        )[:k]
        out.update((qid, vid, -negcos) for negcos, vid in scored)
    return out


@pytest.mark.usefixtures("spark")
@given(corpus())
@settings(max_examples=fuzz_examples(8), deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_ann_family_matches_brute_force(spark, rows):
    emb = spark.createDataFrame(
        rows, "vec_id long, label long, embedding array<double>"
    )
    n, k = len(rows), 3
    want = _brute_py(rows, k)

    got = {(r.qid, r.vid, r.cos)
           for r in similarity.brute_topk(emb, n_queries=n, k=k).collect()}
    assert got == want, (rows, got ^ want)

    # full-probe IVF == brute (train_centroids default is 8 cells)
    got_ivf = {(r.qid, r.vid, r.cos)
               for r in similarity.ivf_multiprobe_topk(
                   emb, k=k, nprobe=8,
                   query_pred=F.col("vec_id") >= 0).collect()}
    assert got_ivf == want, (rows, got_ivf ^ want)

    # LSH: subset with exact values; identical nonzero vectors found
    tau = 0.5
    exact = {}
    for i, _, a in rows:
        for j, _, b in rows:
            if i < j and _cos_py(a, b) >= tau:
                exact[(i, j)] = _cos_py(a, b)
    got_lsh = {(r.d1, r.d2): r.cos
               for r in similarity.lsh_neardup_pairs(emb, tau=tau).collect()}
    assert set(got_lsh) <= set(exact)
    assert all(exact[p] == v for p, v in got_lsh.items())
    identical = {(i, j) for (i, j) in exact
                 if _q(rows[i][2]) == _q(rows[j][2])
                 and any(_q(rows[i][2]))}
    assert identical <= set(got_lsh)


def test_zero_vector_cosine_is_zero_not_an_error(spark):
    """Deterministic pin for the r11 ANSI guard: an all-near-zero
    embedding quantizes to the zero vector; every cosine path must rank
    it last at cos 0 instead of raising DIVIDE_BY_ZERO."""
    emb = spark.createDataFrame(
        [(0, 0, [0.5, 0.25]), (1, 0, [0.0001, 0.0002]), (2, 0, [0.25, 0.5])],
        "vec_id long, label long, embedding array<double>",
    )
    rows = similarity.brute_topk(emb, n_queries=3, k=2).collect()
    zc = [r.cos for r in rows if r.qid == 1 or r.vid == 1]
    assert zc and all(c == 0.0 for c in zc)
    pairs = similarity.cosine_neardup_pairs(emb, tau=0.5).collect()
    assert {(r.v1, r.v2) for r in pairs} == {(0, 2)}
