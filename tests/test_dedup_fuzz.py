"""Differential fuzz for the dedup family: adversarial mini-corpora
(tiny colliding vocab, duplicate blocks, empty / whitespace / short /
underscore-bearing docs) against an independent pure-Python brute force
mirroring the documented contracts:

- exact_duplicates == group-identical-text (keep min id, copies > 1)
- ngram_jaccard_pairs == distinct-3-gram Jaccard >= tau over all pairs
- containment_pairs   == common / min(|S1|,|S2|) >= tau
- minhash_lsh_pairs   is a SUBSET of the exact-Jaccard pairs with
  correct Jaccard values, and NEVER misses identical shingle sets
  (identical sets => identical signatures => every band collides)
- duplicate_clusters  == union-find min-label components of the pairs
- simhash_pairs reports hamming 0 for identical shingle sets

Reference contract: the reference has no text dedup — these operators
are the beyond-reference pipeline surface (SURVEY.md LLM-pipeline
table); the gate oracles check them on the fixed corpus, this suite on
adversarial shapes the corpus never produces.
"""

import pytest
from hypothesis import HealthCheck, given, settings, strategies as st

from ds_jedai_spark.operators import dedup
from conftest import fuzz_examples

VOCAB = ["alpha", "beta", "gamma", "delta", "eps", "x_y", "ümlaut", "a,b."]

_doc = st.lists(st.sampled_from(VOCAB), min_size=0, max_size=9).map(
    " ".join
)


@st.composite
def corpus(draw):
    n = draw(st.integers(2, 12))
    texts = [draw(_doc) for _ in range(n)]
    # duplicate block: exact copies stress exact dedup + lsh identical-set law
    if draw(st.booleans()):
        texts.extend(texts[: min(3, len(texts))])
    # a double-space doc: split produces empty tokens (dropped)
    if draw(st.booleans()):
        texts.append("alpha  beta   gamma alpha beta gamma")
    return list(enumerate(texts))


def _shingle_set(text, n=3):
    toks = [w for w in text.split(" ") if w != ""]
    return {"_".join(toks[i:i + n]) for i in range(len(toks) - n + 1)}


def _brute_pairs(rows, tau, metric):
    sets = {i: _shingle_set(t) for i, t in rows}
    out = {}
    ids = sorted(sets)
    for a in range(len(ids)):
        for b in range(a + 1, len(ids)):
            i, j = ids[a], ids[b]
            s1, s2 = sets[i], sets[j]
            common = len(s1 & s2)
            if not common:
                continue
            if metric == "jaccard":
                v = common / (len(s1) + len(s2) - common)
            else:
                v = common / min(len(s1), len(s2))
            if v >= tau:
                out[(i, j)] = v
    return out


def _brute_clusters(pairs, tau=0.25):
    parent = {}

    def find(x):
        while parent.get(x, x) != x:
            parent[x] = parent.get(parent[x], parent[x])
            x = parent[x]
        return x

    for i, j in pairs:
        parent.setdefault(i, i), parent.setdefault(j, j)
        ri, rj = find(i), find(j)
        if ri != rj:
            parent[max(ri, rj)] = min(ri, rj)
    return {x: find(x) for x in parent}


@pytest.mark.usefixtures("spark")
@given(corpus())
@settings(max_examples=fuzz_examples(10), deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_dedup_family_matches_brute_force(spark, rows):
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    sh = dedup.pin_shingles(docs)

    # exact duplicates
    got_exact = {(r.keep_id, r.copies)
                 for r in dedup.exact_duplicates(docs).collect()}
    groups = {}
    for i, t in rows:
        groups.setdefault(t, []).append(i)
    want_exact = {(min(g), len(g)) for g in groups.values() if len(g) > 1}
    assert got_exact == want_exact

    # exact n-gram Jaccard and containment
    got_j = {(r.d1, r.d2): r.jaccard
             for r in dedup.ngram_jaccard_pairs(docs, tau=0.25, sh=sh).collect()}
    assert got_j == _brute_pairs(rows, 0.25, "jaccard")
    got_c = {(r.d1, r.d2): r.containment
             for r in dedup.containment_pairs(docs, tau=0.5, sh=sh).collect()}
    assert got_c == _brute_pairs(rows, 0.5, "containment")

    # LSH: subset of the exact pairs, correct values, identical sets found
    all_j = _brute_pairs(rows, 0.25, "jaccard")
    got_l = {(r.d1, r.d2): r.jaccard
             for r in dedup.minhash_lsh_pairs(docs, tau=0.25, sh=sh).collect()}
    assert set(got_l) <= set(all_j)
    assert all(all_j[p] == v for p, v in got_l.items())
    sets = {i: _shingle_set(t) for i, t in rows}
    identical = {(i, j) for (i, j) in all_j
                 if sets[i] == sets[j] and sets[i]}
    assert identical <= set(got_l)

    # connected components over the exact pairs
    pairs_df = dedup.ngram_jaccard_pairs(docs, tau=0.25, sh=sh)
    got_cl = {r[0]: r[1]
              for r in dedup.duplicate_clusters(pairs_df).collect()}
    assert got_cl == _brute_clusters(set(all_j))

    # simhash: identical shingle sets collide at hamming 0
    got_s = {(r.d1, r.d2): r.hamming
             for r in dedup.simhash_pairs(docs, sh=sh).collect()}
    for p in identical:
        assert got_s.get(p) == 0
