"""Property tests for the round-6 session-2 pure kernels (hypothesis):
merged pseudo-term postings, RRF fusion, fvf modifiers, random_score
hash, span-first counting."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from hail_elasticsearch_pipelines_spark.operators.bm25 import (
    _merge_posting_variants,
    _phrase_match_counts,
)
from hail_elasticsearch_pipelines_spark.operators.docvalues import (
    fvf_factor_values,
    random_score_values,
)
from hail_elasticsearch_pipelines_spark.operators.hybrid import rrf_fuse

# a tiny corpus: doc -> token list over a small alphabet
CORPUS = st.lists(
    st.lists(st.sampled_from("abcde"), min_size=1, max_size=12),
    min_size=1,
    max_size=8,
)


def _posting(docs_tokens, term):
    """(d, dl, pos, offs) for one term over the toy corpus."""
    d, dl, pos, offs = [], [], [], [0]
    for i, toks in enumerate(docs_tokens):
        ps = [j for j, t in enumerate(toks) if t == term]
        if ps:
            d.append(i)
            dl.append(len(toks))
            pos.extend(ps)
            offs.append(len(pos))
    return (
        np.asarray(d, np.int64),
        np.asarray(dl, np.int64),
        np.asarray(pos, np.int64),
        np.asarray(offs, np.int64),
    )


@settings(max_examples=200, deadline=None)
@given(CORPUS, st.sets(st.sampled_from("abcde"), min_size=1, max_size=3))
def test_merge_posting_variants_equals_naive(docs_tokens, variants):
    entries = [
        _posting(docs_tokens, t)
        for t in sorted(variants)
        if _posting(docs_tokens, t)[0].size
    ]
    if not entries:
        return
    d, dl, pos, offs = _merge_posting_variants(entries)
    # naive: per doc, sorted union of the variant positions
    vset = sorted(variants)
    expect = {}
    for i, toks in enumerate(docs_tokens):
        ps = sorted(j for j, t in enumerate(toks) if t in vset)
        if ps:
            expect[i] = ps
    assert d.tolist() == sorted(expect)
    for row, doc in enumerate(d.tolist()):
        assert pos[offs[row] : offs[row + 1]].tolist() == expect[doc]
        assert dl[row] == len(docs_tokens[doc])


@settings(max_examples=200, deadline=None)
@given(CORPUS, st.sampled_from("abcde"), st.sets(st.sampled_from("abcde"), min_size=1, max_size=3), st.integers(0, 2))
def test_phrase_prefix_kernel_vs_bruteforce(docs_tokens, lead, variants, slop):
    """lead token then ANY variant within the slop window == the merged
    pseudo-term chain count."""
    from hail_elasticsearch_pipelines_spark.operators.bm25 import _PFX_SLOT

    post = {}
    lp = _posting(docs_tokens, lead)
    if not lp[0].size:
        return
    post[lead] = lp
    entries = [
        _posting(docs_tokens, t)
        for t in sorted(variants)
        if _posting(docs_tokens, t)[0].size
    ]
    if not entries:
        return
    post[_PFX_SLOT] = _merge_posting_variants(entries)
    common = np.intersect1d(post[lead][0], post[_PFX_SLOT][0], assume_unique=True)
    tfs = _phrase_match_counts(post, [lead, _PFX_SLOT], common, slop)
    vset = set(variants)
    for row, doc in enumerate(common.tolist()):
        toks = docs_tokens[doc]
        brute = sum(
            1
            for i, t in enumerate(toks)
            if t == lead
            and any(
                i < j <= i + 1 + slop and toks[j] in vset
                for j in range(i + 1, min(len(toks), i + 2 + slop))
            )
        )
        assert tfs[row] == brute, (doc, toks, lead, sorted(vset), slop)


@settings(max_examples=200, deadline=None)
@given(
    st.lists(
        st.lists(st.integers(0, 30), max_size=12, unique=True),
        min_size=1,
        max_size=4,
    ),
    st.integers(1, 200),
)
def test_rrf_fuse_properties(rankings, rc):
    fused = rrf_fuse(rankings, k=1000, rank_constant=rc)
    scores = dict(fused)
    # brute-force recompute
    expect: dict[int, float] = {}
    for ranked in rankings:
        for rank, doc in enumerate(ranked, start=1):
            expect[doc] = expect.get(doc, 0.0) + 1.0 / (rc + rank)
    assert scores == expect
    vals = [s for _d, s in fused]
    assert vals == sorted(vals, reverse=True)
    ids_at = [d for d, s in fused]
    for (d1, s1), (d2, s2) in zip(fused, fused[1:]):
        if s1 == s2:
            assert d1 < d2


@settings(max_examples=100, deadline=None)
@given(st.lists(st.integers(0, 10**6), min_size=1, max_size=50, unique=True), st.integers(0, 0))
def test_fvf_modifiers_monotone(vals, _):
    v = np.asarray(sorted(vals), np.float64)
    for mod in ("none", "log1p", "sqrt"):
        f = fvf_factor_values(v, 0.5, mod)
        assert np.all(np.diff(f) >= 0), mod  # monotone in the value
    import pytest

    with pytest.raises(Exception):
        fvf_factor_values(np.array([-1.0]), 1.0, "sqrt")


@settings(max_examples=100, deadline=None)
@given(st.lists(st.integers(0, 2**62), min_size=1, max_size=100, unique=True), st.integers(0, 2**31))
def test_random_score_range_and_determinism(ids, seed):
    docs = np.asarray(ids, np.int64)
    r1 = random_score_values(docs, seed)
    r2 = random_score_values(docs, seed)
    assert np.array_equal(r1, r2)
    assert np.all((0.0 <= r1) & (r1 < 1.0))
