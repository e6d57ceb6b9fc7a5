"""Property-based checks (hypothesis) for the round-5 pure kernels:
Levenshtein, best-window selection, snippet assembly, and the
minimum_should_match scorer — each against a brute-force reference."""

from __future__ import annotations

from functools import lru_cache

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from hail_elasticsearch_pipelines_spark.functions.snippets import (
    best_window,
    py_highlight,
)
from hail_elasticsearch_pipelines_spark.operators.bm25 import (
    _msm_scores,
    py_levenshtein,
)

WORDS = st.text(alphabet="ab1", min_size=0, max_size=7)


def _lev_ref(a: str, b: str) -> int:
    @lru_cache(maxsize=None)
    def d(i: int, j: int) -> int:
        if i == 0:
            return j
        if j == 0:
            return i
        return min(
            d(i - 1, j) + 1,
            d(i, j - 1) + 1,
            d(i - 1, j - 1) + (a[i - 1] != b[j - 1]),
        )

    return d(len(a), len(b))


@settings(max_examples=300, deadline=None)
@given(WORDS, WORDS)
def test_levenshtein_matches_reference(a, b):
    assert py_levenshtein(a, b) == _lev_ref(a, b)
    assert py_levenshtein(a, b) == py_levenshtein(b, a)


@settings(max_examples=200, deadline=None)
@given(
    st.lists(st.integers(0, 400), min_size=0, max_size=12),
    st.integers(1, 60),
)
def test_best_window_matches_bruteforce(starts, window):
    spans = sorted((s, s + 3, "t") for s in set(starts))

    def count(i):
        return sum(
            1 for j in range(i, len(spans)) if spans[j][1] - spans[i][0] <= window
        )

    got_i, got_j = best_window(spans, window)
    got = got_j - got_i
    best = max((count(i) for i in range(len(spans))), default=0)
    assert got == best
    # earliest tie: no earlier start achieves the same count
    for i in range(got_i):
        assert count(i) < got or spans[i][0] >= spans[got_i][0]


TOKENS = st.lists(
    st.sampled_from(["alpha", "beta", "gamma", "xx", "needle", "y7"]),
    min_size=1,
    max_size=60,
)


@settings(max_examples=150, deadline=None)
@given(TOKENS, st.integers(10, 200))
def test_highlight_invariants(tokens, window):
    text = " ".join(tokens)
    terms = {"needle", "beta"}
    snippet, n = py_highlight(text, terms, window_chars=window)
    expected_total = sum(1 for t in tokens if t in terms)
    if expected_total == 0:
        assert snippet is None and n == 0
        return
    assert 1 <= n <= expected_total
    assert snippet.count("<em>") == snippet.count("</em>") >= n
    # stripping tags and ellipses yields a contiguous slice of the text
    body = snippet.strip("…").replace("<em>", "").replace("</em>", "")
    assert body in text
    # every tagged token is a query term
    import re

    for m in re.finditer(r"<em>(.*?)</em>", snippet):
        assert m.group(1) in terms


@settings(max_examples=150, deadline=None)
@given(
    st.dictionaries(
        st.sampled_from(["a", "b", "c", "d"]),
        st.lists(st.integers(0, 30), min_size=1, max_size=10),
        min_size=1,
        max_size=4,
    ),
    st.integers(1, 4),
)
def test_msm_scores_matches_bruteforce(doc_lists, msm):
    postings = {}
    for t, docs in doc_lists.items():
        d = np.unique(np.asarray(docs, np.int64))
        postings[t] = (d, np.ones(d.size, np.int64), np.full(d.size, 5, np.int64))
    terms = sorted(postings)
    idf = {t: 1.0 + i for i, t in enumerate(terms)}
    docs, scores = _msm_scores(postings, terms, idf, 5.0, msm)
    # brute force
    from collections import defaultdict

    per_doc = defaultdict(list)
    for t in terms:
        for dd in postings[t][0].tolist():
            per_doc[dd].append(t)
    keep = sorted(d for d, ts in per_doc.items() if len(ts) >= msm)
    assert docs.tolist() == keep
    from hail_elasticsearch_pipelines_spark.operators.index_build import (
        bm25_tf_weight,
    )

    w = float(
        bm25_tf_weight(np.array([1], np.int64), np.array([5], np.int64), 5.0)[0]
    )
    for dd, s in zip(docs.tolist(), scores.tolist()):
        assert s == sum(idf[t] * w for t in sorted(per_doc[dd]))


# ---- regexp literal-prefix pruning soundness --------------------------
# An UNSOUND prefix would silently drop matching terms from regexp
# expansions (wrong results, no error) — so the property is load-bearing:
# every string the anchored pattern matches must start with one of
# regexp_prefixes(pattern) whenever that list is non-empty.

_lit = st.text(alphabet="abc01", min_size=1, max_size=4)


@st.composite
def _safe_pattern(draw, depth=0):
    parts = []
    for _ in range(draw(st.integers(1, 3))):
        kind = draw(st.integers(0, 5 if depth < 2 else 3))
        if kind == 0:
            parts.append(draw(_lit))
        elif kind == 1:
            parts.append(".")
        elif kind == 2:
            parts.append("[" + draw(st.text(alphabet="abc01", min_size=1, max_size=3)) + "]")
        elif kind == 3:
            parts.append(draw(_lit) + draw(st.sampled_from(["*", "+", "?"])))
        elif kind == 4:
            parts.append("(" + draw(_safe_pattern(depth + 1)) + ")")
        else:
            parts.append(
                "(" + draw(_safe_pattern(depth + 1)) + "|" + draw(_safe_pattern(depth + 1)) + ")"
            )
    pat = "".join(parts)
    if depth == 0 and draw(st.booleans()):
        pat = pat + "|" + draw(_safe_pattern(1))
    return pat


@settings(max_examples=300, deadline=None)
@given(_safe_pattern(), st.text(alphabet="abc01", min_size=0, max_size=10))
def test_regexp_prefixes_sound(pattern, term):
    import re

    from hail_elasticsearch_pipelines_spark.operators.bm25 import (
        check_regexp,
        regexp_prefixes,
    )

    try:
        check_regexp(pattern)
    except ValueError:
        return  # outside the supported dialect — expansion rejects it
    prefixes = regexp_prefixes(pattern)
    if not prefixes:
        return  # full scan: trivially sound
    if re.fullmatch(pattern, term):
        assert any(term.startswith(p) for p in prefixes), (pattern, term, prefixes)


@settings(max_examples=200, deadline=None)
@given(st.data(), _safe_pattern())
def test_regexp_prefixes_sound_on_matching_terms(data, pattern):
    """Non-vacuous variant: terms DRAWN FROM the pattern itself (every
    drawn term matches by construction) must start with a prefix."""
    from hail_elasticsearch_pipelines_spark.operators.bm25 import (
        check_regexp,
        regexp_prefixes,
    )

    try:
        check_regexp(pattern)
    except ValueError:
        return
    prefixes = regexp_prefixes(pattern)
    if not prefixes:
        return
    term = data.draw(st.from_regex(pattern, fullmatch=True))
    assert any(term.startswith(p) for p in prefixes), (pattern, term, prefixes)
