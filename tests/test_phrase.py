"""Positional index + exact-phrase BM25: rank- and score-identical to
the oracle on the small corpus, across the distributed and local paths."""

from __future__ import annotations

import numpy as np
import pytest

from hail_elasticsearch_pipelines_spark.functions import codecs
from hail_elasticsearch_pipelines_spark.operators.bm25 import IndexSearcher
from hail_elasticsearch_pipelines_spark.operators.serve import LocalSearcher

PHRASES = [
    ["the", "of"],
    ["of", "the", "and"],
    ["term0042", "the"],
    ["the", "zzznotaterm"],
    ["the", "the"],
]


@pytest.fixture(scope="module")
def searcher(spark, small_index):
    return IndexSearcher(spark, small_index[0])


@pytest.fixture(scope="module")
def local_searcher(small_index):
    return LocalSearcher(small_index[0])


def test_positions_stored_exactly(spark, small_index, small_oracle):
    """Decoded positions must equal the token positions in the oracle."""
    oracle, _ = small_oracle
    rows = spark.read.parquet(f"{small_index[0]}/postings").filter(
        "term = 'term0042'"
    ).collect()
    got: dict[int, list[int]] = {}
    for r in sorted(rows, key=lambda r: r["min_doc"]):
        d, tf, _ = codecs.decode_postings(bytes(r["blob"]))
        pos, offs = codecs.decode_position_lists(bytes(r["pos_blob"]), tf)
        for i, doc in enumerate(d.tolist()):
            got[doc] = pos[offs[i] : offs[i + 1]].tolist()
    for doc, toks in oracle.doc_tokens.items():
        expected = [i for i, t in enumerate(toks) if t == "term0042"]
        assert got.get(doc, []) == expected, doc


@pytest.mark.parametrize("phrase", PHRASES, ids=lambda p: "_".join(p))
def test_phrase_matches_oracle_distributed(searcher, small_oracle, phrase):
    oracle, _ = small_oracle
    expected = oracle.phrase_topk(phrase, k=10)
    got = [(r["doc_id"], r["score"]) for r in searcher.search_phrase(phrase, k=10).collect()]
    assert [d for d, _ in got] == [d for d, _ in expected], phrase
    for (gd, gs), (_, es) in zip(got, expected):
        assert gs == es, (phrase, gd)


@pytest.mark.parametrize("phrase", PHRASES, ids=lambda p: "_".join(p))
def test_phrase_matches_oracle_local(local_searcher, small_oracle, phrase):
    oracle, _ = small_oracle
    expected = oracle.phrase_topk(phrase, k=10)
    got = local_searcher.search_phrase(phrase, k=10)
    assert [d for d, _ in got] == [d for d, _ in expected], phrase
    for (gd, gs), (_, es) in zip(got, expected):
        assert gs == es, (phrase, gd)


def test_overlapping_phrase_occurrences(small_oracle):
    """'a a' in 'a a a' counts twice (sliding window, not replace)."""
    oracle, _ = small_oracle
    tfs = oracle.phrase_tfs(["the", "the"])
    # spot-check one doc by brute force
    for d, tf in list(tfs.items())[:5]:
        toks = oracle.doc_tokens[d]
        brute = sum(1 for i in range(len(toks) - 1) if toks[i] == toks[i + 1] == "the")
        assert tf == brute


def test_position_stream_roundtrip_random():
    rng = np.random.default_rng(42)
    for _ in range(100):
        tfs = rng.integers(1, 10, rng.integers(1, 25))
        pos = np.concatenate(
            [np.sort(rng.choice(3000, tf, replace=False)) for tf in tfs]
        ).astype(np.int64)
        blob = codecs.encode_position_lists(pos, tfs)
        got, offs = codecs.decode_position_lists(blob, tfs)
        np.testing.assert_array_equal(got, pos)
        np.testing.assert_array_equal(offs, np.concatenate(([0], np.cumsum(tfs))))


def test_phrase_requires_positions(spark, tmp_path):
    """An index built with with_positions=False must REJECT phrase
    queries loudly (round-2 advice: it used to return silently-empty
    results indistinguishable from a genuine miss)."""
    import numpy as np
    import pytest

    from hail_elasticsearch_pipelines_spark.operators.bm25 import IndexSearcher
    from hail_elasticsearch_pipelines_spark.operators.index_build import build_index
    from hail_elasticsearch_pipelines_spark.operators.serve import LocalSearcher
    from hail_elasticsearch_pipelines_spark.sources.corpus import gen_pages_pdf

    out = str(tmp_path / "nopos")
    build_index(
        spark,
        spark.createDataFrame(gen_pages_pdf(np.arange(30))),
        out,
        docs_per_part=16,
        seg_group=2,
        n_term_buckets=4,
        with_positions=False,
    )
    with pytest.raises(ValueError, match="with_positions"):
        IndexSearcher(spark, out).search_phrase(["the", "of"], k=5)
    with pytest.raises(ValueError, match="with_positions"):
        LocalSearcher(out).search_phrase(["the", "of"], k=5)


def test_phrase_match_counts_vs_naive_random():
    """The vectorized adjacency matcher must agree with a per-doc naive
    walk on randomized position data, including repeated phrase terms
    and zero-match docs."""
    import numpy as np

    from hail_elasticsearch_pipelines_spark.operators.bm25 import (
        _phrase_match_counts,
    )

    rng = np.random.default_rng(123)
    for trial in range(30):
        n_docs = int(rng.integers(1, 40))
        vocab = ["a", "b", "c", "d"]
        phrase = [vocab[int(i)] for i in rng.integers(0, 4, int(rng.integers(2, 5)))]
        # build per-term postings over a shared doc space
        post = {}
        doc_tokens = {
            doc: [vocab[int(i)] for i in rng.integers(0, 4, int(rng.integers(1, 30)))]
            for doc in range(n_docs)
        }
        for t in set(vocab):
            d, pos, offs = [], [], [0]
            for doc in range(n_docs):
                p = [i for i, tok in enumerate(doc_tokens[doc]) if tok == t]
                if p:
                    d.append(doc)
                    pos.extend(p)
                    offs.append(len(pos))
            post[t] = (
                np.asarray(d, dtype=np.int64),
                np.ones(len(d), dtype=np.int64),
                np.asarray(pos, dtype=np.int64),
                np.asarray(offs, dtype=np.int64),
            )
        from functools import reduce

        uniq = list(dict.fromkeys(phrase))
        if any(post[t][0].size == 0 for t in uniq):
            continue
        common = reduce(
            lambda a, b: np.intersect1d(a, b, assume_unique=True),
            (post[t][0] for t in uniq),
        )
        got = _phrase_match_counts(post, phrase, common)
        # naive: count adjacency chains directly over doc_tokens
        for j, doc in enumerate(common.tolist()):
            toks = doc_tokens[doc]
            naive = sum(
                1
                for s in range(len(toks) - len(phrase) + 1)
                if toks[s : s + len(phrase)] == phrase
            )
            assert got[j] == naive, (trial, doc, phrase, toks)


# ---- slop (ES match_phrase slop, in-order window) --------------------


def _naive_slop_tf(tokens: list[str], phrase: list[str], slop: int) -> int:
    """Brute-force greedy-chain start count over one token list."""
    n = 0
    for p0, t in enumerate(tokens):
        if t != phrase[0]:
            continue
        prev = p0
        ok = True
        for i in range(1, len(phrase)):
            nxt = next(
                (
                    q
                    for q in range(prev + 1, p0 + i + slop + 1)
                    if q < len(tokens) and tokens[q] == phrase[i]
                ),
                None,
            )
            if nxt is None:
                ok = False
                break
            prev = nxt
        if ok:
            n += 1
    return n


def test_slop_kernel_vs_bruteforce():
    """_phrase_match_counts(slop=N) against a per-doc python walk on
    randomized synthetic position data."""
    import numpy as np

    from hail_elasticsearch_pipelines_spark.operators.bm25 import (
        _phrase_match_counts,
    )

    rng = np.random.default_rng(7)
    vocab = ["a", "b", "c", "d"]
    for trial in range(30):
        docs = [
            [vocab[j] for j in rng.integers(0, len(vocab), rng.integers(3, 30))]
            for _ in range(12)
        ]
        phrase = [vocab[j] for j in rng.integers(0, len(vocab), rng.integers(2, 4))]
        slop = int(rng.integers(0, 4))
        # build post dict in the kernel's shape for docs containing all terms
        common = np.array(
            [i for i, d in enumerate(docs) if all(t in d for t in set(phrase))],
            dtype=np.int64,
        )
        post = {}
        for t in set(phrase):
            ids, poss, offs = [], [], [0]
            for i, d in enumerate(docs):
                ps = [j for j, tok in enumerate(d) if tok == t]
                if ps:
                    ids.append(i)
                    poss.extend(ps)
                    offs.append(len(poss))
            post[t] = (
                np.array(ids, np.int64),
                None,
                np.array(poss, np.int64),
                np.array(offs, np.int64),
            )
        if not common.size:
            continue
        got = _phrase_match_counts(post, list(phrase), common, slop)
        want = [_naive_slop_tf(docs[int(i)], list(phrase), slop) for i in common]
        assert got.tolist() == want, (trial, phrase, slop)


def test_slop_zero_is_exact_phrase(spark, small_index):
    out, _m = small_index
    s = IndexSearcher(spark, out)
    exact = [(r.doc_id, r.score) for r in s.search_phrase(["of", "the"], k=10).collect()]
    slop0 = [(r.doc_id, r.score) for r in s.search_phrase(["of", "the"], k=10, slop=0).collect()]
    assert exact == slop0


def test_slop_parity_and_widening(spark, small_index):
    from hail_elasticsearch_pipelines_spark.operators.serve import LocalSearcher

    out, _m = small_index
    s, L = IndexSearcher(spark, out), LocalSearcher(out)
    ph = ["term0020", "the"]
    for slop in (1, 3):
        d = [(r.doc_id, r.score) for r in s.search_phrase(ph, k=50, slop=slop).collect()]
        loc = L.search_phrase(ph, k=50, slop=slop)
        assert d == loc
    # widening slop can only grow the match set
    n0 = s.search_phrase(ph, k=1000, slop=0).count()
    n3 = s.search_phrase(ph, k=1000, slop=3).count()
    assert n3 >= n0 and n3 > 0
    # in-order only: the window never licenses a reversed phrase the
    # corpus lacks... verify via the kernel contract instead: reversed
    # phrase matches are exactly the docs with the reversed chain
    rev = L.search_phrase(list(reversed(ph)), k=1000, slop=1)
    fwd = L.search_phrase(ph, k=1000, slop=1)
    assert {d for d, _ in rev} != {d for d, _ in fwd} or not fwd


def test_slop_negative_raises(spark, small_index):
    out, _m = small_index
    s = IndexSearcher(spark, out)
    with pytest.raises(Exception):
        s.search_phrase(["of", "the"], k=5, slop=-1).collect()


# ---- rescore (ES rescore API, score_mode: total) ----------------------


def test_rescore_parity_and_semantics(spark, small_index):
    from hail_elasticsearch_pipelines_spark.operators.serve import LocalSearcher

    out, _m = small_index
    s = IndexSearcher(spark, out)
    L = LocalSearcher(out)
    kw = dict(k=10, window_size=40, query_weight=1.0, rescore_weight=2.0)
    d = [(r.doc_id, r.score) for r in s.search_rescore(["of", "the"], ["of", "the"], **kw).collect()]
    loc = L.search_rescore(["of", "the"], ["of", "the"], **kw)
    assert d == loc and len(d) == 10
    # rescored scores are >= the pure-base contribution, and docs with
    # the phrase outrank equal-base docs without it
    base = dict(L.search(["of", "the"], mode="OR", k=40))
    ph_docs = {i for i, _ in L.search_phrase(["of", "the"], k=10_000)}
    for i, sc in d:
        if i in ph_docs:
            assert sc > base[i]
        else:
            assert sc == base[i]
    # rescoring never admits docs from outside the window
    win = set(base)
    assert all(i in win for i, _ in d)


def test_rescore_weights_and_window(spark, small_index):
    from hail_elasticsearch_pipelines_spark.operators.serve import LocalSearcher

    out, _m = small_index
    L = LocalSearcher(out)
    # rescore_weight=0 == plain base ranking truncated to k
    r0 = L.search_rescore(["of", "the"], ["of", "the"], k=10, window_size=40, rescore_weight=0.0)
    assert r0 == L.search(["of", "the"], mode="OR", k=10)
    with pytest.raises(ValueError):
        L.search_rescore(["the"], ["of", "the"], k=20, window_size=10)
    # slop threads through to the rescore phrase
    r_slop = L.search_rescore(["of", "the"], ["of", "the"], k=10, window_size=40, slop=2)
    assert r_slop  # runs; widened matches can only raise scores
    base = dict(L.search(["of", "the"], mode="OR", k=40))
    assert all(sc >= base[i] for i, sc in r_slop)


# --- match_phrase_prefix (ES autocomplete-as-you-type) ----------------------

PFX_CASES = [
    (["the"], "term004"),       # stopword lead, 10-term expansion
    (["of", "the"], "term00"),  # two-token lead, wide expansion
    (["the"], "of"),            # single-term-ish prefix
    ([], None),                 # placeholder (skipped below)
]


def test_phrase_prefix_matches_oracle(searcher, local_searcher, small_oracle):
    oracle, _ = small_oracle
    for lead, prefix in PFX_CASES:
        if not lead:
            continue
        phrase = lead + [prefix]
        expected = oracle.phrase_prefix_topk(lead, prefix, k=10)
        dist = [
            (r["doc_id"], r["score"])
            for r in searcher.search_phrase_prefix(phrase, k=10).collect()
        ]
        loc = local_searcher.search_phrase_prefix(phrase, k=10)
        assert dist == loc == expected, (lead, prefix)


def test_phrase_prefix_single_expansion_is_exact_phrase(
    searcher, local_searcher
):
    """A prefix expanding to exactly one term must score bit-identically
    to the exact phrase through the merged-pseudo-term path."""
    exp = searcher.expand_prefix("term0042")
    assert exp == ["term0042"]
    a = [
        (r["doc_id"], r["score"])
        for r in searcher.search_phrase_prefix(["the", "term0042"], k=10).collect()
    ]
    b = [
        (r["doc_id"], r["score"])
        for r in searcher.search_phrase(["the", "term0042"], k=10).collect()
    ]
    assert a == b == local_searcher.search_phrase_prefix(["the", "term0042"], k=10)


def test_phrase_prefix_pure_prefix_token(searcher, local_searcher):
    """Single-token query: every occurrence of any expansion counts as
    one chain start (tf = merged occurrences)."""
    dist = [
        (r["doc_id"], r["score"])
        for r in searcher.search_phrase_prefix(["term004"], k=10).collect()
    ]
    loc = local_searcher.search_phrase_prefix(["term004"], k=10)
    assert dist == loc and dist


def test_phrase_prefix_slop_widens(searcher, local_searcher):
    exact = local_searcher.search_phrase_prefix(["the", "term00"], k=500)
    slop2 = local_searcher.search_phrase_prefix(["the", "term00"], k=500, slop=2)
    assert {d for d, _ in exact} <= {d for d, _ in slop2}
    dist = [
        (r["doc_id"], r["score"])
        for r in searcher.search_phrase_prefix(["the", "term00"], k=20, slop=2).collect()
    ]
    assert dist == slop2[:20]


def test_phrase_prefix_no_expansion_and_bad_args(searcher, local_searcher):
    assert searcher.search_phrase_prefix(["the", "zzznope"], k=5).count() == 0
    assert local_searcher.search_phrase_prefix(["the", "zzznope"], k=5) == []
    with pytest.raises(ValueError):
        searcher.search_phrase_prefix([], k=5)
    with pytest.raises(ValueError):
        local_searcher.search_phrase_prefix([], k=5)


def test_span_first_parity_and_bruteforce(searcher, local_searcher, small_oracle):
    """span_first: term within the first N positions, scored as a
    pseudo-term (tf = qualifying occurrences)."""
    oracle, _ = small_oracle
    for term, end in (("the", 5), ("term0042", 12), ("of", 1)):
        tfs = {}
        for d, toks in oracle.doc_tokens.items():
            c = sum(1 for i, t in enumerate(toks[: end]) if t == term)
            if c:
                tfs[d] = c
        expected = oracle._pseudo_term_topk(tfs, 10)
        dist = [
            (r["doc_id"], r["score"])
            for r in searcher.search_span_first(term, end, k=10).collect()
        ]
        loc = local_searcher.search_span_first(term, end, k=10)
        assert dist == loc == expected, (term, end)


def test_span_first_bad_args(searcher, local_searcher):
    with pytest.raises(ValueError):
        searcher.search_span_first("the", 0)
    with pytest.raises(ValueError):
        local_searcher.search_span_first("the", -1)
    assert searcher.search_span_first("zzznope", 5).count() == 0
    assert local_searcher.search_span_first("zzznope", 5) == []
