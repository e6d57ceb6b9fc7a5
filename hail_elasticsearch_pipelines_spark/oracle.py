"""Single-process reference implementation ("the reference engine").

This is the graft's analog of the reference's golden-data strategy: a
deterministic, dependency-free implementation whose outputs define
correctness (like `DERIVED_DATA` in luigi_pipeline/tests/data/
sample_vep.py and the exact-aggregation assertions in
tests/model/test_seqr_mt_schema.py:35-119).  The distributed engine
must match it:

  * posting lists: exactly (term → ascending doc_ids, tfs)
  * BM25 top-k: rank-identical AND score-bit-identical (same float64
    accumulation order: ascending term order per doc)
"""

from __future__ import annotations

from collections import Counter

import numpy as np

from .functions.tokenize import py_tokenize
from .operators.index_build import BM25_B, BM25_K1, bm25_idf


class OracleIndex:
    def __init__(self, docs: dict[int, str], facets: dict[int, dict[str, str]] | None = None):
        """docs: doc_id -> text (doc_ids dense, text already extracted).
        facets: doc_id -> {field: value} — indexed as synthetic
        ``__field_value__`` filter tokens, excluded from doc_len/avgdl
        (mirrors the engine's facet indexing)."""
        self.doc_tokens = {d: py_tokenize(t) for d, t in docs.items()}
        self.doc_len = {d: len(tk) for d, tk in self.doc_tokens.items()}
        self.n_docs = len(docs)
        total = sum(self.doc_len.values())
        self.avgdl = total / self.n_docs if self.n_docs else 0.0
        self.postings: dict[str, list[tuple[int, int]]] = {}
        for d in sorted(self.doc_tokens):
            for term, tf in sorted(Counter(self.doc_tokens[d]).items()):
                self.postings.setdefault(term, []).append((d, tf))
        if facets:
            from .operators.index_build import facet_token

            for d in sorted(facets):
                for field, value in sorted(facets[d].items()):
                    self.postings.setdefault(facet_token(field, value), []).append((d, 1))

    def posting(self, term: str) -> tuple[list[int], list[int]]:
        pl = self.postings.get(term, [])
        return [d for d, _ in pl], [tf for _, tf in pl]

    def df(self, term: str) -> int:
        return len(self.postings.get(term, ()))

    def score(self, terms: list[str], mode: str = "OR") -> dict[int, float]:
        """Full scoring (no k cutoff).  float64, ascending-term-order
        accumulation — the determinism contract."""
        terms_sorted = sorted(set(terms))
        present = [t for t in terms_sorted if t in self.postings]
        if mode.upper() == "AND":
            if len(present) != len(terms_sorted):
                return {}
            docsets = [set(d for d, _ in self.postings[t]) for t in present]
            candidates = set.intersection(*docsets) if docsets else set()
        else:
            candidates = set()
            for t in present:
                candidates.update(d for d, _ in self.postings[t])
        scores: dict[int, float] = {d: np.float64(0.0) for d in candidates}
        for t in present:
            idf = bm25_idf(self.n_docs, self.df(t))
            for d, tf in self.postings[t]:
                if d not in scores:
                    continue
                dl = self.doc_len[d]
                w = (
                    (BM25_K1 + 1.0)
                    * np.float64(tf)
                    / (np.float64(tf) + BM25_K1 * (1.0 - BM25_B + BM25_B * np.float64(dl) / self.avgdl))
                )
                scores[d] = scores[d] + idf * w
        return {d: float(s) for d, s in scores.items()}

    def topk(self, terms: list[str], mode: str = "OR", k: int = 10) -> list[tuple[int, float]]:
        scores = self.score(terms, mode)
        ranked = sorted(scores.items(), key=lambda x: (-x[1], x[0]))
        return ranked[:k]

    def bool_topk(self, query: str, k: int = 10) -> list[tuple[int, float]]:
        """Boolean query-string evaluation (functions/boolquery.py
        semantics) against the in-memory index."""
        from .functions import boolquery as bq

        ast = bq.parse(query)
        pos_terms = bq.positive_terms(ast)
        doc_sets = {
            t: np.array([d for d, _ in self.postings.get(t, [])], dtype=np.int64)
            for t in bq.all_terms(ast)
        }
        cand = bq.eval_docs(ast, doc_sets)
        if isinstance(cand, tuple) or cand.size == 0:
            return []
        postings = {}
        for t in pos_terms:
            d, tf = self.posting(t)
            postings[t] = (
                np.array(d, dtype=np.int64),
                np.array(tf, dtype=np.int64),
                np.array([self.doc_len[x] for x in d], dtype=np.int64),
            )
        idf = {t: bm25_idf(self.n_docs, self.df(t)) for t in pos_terms if self.df(t)}
        scores = bq.score_candidates(cand, postings, sorted(pos_terms), idf, self.avgdl)
        order = np.lexsort((cand, -scores))[:k]
        return [(int(cand[i]), float(scores[i])) for i in order]

    def phrase_tfs(self, phrase: list[str]) -> dict[int, int]:
        """Exact-adjacency phrase term frequency per doc (occurrences may
        overlap: 'a a' occurs twice in 'a a a')."""
        n = len(phrase)
        out: dict[int, int] = {}
        for d, toks in self.doc_tokens.items():
            c = sum(
                1
                for i in range(len(toks) - n + 1)
                if toks[i : i + n] == phrase
            )
            if c:
                out[d] = c
        return out

    def phrase_prefix_tfs(self, phrase: list[str], prefix: str) -> dict[int, int]:
        """match_phrase_prefix chain count (slop=0): leading tokens
        adjacent, final slot any token carrying the prefix."""
        nlead = len(phrase)
        out: dict[int, int] = {}
        for d, toks in self.doc_tokens.items():
            c = 0
            for i in range(len(toks) - nlead):
                if all(toks[i + j] == phrase[j] for j in range(nlead)) and toks[
                    i + nlead
                ].startswith(prefix):
                    c += 1
            if c:
                out[d] = c
        return out

    def phrase_prefix_topk(
        self, phrase: list[str], prefix: str, k: int = 10
    ) -> list[tuple[int, float]]:
        """BM25 top-k of the match_phrase_prefix pseudo-term."""
        return self._pseudo_term_topk(self.phrase_prefix_tfs(phrase, prefix), k)

    def phrase_topk(self, phrase: list[str], k: int = 10) -> list[tuple[int, float]]:
        """BM25 top-k treating the phrase as one pseudo-term:
        tf = adjacency count, df = docs with tf > 0."""
        return self._pseudo_term_topk(self.phrase_tfs(phrase), k)

    def _pseudo_term_topk(
        self, tfs: dict[int, int], k: int
    ) -> list[tuple[int, float]]:
        if not tfs:
            return []
        idf = bm25_idf(self.n_docs, len(tfs))
        scores = {}
        for d, tf in tfs.items():
            dl = self.doc_len[d]
            w = (
                (BM25_K1 + 1.0)
                * np.float64(tf)
                / (np.float64(tf) + BM25_K1 * (1.0 - BM25_B + BM25_B * np.float64(dl) / self.avgdl))
            )
            scores[d] = float(idf * w)
        return sorted(scores.items(), key=lambda x: (-x[1], x[0]))[:k]
