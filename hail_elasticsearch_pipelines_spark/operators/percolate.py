"""Percolation — the ES percolator (reverse search): match incoming
documents against a registry of STORED queries, instead of queries
against an index.  The crawl-pipeline use: alerting/routing — "which
standing watches does this new page trigger?".

The reference delegates all query handling to ES
(hail_scripts/shared/elasticsearch_client.py); the percolator is ES's
reverse API over the same query language.  Spark-first shape: no index
at all — the compiled query ASTs broadcast with the task closure
(query registries are human-curated, thousands at most, never
data-sized) and each Arrow batch of documents evaluates stored queries
locally via the pure per-doc kernel (functions/boolquery.eval_doc) in
one narrow mapInPandas pass: no shuffle, no joins.

Candidate prefilter (the ES percolator's extracted-terms index,
re-expressed): at compile time each query yields its REQUIRED body
tokens — exact scoring terms every match must contain (AND-reachable
Terms plus quoted-phrase tokens; wildcard/fuzzy/fielded/negated atoms
extract nothing).  Per document the kernel builds the token set once
and a vectorized containment test (one ``logical_and.reduceat`` over
the stacked required-term indices) selects the candidate queries; only
those run the AST walk.  Queries with no extractable required term
(pure facet/range/OR-of-wildcards shapes) are always candidates —
exactly ES's verification-query fallback.  Cost per doc drops from
|queries| AST evaluations to |tokens ∩ vocab| set lookups + one numpy
reduction + |candidates| evaluations."""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions import boolquery as bq
from ..functions.tokenize import py_tokenize

PERCOLATE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("query_id", T.StringType(), False),
    ]
)


def compile_queries(
    queries: "dict[str, str]",
    analyzed_fields=frozenset(),
    dv_fields=frozenset(),
) -> list[tuple]:
    """[(query_id, ast)] in query_id order.  ``dv_fields`` should name
    the metadata columns, so ``field:value`` atoms carry the field
    explicitly (doc-value equality) instead of a baked facet token —
    eval_doc then reads the document's own column."""
    return [
        (qid, bq.parse(q, analyzed_fields=analyzed_fields, dv_fields=dv_fields))
        for qid, q in sorted(queries.items())
    ]


def required_body_tokens(node) -> "set[str]":
    """Exact body tokens EVERY match of the query must contain — the
    percolator's extracted-terms set.  Conservative (soundness over
    completeness): only atoms reachable from the root through AND
    nodes, never negated, never inside an OR; exact Terms without a
    field prefix plus quoted-phrase tokens (a doc matching the phrase
    contains all its tokens).  Wildcard/fuzzy (prefix, not a token),
    fielded (matches field tokens, not body), facet/range/nested
    (metadata) atoms extract nothing.  An empty set means "always a
    candidate"."""
    out: set[str] = set()

    def walk(n):
        if isinstance(n, bq.Term):
            if (
                not n.wildcard
                and not n.fuzzy
                and not n.filter
                and ":" not in n.term
            ):
                out.add(n.term)
        elif isinstance(n, bq.PhraseTerm):
            out.update(n.tokens)
        elif isinstance(n, bq.And):
            for p in n.parts:
                walk(p)
        # Or / Not / RangeTerm / NestedTerm: nothing required

    walk(node)
    return out


class _Prefilter:
    """Vectorized candidate selection over the compiled registry."""

    def __init__(self, compiled: list[tuple]):
        vocab: dict[str, int] = {}
        flat: list[int] = []
        bounds: list[int] = []
        guarded: list[int] = []  # query positions with required terms
        self.always: list[int] = []  # positions evaluated for every doc
        for pos, (_qid, ast) in enumerate(compiled):
            req = required_body_tokens(ast)
            if not req:
                self.always.append(pos)
                continue
            guarded.append(pos)
            bounds.append(len(flat))
            for t in sorted(req):
                flat.append(vocab.setdefault(t, len(vocab)))
        self.vocab = vocab
        self.guarded = np.asarray(guarded, dtype=np.int64)
        self.flat = np.asarray(flat, dtype=np.int64)
        self.bounds = np.asarray(bounds, dtype=np.int64)

    def candidates(self, token_set: "set[str]") -> "list[int]":
        """Query positions worth evaluating for a doc with this token
        set: the always-candidates plus every guarded query whose
        required terms are ALL present."""
        if not self.guarded.size:
            return self.always
        present = np.zeros(len(self.vocab), dtype=bool)
        vocab = self.vocab
        for t in token_set:
            idx = vocab.get(t)
            if idx is not None:
                present[idx] = True
        ok = np.logical_and.reduceat(present[self.flat], self.bounds)
        hits = self.guarded[ok]
        if not self.always:
            return hits.tolist()
        return sorted(self.always + hits.tolist())


def py_percolate(
    text: str, fields: dict, compiled: list[tuple], prefilter=None
) -> list[str]:
    """Query ids matching one document — the single-doc serving twin
    (and the test oracle's kernel)."""
    tokens = py_tokenize(text or "")
    if prefilter is None:
        return [qid for qid, ast in compiled if bq.eval_doc(ast, tokens, fields)]
    out = []
    for pos in prefilter.candidates(set(tokens)):
        qid, ast = compiled[pos]
        if bq.eval_doc(ast, tokens, fields):
            out.append(qid)
    return out


def percolate(
    docs: DataFrame,
    queries: "dict[str, str]",
    text_col: str = "text",
    id_col: str = "doc_id",
    analyzed_fields=frozenset(),
    ordered: bool = False,
) -> DataFrame:
    """DataFrame(doc_id, query_id) — one row per (document, matching
    stored query); wildcard/fuzzy atoms match against the document's
    own tokens (no termdict involved — the doc IS the corpus here),
    phrase atoms run the in-order chain over the doc's token list, and
    range/_exists_/field atoms read the metadata columns.  Every
    non-id/text column rides along as a field.

    ``ordered=True`` adds a global (doc_id, query_id) sort — a full
    shuffle purely for presentation; leave it off in pipelines (the
    row SET is identical either way)."""
    meta = [c for c in docs.columns if c not in (id_col, text_col)]
    compiled = compile_queries(
        queries,
        analyzed_fields=frozenset(analyzed_fields),
        dv_fields=frozenset(meta),
    )
    prefilter = _Prefilter(compiled)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_d, out_q = [], []
            metas = {c: pdf[c] for c in meta}
            for i in range(len(pdf)):
                fields = {}
                for c, col in metas.items():
                    v = col.iloc[i]
                    if isinstance(v, (list, tuple, np.ndarray)):
                        fields[c] = list(v)
                    elif v is None or pd.isna(v):
                        continue
                    else:
                        fields[c] = v
                for qid in py_percolate(
                    pdf[text_col].iloc[i], fields, compiled, prefilter
                ):
                    out_d.append(int(pdf[id_col].iloc[i]))
                    out_q.append(qid)
            yield pd.DataFrame({"doc_id": out_d, "query_id": out_q})

    out = docs.select(
        F.col(id_col).alias(id_col), F.col(text_col).alias(text_col), *meta
    ).mapInPandas(gen, schema=PERCOLATE_SCHEMA)
    return out.orderBy("doc_id", "query_id") if ordered else out
