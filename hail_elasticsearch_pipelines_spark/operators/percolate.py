"""Percolation — the ES percolator (reverse search): match incoming
documents against a registry of STORED queries, instead of queries
against an index.  The crawl-pipeline use: alerting/routing — "which
standing watches does this new page trigger?".

The reference delegates all query handling to ES
(hail_scripts/shared/elasticsearch_client.py); the percolator is ES's
reverse API over the same query language.  Spark-first shape: no index
at all — the compiled query ASTs broadcast with the task closure
(query registries are human-curated, thousands at most, never
data-sized) and each Arrow batch of documents evaluates every query
locally via the pure per-doc kernel (functions/boolquery.eval_doc),
so the operator is one narrow mapInPandas pass: no shuffle, no joins,
linear in |docs| × |queries|."""

from __future__ import annotations

from typing import Iterator

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


def py_percolate(
    text: str, fields: dict, compiled: list[tuple]
) -> list[str]:
    """Query ids matching one document — the single-doc serving twin
    (and the test oracle's kernel)."""
    tokens = py_tokenize(text or "")
    return [qid for qid, ast in compiled if bq.eval_doc(ast, tokens, fields)]


def percolate(
    docs: DataFrame,
    queries: "dict[str, str]",
    text_col: str = "text",
    id_col: str = "doc_id",
    analyzed_fields=frozenset(),
) -> DataFrame:
    """DataFrame(doc_id, query_id) — one row per (document, matching
    stored query), ordered within each task; wildcard/fuzzy atoms match
    against the document's own tokens (no termdict involved — the doc
    IS the corpus here), phrase atoms run the in-order chain over the
    doc's token list, and range/_exists_/field atoms read the metadata
    columns.  Every non-id/text column rides along as a field."""
    meta = [c for c in docs.columns if c not in (id_col, text_col)]
    compiled = compile_queries(
        queries,
        analyzed_fields=frozenset(analyzed_fields),
        dv_fields=frozenset(meta),
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

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
                    pdf[text_col].iloc[i], fields, compiled
                ):
                    out_d.append(int(pdf[id_col].iloc[i]))
                    out_q.append(qid)
            yield pd.DataFrame({"doc_id": out_d, "query_id": out_q})

    return (
        docs.select(
            F.col(id_col).alias(id_col), F.col(text_col).alias(text_col), *meta
        )
        .mapInPandas(gen, schema=PERCOLATE_SCHEMA)
        .orderBy("doc_id", "query_id")
    )
