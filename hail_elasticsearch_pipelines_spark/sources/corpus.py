"""Deterministic synthetic Common-Crawl-style page corpus (FIXTURES.md F1/F2).

Reference analog: the 30-variant golden fixture
(luigi_pipeline/tests/data/1kg_30variants.vcf.bgz) + the deterministic
dummy annotator data (tests/data/sample_vep.py).  No external data: all
content derives from a counter-based splitmix64 hash of (seed, doc
index, stream, position), so generation is partition-count-independent
and reproducible — generating doc i yields identical bytes whether the
corpus is built in 1 partition or 1000.

Schema (BASELINE.json input_hint):
    url:string, warc_ts:timestamp, html:binary, text:string, lang:string

Corpus properties wired for the test plan:
  * Zipfian vocabulary (~5000 terms incl. 20 very-high-DF stopwords) →
    posting-list skew for salting tests
  * doc length lognormal-ish, clamped 20..2000 tokens
  * ~3% of rows have NULL text → engine must extract from html
  * ~2% of urls get a second, NEWER crawl row (dedup: latest warc_ts
    wins) whose content differs → dedup correctness is observable
"""

from __future__ import annotations

import datetime as dt

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from ..functions.extract import py_extract_text

SEED = 20260816
VOCAB_SIZE = 5000
N_STOPWORDS = 20
ZIPF_S = 1.07
BASE_TS = dt.datetime(2025, 1, 14, 0, 0, 0)

_STOPWORDS = [
    "the", "of", "and", "to", "in", "a", "is", "that", "for", "it",
    "was", "on", "with", "as", "by", "at", "from", "are", "this", "be",
]

PAGES_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("warc_ts", T.TimestampType(), False),
        T.StructField("html", T.BinaryType(), False),
        T.StructField("text", T.StringType(), True),
        T.StructField("lang", T.StringType(), False),
    ]
)


def vocabulary() -> list[str]:
    """Rank-ordered vocabulary: 20 stopwords first (highest Zipf mass),
    then term0020..term4999."""
    return _STOPWORDS + [f"term{k:04d}" for k in range(N_STOPWORDS, VOCAB_SIZE)]


_VOCAB = np.array(vocabulary())
_ZIPF_W = 1.0 / np.arange(1, VOCAB_SIZE + 1) ** ZIPF_S
_ZIPF_CDF = np.cumsum(_ZIPF_W) / _ZIPF_W.sum()


def _splitmix64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 finalizer (public-domain algorithm);
    uint64 wrap-around is intentional."""
    with np.errstate(over="ignore"):
        z = (x + np.uint64(0x9E3779B97F4A7C15)).astype(np.uint64)
        z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        return z ^ (z >> np.uint64(31))


def _hash_u64(i: np.ndarray, stream: int, pos: np.ndarray | int = 0) -> np.ndarray:
    with np.errstate(over="ignore"):
        mix = (
            np.asarray(i, dtype=np.uint64) * np.uint64(0x100000001B3)
            + np.uint64(stream) * np.uint64(0x9E3779B97F4A7C15)
            + np.asarray(pos, dtype=np.uint64)
            + np.uint64(SEED)
        )
    return _splitmix64(_splitmix64(mix) ^ np.uint64(stream))


def _uniform(i, stream, pos=0) -> np.ndarray:
    return (_hash_u64(i, stream, pos) >> np.uint64(11)).astype(np.float64) / float(1 << 53)


def _doc_tokens(i: int, variant: int = 0) -> list[str]:
    """Token stream of doc i (variant=1 → the re-crawled, newer content)."""
    u_len = _uniform(np.array([i]), 100 + variant)[0]
    # lognormal-ish: exp(mu + sigma*z) via inverse-transform-lite on two uniforms
    u2 = _uniform(np.array([i]), 101 + variant)[0]
    z = np.sqrt(-2.0 * np.log(max(u_len, 1e-12))) * np.cos(2 * np.pi * u2)
    length = int(np.clip(np.exp(4.6 + 0.8 * z), 20, 2000))
    pos = np.arange(length, dtype=np.uint64)
    u = _uniform(np.full(length, i, dtype=np.uint64), 102 + variant, pos)
    ranks = np.searchsorted(_ZIPF_CDF, u, side="left")
    return list(_VOCAB[np.clip(ranks, 0, VOCAB_SIZE - 1)])


_LANGS = np.array(["en", "de", "fr", "sv"])


def _build_html(i: int, tokens: list[str], lang: str) -> bytes:
    """HTML wrapping the token stream with boilerplate the extractor must
    strip; entities exercise the decode path."""
    half = len(tokens) // 2
    title = f"doc {i} &amp; friends"
    body1 = " ".join(tokens[:half])
    body2 = " ".join(tokens[half:])
    html = (
        f'<html lang="{lang}"><head><title>{title}</title>'
        f"<style>p {{ margin: 0 }}</style>"
        f'<script type="text/javascript">var docId = {i}; if (1 < 2) {{}}</script>'
        f"</head><body>\n"
        f'<div class="nav"><!-- navigation boilerplate --></div>\n'
        f"<p>{body1}</p>\n<p>{body2}</p>\n"
        f"</body></html>"
    )
    return html.encode("utf-8")


def gen_pages_pdf(indices: np.ndarray) -> pd.DataFrame:
    """Generate page rows for the given doc indices (vectorized where it
    counts; the HTML assembly is per-row Python but runs inside Arrow
    batches in the Spark path)."""
    rows = []
    langs = _LANGS[
        np.where(
            _uniform(indices.astype(np.uint64), 5) < 0.9,
            0,
            1 + (_hash_u64(indices.astype(np.uint64), 6) % np.uint64(3)).astype(np.int64),
        )
    ]
    null_text = _hash_u64(indices.astype(np.uint64), 8) % np.uint64(33) == 0
    recrawl = _hash_u64(indices.astype(np.uint64), 9) % np.uint64(50) == 0
    for j, i in enumerate(indices):
        i = int(i)
        url = f"https://site{i % 97}.example/cat{i % 11}/page-{i:08d}"
        tokens = _doc_tokens(i, 0)
        lang = str(langs[j])
        html = _build_html(i, tokens, lang)
        text = py_extract_text(html)
        ts = BASE_TS + dt.timedelta(seconds=137 * i)
        rows.append(
            (url, ts, html, None if null_text[j] else text, lang)
        )
        if recrawl[j]:
            tokens2 = _doc_tokens(i, 1)
            html2 = _build_html(i, tokens2, lang)
            rows.append(
                (
                    url,
                    ts + dt.timedelta(days=30),
                    html2,
                    py_extract_text(html2),
                    lang,
                )
            )
    return pd.DataFrame(
        rows, columns=["url", "warc_ts", "html", "text", "lang"]
    )


def pages_df(
    spark: SparkSession,
    n_docs: int,
    n_partitions: int | None = None,
    start: int = 0,
) -> DataFrame:
    """Distributed corpus: spark.range → mapInPandas(generator).

    Deterministic per doc index regardless of partitioning; ``start``
    offsets the index range (disjoint url sets for append batches)."""
    n_partitions = n_partitions or max(1, min(n_docs // 1000, 200))

    def gen(batches):
        for pdf in batches:
            yield gen_pages_pdf(pdf["id"].to_numpy())

    return (
        spark.range(start, start + n_docs, numPartitions=n_partitions)
        .mapInPandas(gen, schema=PAGES_SCHEMA)
    )


def reference_queries() -> list[dict]:
    """The fixed reference query set (FIXTURES.md F2): AND/OR modes,
    high-DF terms, an absent term, single-term, k ∈ {1, 10, 100}."""
    return [
        {"query_id": "q001", "terms": ["term0042"], "mode": "OR", "k": 10},
        {"query_id": "q002", "terms": ["the", "term0042"], "mode": "AND", "k": 10},
        {"query_id": "q003", "terms": ["term0100", "term0200"], "mode": "OR", "k": 10},
        {"query_id": "q004", "terms": ["term0100", "term0200"], "mode": "AND", "k": 10},
        {"query_id": "q005", "terms": ["the", "of", "and"], "mode": "AND", "k": 100},
        {"query_id": "q006", "terms": ["zzznotaterm"], "mode": "OR", "k": 10},
        {"query_id": "q007", "terms": ["term4999", "zzznotaterm"], "mode": "OR", "k": 10},
        {"query_id": "q008", "terms": ["term4999", "zzznotaterm"], "mode": "AND", "k": 10},
        {"query_id": "q009", "terms": ["term0021", "term0022", "term0023", "term0024", "term0025"], "mode": "OR", "k": 1},
        {"query_id": "q010", "terms": ["the", "term1000", "term2000"], "mode": "OR", "k": 100},
    ]
