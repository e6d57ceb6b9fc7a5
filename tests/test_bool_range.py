"""Doc-value range atoms in the boolean query language
(``field:[lo TO hi]`` — the ES query_string range syntax, filter
context), composed with terms, facets, NOT, and OR.

Reference analog: seqr's range filters issued through ES query strings
(hail_scripts/v02/utils/elasticsearch_client.py:106-177)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from hail_elasticsearch_pipelines_spark.functions import boolquery as bq
from hail_elasticsearch_pipelines_spark.operators.bm25 import IndexSearcher
from hail_elasticsearch_pipelines_spark.operators.docvalues import DocValueError
from hail_elasticsearch_pipelines_spark.operators.serve import LocalSearcher


@pytest.fixture(scope="module")
def searchers(spark, small_index):
    out, _m = small_index
    return IndexSearcher(spark, out), LocalSearcher(out)


def test_parse_range_atoms():
    ast = bq.parse("a AND n:[10 TO 20]")
    rt = bq.range_atoms(ast)[0]
    assert (rt.field, rt.lo, rt.hi, rt.incl_lo, rt.incl_hi) == ("n", 10, 20, True, True)
    rt2 = bq.range_atoms(bq.parse("a AND n:{1.5 TO 2.5}"))[0]
    assert (rt2.lo, rt2.hi, rt2.incl_lo, rt2.incl_hi) == (1.5, 2.5, False, False)
    rt3 = bq.range_atoms(bq.parse("a AND ts:[2025-02-01T00:00:00 TO *]"))[0]
    assert rt3.lo == "2025-02-01T00:00:00" and rt3.hi is None
    with pytest.raises(bq.QueryParseError):
        bq.parse("a AND n:[* TO *]")
    # range atoms are filter context: never scoring, never required
    assert bq.positive_terms(ast) == ["a"]
    assert bq.all_terms(ast) == ["a"]
    # dedup by key
    assert len(bq.range_atoms(bq.parse("n:[1 TO 2] AND a OR n:[1 TO 2]"))) == 1


QS = [
    "(the OR term0042) AND doc_len:[50 TO 200]",
    "(the OR term0042) AND doc_len:{50 TO 200}",   # exclusive bounds
    "the AND NOT doc_len:[50 TO 200]",
    "the AND warc_ts:[2025-01-20T00:00:00 TO *]",
    "term0042 OR doc_len:[1 TO 40]",               # range-only OR branch
]


def test_bool_range_parity(searchers):
    s, L = searchers
    for q in QS:
        d = [(r.doc_id, r.score) for r in s.search_bool(q, k=12).collect()]
        assert d == L.search_bool(q, k=12), q
        assert d, q


def test_bool_range_semantics(searchers):
    """Filter-context bounds are honored exactly, against a brute-force
    doclens check; exclusive bounds differ from inclusive."""
    s, L = searchers
    dl = pd.read_parquet(s._doclens_path, columns=["doc_id", "doc_len"]).set_index("doc_id")
    hits = L.search_bool("the AND doc_len:[50 TO 200]", k=10_000)
    assert all(50 <= int(dl.loc[d, "doc_len"]) <= 200 for d, _sc in hits)
    excl = L.search_bool("the AND doc_len:{50 TO 200}", k=10_000)
    assert all(50 < int(dl.loc[d, "doc_len"]) < 200 for d, _sc in excl)
    assert {d for d, _ in excl} <= {d for d, _ in hits}
    inv = L.search_bool("the AND NOT doc_len:[50 TO 200]", k=10_000)
    both = {d for d, _ in hits} | {d for d, _ in inv}
    all_the = {d for d, _ in L.search(["the"], "OR", 10_000, algo="exhaustive")}
    assert both == all_the and not ({d for d, _ in hits} & {d for d, _ in inv})


def test_bool_range_matches_search_range(searchers):
    """The conjunctive shape is bit-identical to the dedicated
    search_range operator (same exhaustive kernel, same filter)."""
    s, L = searchers
    a = [(r.doc_id, r.score) for r in s.search_range(["the", "term0042"], "doc_len", 50, 200, k=12).collect()]
    b = [(r.doc_id, r.score) for r in s.search_bool("(the OR term0042) AND doc_len:[50 TO 200]", k=12).collect()]
    assert a == b == L.search_bool("(the OR term0042) AND doc_len:[50 TO 200]", k=12)


def test_range_only_or_branch_scores_zero(searchers):
    """Docs entering only through the range branch match with score 0
    (filter atoms never score) — and live in segments the query term
    may not touch."""
    _s, L = searchers
    hits = L.search_bool("term0042 OR doc_len:[1 TO 40]", k=10_000)
    term_docs = {d for d, _ in L.search(["term0042"], "OR", 10_000, algo="exhaustive")}
    range_only = [(d, sc) for d, sc in hits if d not in term_docs]
    assert range_only and all(sc == 0.0 for _d, sc in range_only)


def test_unsupported_api_raises(searchers):
    s, L = searchers
    with pytest.raises(bq.QueryParseError):
        L.search_stats("the AND doc_len:[50 TO 200]", "BOOL")
    with pytest.raises(bq.QueryParseError):
        bq.eval_docs(bq.parse("a AND n:[1 TO 2]"), {"a": np.array([1], np.int64)})


def test_unknown_field_raises(searchers):
    s, L = searchers
    with pytest.raises(DocValueError):
        s.search_bool("the AND nosuch:[1 TO 2]", k=3).collect()
    with pytest.raises(DocValueError):
        L.search_bool("the AND nosuch:[1 TO 2]", k=3)


def test_pure_range_has_no_positive_terms(searchers):
    s, L = searchers
    for f in (lambda: s.search_bool("doc_len:[50 TO 200]", k=3),
              lambda: L.search_bool("doc_len:[50 TO 200]", k=3)):
        with pytest.raises(bq.QueryParseError):
            f()


def test_range_atoms_respect_deletes(spark, small_pages_df, tmp_path):
    """Upserted-away docs never match through a range atom."""
    from pyspark.sql import functions as F

    from hail_elasticsearch_pipelines_spark.operators.index_build import build_index
    from hail_elasticsearch_pipelines_spark.plans.maintenance import upsert_index

    out = str(tmp_path / "idx")
    build_index(spark, small_pages_df, out, docs_per_part=37, seg_group=2, n_term_buckets=8)
    s0 = IndexSearcher(spark, out)
    pre = {r.doc_id for r in s0.search_bool("the AND doc_len:[1 TO 10000]", k=10_000).collect()}
    victims = sorted(pre)[:3]
    dl = spark.read.parquet(s0._doclens_path)
    batch = (
        dl.filter(F.col("doc_id").isin([int(v) for v in victims]))
        .select(
            "url",
            (F.col("warc_ts") + F.expr("INTERVAL 365 DAYS")).alias("warc_ts"),
            F.lit(None).cast("binary").alias("html"),
            F.lit("replacement xyzzy").alias("text"),
            F.lit("en").alias("lang"),
        )
    )
    upsert_index(spark, out, batch)
    s = IndexSearcher(spark, out)
    L = LocalSearcher(out)
    post_d = {r.doc_id for r in s.search_bool("the AND doc_len:[1 TO 10000]", k=10_000).collect()}
    post_l = {d for d, _ in L.search_bool("the AND doc_len:[1 TO 10000]", k=10_000)}
    assert post_d == post_l
    assert not (set(victims) & post_d)


def test_matched_ids_with_ranges(searchers):
    """Doc-value aggregations accept range-filtered BOOL queries —
    the ES bool-query + aggregations combo."""
    import pandas as pd

    s, L = searchers
    Q = "the AND warc_ts:[2025-01-20T00:00:00 TO *]"
    d = sorted(r.doc_id for r in s.matched_ids(Q, "BOOL").collect())
    assert d == L.matched_ids(Q, "BOOL").tolist() and d
    # subset relation vs the unfiltered query
    full = set(L.matched_ids("the", "BOOL").tolist())
    assert set(d) < full
    dh = [(r.bucket, r.doc_count) for r in s.search_value_histogram(Q, "warc_ts", "day", mode="BOOL").collect()]
    lh = [(pd.Timestamp(b).to_pydatetime(), int(c)) for b, c in L.search_value_histogram(Q, "warc_ts", "day", mode="BOOL")]
    assert dh == lh and dh
    ds = [(r.doc_id, r.warc_ts) for r in s.search_sorted(Q, "warc_ts", False, 5, mode="BOOL").collect()]
    ls = [(i, pd.Timestamp(v).to_pydatetime()) for i, v in L.search_sorted(Q, "warc_ts", False, 5, mode="BOOL")]
    assert ds == ls and ds


def test_pure_range_aggregations(searchers):
    """A pure-range BOOL query is a bounded filter of match_all for
    the non-scoring aggregation APIs (scoring still requires positive
    terms)."""
    s, L = searchers
    P = "doc_len:[50 TO 200]"
    d = sorted(r.doc_id for r in s.matched_ids(P, "BOOL").collect())
    l = L.matched_ids(P, "BOOL").tolist()
    assert d == l and d
    # brute-force from doclens
    import pandas as pd

    dl = pd.read_parquet(s._doclens_path, columns=["doc_id", "doc_len"])
    expect = sorted(dl[(dl["doc_len"] >= 50) & (dl["doc_len"] <= 200)]["doc_id"].tolist())
    assert d == expect
    assert s.search_cardinality(P, "lang", mode="BOOL").collect()[0].n_values == L.search_cardinality(P, "lang", mode="BOOL")


def test_msearch_with_range_and_dv_atoms(spark, searchers):
    """search_many accepts BOOL specs with range/_exists_ atoms (routed
    through the doc-value cogroup path) — results identical to lone
    search_bool calls and to the serving twin."""
    s, L = searchers
    specs = [
        {"query_id": "plain", "mode": "BOOL", "query": "the AND term0020", "k": 10},
        {"query_id": "rng", "mode": "BOOL", "query": "the AND doc_len:[50 TO 300]", "k": 10},
        {"query_id": "ex", "mode": "BOOL", "query": "the AND _exists_:doc_len", "k": 10},
        {"query_id": "ph", "mode": "PHRASE", "phrase": ["of", "the"], "k": 10},
    ]
    rows = s.search_many(specs).collect()
    got: dict[str, list] = {}
    for r in sorted(rows, key=lambda r: (r.query_id, r.rank)):
        got.setdefault(r.query_id, []).append((r.doc_id, r.score))
    loc = L.search_many(specs)
    assert set(got) == {"plain", "rng", "ex", "ph"}
    for qid in got:
        assert got[qid] == loc[qid], qid
    assert got["rng"] == [
        (r.doc_id, r.score)
        for r in s.search_bool("the AND doc_len:[50 TO 300]", k=10).collect()
    ]
