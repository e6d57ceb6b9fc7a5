"""Schema-derived index field manifest: facet/stored roles derived from
the table dtype with per-field overrides — the analog of the
reference's ES-mapping-from-dtype (elasticsearch_utils.py:38-77,
elasticsearch_client.py:166-177)."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import types as T

from hail_elasticsearch_pipelines_spark.operators.bm25 import IndexSearcher
from hail_elasticsearch_pipelines_spark.operators.index_build import (
    build_index,
    derive_index_fields,
)
from hail_elasticsearch_pipelines_spark.plans.maintenance import extend_index

SCHEMA = (
    "url string, warc_ts timestamp, html binary, text string, "
    "lang string, domain string, fetch_ms int"
)


def _rows(lo: int, hi: int):
    ts = dt.datetime(2025, 1, 1)
    return [
        (
            f"http://site{i % 3}.example/p{i:03d}",
            ts,
            None,
            f"common text number {i}",
            "en",
            f"site{i % 3}.example",
            i * 10,
        )
        for i in range(lo, hi)
    ]


def test_derive_index_fields_defaults_and_overrides():
    schema = T.StructType(
        [
            T.StructField("url", T.StringType()),
            T.StructField("text", T.StringType()),
            T.StructField("lang", T.StringType()),
            T.StructField("domain", T.StringType()),
            T.StructField("fetch_ms", T.IntegerType()),
        ]
    )
    specs = derive_index_fields(schema)
    assert set(specs) == {"lang", "domain", "fetch_ms"}  # core cols excluded
    assert specs["lang"] == {"dtype": "string", "facet": True, "stored": True}
    assert specs["domain"]["facet"] is False and specs["domain"]["stored"] is True
    specs = derive_index_fields(schema, overrides={"domain": {"facet": True}})
    assert specs["domain"]["facet"] is True
    # fnmatch patterns work; facet on a non-string raises (the
    # reference's unsupported-type error analog)
    specs = derive_index_fields(schema, overrides={"fetch*": {"stored": False}})
    assert specs["fetch_ms"]["stored"] is False
    with pytest.raises(TypeError, match="non-string"):
        derive_index_fields(schema, overrides={"fetch_ms": {"facet": True}})


@pytest.fixture(scope="module")
def domain_index(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("fm") / "idx")
    manifest = build_index(
        spark,
        spark.createDataFrame(_rows(0, 30), SCHEMA),
        out,
        docs_per_part=8,
        seg_group=2,
        n_term_buckets=4,
        field_overrides={"domain": {"facet": True}},
    )
    return out, manifest


def _ids_by_url(lo: int, hi: int, base: int = 0) -> dict[int, int]:
    """doc ids are assigned in url sort order — map source i → doc_id."""
    ordered = sorted((r[0], j) for j, r in enumerate(_rows(lo, hi), start=lo))
    return {i: base + rank for rank, (_, i) in enumerate(ordered)}


def test_second_facet_via_config_only(spark, domain_index):
    out, manifest = domain_index
    assert manifest["params"]["facet_fields"] == ["lang", "domain"]
    ids = _ids_by_url(0, 30)
    s = IndexSearcher(spark, out)
    got = sorted(
        r["doc_id"] for r in s.search_bool("common AND domain:site1.example", k=50).collect()
    )
    assert got == sorted(ids[i] for i in range(30) if i % 3 == 1)
    # combined facets still intersect
    got = sorted(
        r["doc_id"]
        for r in s.search_bool("common AND domain:site2.example AND lang:en", k=50).collect()
    )
    assert got == sorted(ids[i] for i in range(30) if i % 3 == 2)


def test_stored_fields_fetched_by_with_source(spark, domain_index):
    out, manifest = domain_index
    assert set(manifest["params"]["stored_fields"]) == {"lang", "domain", "fetch_ms"}
    ids = _ids_by_url(0, 30)
    by_id = {ids[i]: i for i in range(30)}
    s = IndexSearcher(spark, out)
    hits = s.with_source(s.search(["common"], "OR", 3)).collect()
    assert hits
    for r in hits:
        i = by_id[r["doc_id"]]
        assert r["url"] == f"http://site{i % 3}.example/p{i:03d}"
        assert r["domain"] == f"site{i % 3}.example"
        assert r["fetch_ms"] == i * 10


def test_extend_preserves_field_manifest(spark, domain_index):
    out, _ = domain_index
    m2 = extend_index(spark, out, spark.createDataFrame(_rows(30, 45), SCHEMA))
    assert m2["extensions"][-1]["docs_added"] == 15
    id_base = m2["extensions"][-1]["id_base"]
    base_ids = _ids_by_url(0, 30)
    new_ids = _ids_by_url(30, 45, base=id_base)
    s = IndexSearcher(spark, out)
    got = sorted(
        r["doc_id"] for r in s.search_bool("common AND domain:site0.example", k=100).collect()
    )
    want = [base_ids[i] for i in range(30) if i % 3 == 0] + [
        new_ids[i] for i in range(30, 45) if i % 3 == 0
    ]
    assert got == sorted(want)
