"""Similarity-search operators: exact cosine top-k, LSH ANN recall, and
the IVF-partitioned layout with partition pruning."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from hail_elasticsearch_pipelines_spark.operators import similarity as sim


@pytest.fixture(scope="module")
def emb_df(spark):
    rng = np.random.default_rng(3)
    vecs = rng.standard_normal((400, 16)).astype(np.float32)
    rows = [(int(i), [float(x) for x in v]) for i, v in enumerate(vecs)]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>"), vecs


def _brute_topk(vecs, q, k):
    qn = q / np.linalg.norm(q)
    cos = (vecs / np.linalg.norm(vecs, axis=1, keepdims=True)) @ qn
    order = np.lexsort((np.arange(len(vecs)), -cos))[:k]
    return [int(i) for i in order]


def test_cosine_topk_exact(emb_df):
    df, vecs = emb_df
    q = [float(x) for x in vecs[7]]
    got = [r["id"] for r in sim.cosine_topk(df, q, k=15).collect()]
    assert got == _brute_topk(vecs.astype(np.float64), np.asarray(q), 15)
    assert got[0] == 7  # the query vector itself


def test_ann_lsh_recall(emb_df):
    df, vecs = emb_df
    q = [float(x) for x in vecs[11]]
    exact = set(_brute_topk(vecs.astype(np.float64), np.asarray(q), 10))
    got = {r["id"] for r in sim.ann_lsh_topk(df, q, k=10, n_planes=8, multiprobe=2).collect()}
    assert 11 in got
    assert len(exact & got) >= 5  # multiprobe recall at this scale


def test_ann_indexed_layout_prunes_and_matches(spark, emb_df, tmp_path):
    df, vecs = emb_df
    path = str(tmp_path / "lsh")
    sim.write_lsh_partitioned(df, path, n_planes=6)
    q = [float(x) for x in vecs[3]]
    scan = sim.ann_lsh_topk_indexed(spark, path, q, k=10, n_planes=6, multiprobe=1)
    plan = scan._jdf.queryExecution().executedPlan().toString()
    assert "bucket" in plan  # partition filter reached the scan
    unindexed = sim.ann_lsh_topk(df, q, k=10, n_planes=6, multiprobe=1)
    a = [(r["id"], round(r["cosine"], 9)) for r in scan.collect()]
    b = [(r["id"], round(r["cosine"], 9)) for r in unindexed.collect()]
    assert a == b
