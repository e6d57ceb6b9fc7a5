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


@pytest.fixture(scope="module")
def planted_df(spark):
    """Random vectors + near-duplicate copies (id+1000): cosine of each
    planted pair ~0.99997, natural pairs < 0.7."""
    rng = np.random.default_rng(9)
    vecs = rng.standard_normal((150, 32)).astype(np.float64)
    rows = [(int(i), [float(x) for x in v]) for i, v in enumerate(vecs)]
    rows += [
        (int(i) + 1000, [float(x * (1.0 + 0.0004 * (j % 5))) for j, x in enumerate(v)])
        for i, v in enumerate(vecs)
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_embedding_pairs_multiband_finds_planted(planted_df):
    got = {
        (r["id_a"], r["id_b"])
        for r in sim.embedding_cosine_pairs(
            planted_df, threshold=0.9, n_bands=4, planes_per_band=8
        ).collect()
    }
    want = {(i, i + 1000) for i in range(150)}
    assert got == want


def test_embedding_pairs_hot_bucket_cap(spark):
    """Skewed fixture: every vector points the same way, so single-table
    LSH puts ALL of them in one bucket (quadratic candidates).  The
    per-(band, bucket) frequency cap bounds candidate generation."""
    rng = np.random.default_rng(4)
    base = rng.standard_normal(16)
    rows = [
        (int(i), [float(x) for x in base + 0.001 * rng.standard_normal(16)])
        for i in range(200)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    # threshold -1: output == verified candidate set
    uncapped = sim.embedding_cosine_pairs(
        df, threshold=-1.0, n_bands=4, planes_per_band=8
    ).count()
    capped = sim.embedding_cosine_pairs(
        df, threshold=-1.0, n_bands=4, planes_per_band=8, max_bucket_df=10
    ).count()
    assert uncapped >= 19000  # ~all pairs: the skew blowup is real
    assert capped <= 4 * 10 * 9 / 2  # <= n_bands * C(cap, 2)


def test_embedding_pairs_star_mode(spark, planted_df):
    """mode='star': O(members) representative edges per bucket, still
    cosine-verified — every planted duplicate stays connected to its
    twin through the edge set, and a 200-copy dup farm costs O(n)
    edges instead of the capped self-join."""
    # star verifies member<->REPRESENTATIVE, so buckets must be
    # selective enough that random vectors rarely collide (16 planes =
    # 65k buckets for 300 vectors; the ~0.99997-cosine planted twins
    # still agree on all 16 bits with prob ~0.96 per band, 4 bands)
    edges = sim.embedding_cosine_pairs(
        planted_df, threshold=0.9, n_bands=4, planes_per_band=16, mode="star"
    ).collect()
    # build components from the star edges: each planted pair must
    # land in one component
    parent = {}
    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x
    for r in edges:
        parent[find(r["id_a"])] = find(r["id_b"])
    for i in range(150):
        assert find(i) == find(i + 1000), i
    # dup farm: edges stay linear in members
    rng = np.random.default_rng(4)
    base = rng.standard_normal(16)
    rows = [
        (int(i), [float(x) for x in base + 0.0001 * rng.standard_normal(16)])
        for i in range(200)
    ]
    farm = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    n_edges = sim.embedding_cosine_pairs(
        farm, threshold=-1.0, n_bands=4, planes_per_band=8, mode="star"
    ).count()
    assert n_edges <= 4 * 199  # <= n_bands * (members - 1)


def test_ann_lcg_planes_match_python(emb_df):
    """LCG-generated planes: engine buckets equal a pure-Python
    recomputation of the documented integer formula."""
    df, vecs = emb_df
    dim, n_planes, seed = 16, 8, 11
    idx = np.arange(n_planes * dim, dtype=np.int64).reshape(n_planes, dim)
    planes = ((1103515245 * (idx + seed) + 12345) % (1 << 31) - (1 << 30)) / float(1 << 30)
    got = (
        df.withColumn("b", sim.lsh_bucket_udf(dim, n_planes, seed, "lcg")(F.col("embedding")))
        .select("vec_id", "b")
        .collect()
    )
    for r in got:
        v = vecs[r["vec_id"]].astype(np.float64)
        signs = (planes @ v) > 0
        want = int((signs * (1 << np.arange(n_planes))).sum())
        assert r["b"] == want, r["vec_id"]


def test_ivf_full_probe_equals_bruteforce(spark, emb_df, tmp_path):
    """nprobe == n_centroids reads everything → EXACTLY cosine_topk
    (same JVM cosine expression, same ordering)."""
    df, vecs = emb_df
    path = str(tmp_path / "ivf_full")
    cents = sim.write_ivf_partitioned(df, path, n_centroids=8, n_iters=3)
    assert cents.shape == (8, 16)
    q = [float(x) for x in vecs[5]]
    got = [
        (r["id"], r["cosine"])
        for r in sim.ann_ivf_topk(spark, path, q, k=12, nprobe=8).collect()
    ]
    exact = [
        (r["id"], r["cosine"])
        for r in sim.cosine_topk(df, q, k=12).collect()
    ]
    assert got == exact and got[0][0] == 5


def test_ivf_partial_probe_prunes_and_recalls(spark, emb_df, tmp_path):
    df, vecs = emb_df
    path = str(tmp_path / "ivf")
    sim.write_ivf_partitioned(df, path, n_centroids=8, n_iters=3)
    q = [float(x) for x in vecs[21]]
    scan = sim.ann_ivf_topk(spark, path, q, k=10, nprobe=4)
    plan = scan._jdf.queryExecution().executedPlan().toString()
    assert "cid" in plan  # partition filter reached the scan
    got = {r["id"] for r in scan.collect()}
    assert 21 in got  # the query's own vector lives in its top centroid
    exact = set(_brute_topk(vecs.astype(np.float64), np.asarray(q), 10))
    # isotropic 16-dim noise is the worst case for a coarse quantizer —
    # half the partitions must still recover >= half the true top-10
    assert len(exact & got) >= 5
    # probing fewer centroids scans a subset of the candidates
    n3 = scan.count()  # nprobe=4
    n8 = sim.ann_ivf_topk(spark, path, q, k=400, nprobe=8).count()
    assert n3 <= n8 == 400


def test_ivf_training_deterministic(spark, emb_df):
    df, _vecs = emb_df
    a = sim.ivf_train_centroids(df, n_centroids=4, n_iters=2, seed=7)
    b = sim.ivf_train_centroids(df, n_centroids=4, n_iters=2, seed=7)
    assert np.array_equal(a, b)
    c = sim.ivf_train_centroids(df, n_centroids=4, n_iters=2, seed=8)
    assert not np.array_equal(a, c)
    # centroids are unit-norm (spherical k-means)
    assert np.allclose(np.linalg.norm(a, axis=1), 1.0)
