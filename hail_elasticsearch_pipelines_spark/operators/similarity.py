"""Similarity search over embedding columns (array<float>).

Brute-force cosine top-k is the exact baseline; the scale path is
random-hyperplane LSH bucketing (signs of projections) so each query
probes only its bucket (+ optional multiprobe neighbors).

Everything JVM-side where possible: dot products via
F.aggregate/F.zip_with (whole-stage codegen), projections via one
vectorized pandas_udf when the plane count makes HOFs unwieldy.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _dot_with_literal(vec_col, q: list[float]):
    """Σ vec[i]*q[i] with JVM HOFs — no Python in the plan. Index-based
    zip against a literal array keeps the literal broadcast-free."""
    qlit = F.array(*[F.lit(float(x)) for x in q])
    return F.aggregate(
        F.zip_with(vec_col, qlit, lambda a, b: a.cast("double") * b),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(vec_col):
    return F.sqrt(
        F.aggregate(
            F.transform(vec_col, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )


def cosine_topk(
    df: DataFrame,
    query_vec: list[float],
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Exact brute-force cosine top-k: (id, cosine) ordered desc, ties by
    id asc.  One scan, no shuffle except the final top-k (TakeOrdered)."""
    q = np.asarray(query_vec, dtype=np.float64)
    qn = float(np.sqrt((q * q).sum()))
    out = df.select(
        F.col(id_col).alias("id"),
        (_dot_with_literal(F.col(vec_col), list(map(float, query_vec))) / (_norm(F.col(vec_col)) * F.lit(qn))).alias(
            "cosine"
        ),
    )
    return out.orderBy(F.desc("cosine"), F.asc("id")).limit(k)


LCG_A, LCG_C, LCG_M = 1103515245, 12345, 1 << 31


def _hyperplanes(
    dim: int, n_planes: int, seed: int = 11, gen: str = "gaussian"
) -> np.ndarray:
    """gen="gaussian": numpy PRNG planes (default quality).
    gen="lcg": planes from a bounded-integer LCG over the flat plane
    index — every weight is reproducible in ANSI SQL (w = ((a*(idx+seed)
    + c) mod 2^31 - 2^30) / 2^30), so the DuckDB oracle can replicate
    bucket membership exactly."""
    if gen == "gaussian":
        rng = np.random.default_rng(seed)
        return rng.standard_normal((n_planes, dim))
    if gen == "lcg":
        idx = np.arange(n_planes * dim, dtype=np.int64).reshape(n_planes, dim)
        w = (LCG_A * (idx + seed) + LCG_C) % LCG_M - (LCG_M // 2)
        return w.astype(np.float64) / float(LCG_M // 2)
    raise ValueError(f"unknown plane gen {gen!r}")


def lsh_bucket_udf(dim: int, n_planes: int = 16, seed: int = 11, gen: str = "gaussian"):
    """Returns a pandas_udf mapping embedding → int bucket (sign bits of
    random-hyperplane projections).  Vectorized: one matmul per batch."""
    planes = _hyperplanes(dim, n_planes, seed, gen)

    @F.pandas_udf(T.IntegerType())
    def bucket(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
        for ser in batches:
            M = np.stack([np.asarray(v, dtype=np.float64) for v in ser])
            signs = (M @ planes.T) > 0
            vals = (signs * (1 << np.arange(n_planes))).sum(axis=1).astype(np.int32)
            yield pd.Series(vals)

    return bucket


def ann_lsh_topk(
    df: DataFrame,
    query_vec: list[float],
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_planes: int = 8,
    seed: int = 11,
    multiprobe: int = 1,
    plane_gen: str = "gaussian",
) -> DataFrame:
    """Approximate NN: probe the query's LSH bucket plus all buckets
    within `multiprobe` sign flips (i.e. Hamming distance <= multiprobe
    from the query bucket), brute-force cosine inside.

    At scale the table is WRITTEN partitioned by bucket (see
    `write_lsh_partitioned`) so this filter prunes files; here it
    filters post-scan."""
    q = np.asarray(query_vec, dtype=np.float64)
    planes = _hyperplanes(len(query_vec), n_planes, seed, plane_gen)
    qsigns = (planes @ q) > 0
    qbucket = int((qsigns * (1 << np.arange(n_planes))).sum())
    probes = {qbucket}
    if multiprobe >= 1:
        for i in range(n_planes):
            probes.add(qbucket ^ (1 << i))
    if multiprobe >= 2:
        for i in range(n_planes):
            for j in range(i + 1, n_planes):
                probes.add(qbucket ^ (1 << i) ^ (1 << j))
    bucketed = df.withColumn(
        "bucket", lsh_bucket_udf(len(query_vec), n_planes, seed, plane_gen)(F.col(vec_col))
    )
    cand = bucketed.filter(F.col("bucket").isin(sorted(probes)))
    return cosine_topk(cand, query_vec, k, vec_col, id_col)


def write_lsh_partitioned(
    df: DataFrame, path: str, vec_col: str = "embedding", n_planes: int = 8, seed: int = 11
) -> None:
    """Persist embeddings partitioned by LSH bucket → ANN queries prune
    to probed buckets at the file level (the IVF-file layout)."""
    dim = len(df.select(vec_col).head()[0])
    bucketed = df.withColumn("bucket", lsh_bucket_udf(dim, n_planes, seed)(F.col(vec_col)))
    bucketed.write.mode("overwrite").partitionBy("bucket").parquet(path)


def ann_lsh_topk_indexed(
    spark,
    path: str,
    query_vec: list[float],
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_planes: int = 8,
    seed: int = 11,
    multiprobe: int = 1,
) -> DataFrame:
    """ANN over a `write_lsh_partitioned` layout: the bucket predicate is
    a PARTITION filter, so only the probed buckets' files are read (the
    IVF scale path — at 10^12 vectors a query touches
    (1 + multiprobe-neighborhood)/2^n_planes of the data)."""
    q = np.asarray(query_vec, dtype=np.float64)
    planes = _hyperplanes(len(query_vec), n_planes, seed)
    qsigns = (planes @ q) > 0
    qbucket = int((qsigns * (1 << np.arange(n_planes))).sum())
    probes = {qbucket}
    if multiprobe >= 1:
        for i in range(n_planes):
            probes.add(qbucket ^ (1 << i))
    if multiprobe >= 2:
        for i in range(n_planes):
            for j in range(i + 1, n_planes):
                probes.add(qbucket ^ (1 << i) ^ (1 << j))
    cand = spark.read.parquet(path).filter(F.col("bucket").isin(sorted(probes)))
    return cosine_topk(cand, query_vec, k, vec_col, id_col)


def lsh_band_buckets_udf(
    dim: int, n_bands: int, planes_per_band: int, seed: int = 11, gen: str = "gaussian"
):
    """pandas_udf: embedding → array<int> of per-band LSH buckets
    (independent hyperplane sets per band — MinHash-style banding for
    vectors).  One matmul per batch."""
    planes = _hyperplanes(dim, n_bands * planes_per_band, seed, gen)
    weights = 1 << np.arange(planes_per_band)

    @F.pandas_udf(T.ArrayType(T.IntegerType()))
    def buckets(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
        for ser in batches:
            M = np.stack([np.asarray(v, dtype=np.float64) for v in ser])
            signs = (M @ planes.T) > 0  # (n, n_bands*planes_per_band)
            signs = signs.reshape(len(ser), n_bands, planes_per_band)
            vals = (signs * weights).sum(axis=2).astype(np.int32)
            yield pd.Series(list(vals))

    return buckets


def embedding_cosine_pairs(
    df: DataFrame,
    threshold: float = 0.95,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_bands: int = 4,
    planes_per_band: int = 8,
    seed: int = 11,
    max_bucket_df: int | None = 10_000,
    mode: str = "pairs",
) -> DataFrame:
    """Embedding near-dup pairs via MULTI-BAND hyperplane LSH: a pair is
    a candidate when it agrees on ALL sign bits of AT LEAST ONE band
    (independent plane sets per band — the MinHash-banding shape), then
    verified with exact cosine >= threshold.

    ``mode="star"`` (cluster semantics — the minhash/simhash guard,
    dedup._star_edges): each bucket emits (bucket-min, member)
    representative edges instead of the all-pairs self-join — O(n) per
    bucket — then cosine-verifies member↔representative.  Same recall
    contract as minhash_dedup_clusters: exact for duplicate-heavy
    buckets (every member matches the rep — the regime that explodes),
    but a pair sharing a bucket with an UNRELATED representative is
    lost, so star mode wants selective buckets (raise
    ``planes_per_band`` until random collisions are rare; a planted
    near-dup still agrees on all bits with probability ≈
    (1 − θ/π)^planes per band).  Feed the edges to connected
    components.

    Scale design (round-2 fix): the previous single-table all-pairs join
    over 2^n_planes buckets goes quadratic in a hot bucket at 10^9+
    vectors.  Banding bounds each band's bucket population to
    ~n/2^planes_per_band and recall is 1-(1-p^r)^b instead of p^n;
    `max_bucket_df` additionally drops (band, bucket) groups larger than
    the cap from candidate generation (explosion guard, like
    ngram_jaccard's max_shingle_df — standard practice for skewed
    corpora).  It defaults ON (10k): one degenerate bucket — zero
    vectors, near-duplicate farms — otherwise goes quadratic no matter
    how the expected population is bounded.  Recall impact: a pair
    loses a candidate band only when >10k vectors share that band's
    full bit signature; such pairs are overwhelmingly within
    near-duplicate farms where any surviving band (or the cheaper
    exact-dup digest pass) still links them.  Pass None to disable."""
    dim = len(df.select(vec_col).head()[0])
    bb = lsh_band_buckets_udf(dim, n_bands, planes_per_band, seed)
    b = df.select(
        F.col(id_col).alias("id"), F.col(vec_col).alias("v"), bb(F.col(vec_col)).alias("bkts")
    )
    bands = b.select(
        "id",
        F.posexplode("bkts").alias("band", "bucket"),
    )
    if max_bucket_df is not None:
        from pyspark.sql import Window

        # window count, not groupBy+anti-join: one (band, bucket)
        # shuffle, no second recomputation of the hyperplane-hash UDF
        # lineage (see dedup._cap_hot_buckets)
        bands = (
            bands.withColumn(
                "__bdf",
                F.count(F.lit(1)).over(Window.partitionBy("band", "bucket")),
            )
            .filter(F.col("__bdf") <= F.lit(max_bucket_df))
            .drop("__bdf")
        )
    if mode == "star":
        from .dedup import _star_edges

        cand = _star_edges(bands, ["band", "bucket"], [])
    elif mode == "pairs":
        a_side, b_side = bands.alias("a"), bands.alias("b")
        cand = (
            a_side.join(
                b_side,
                (F.col("a.band") == F.col("b.band"))
                & (F.col("a.bucket") == F.col("b.bucket"))
                & (F.col("a.id") < F.col("b.id")),
            )
            .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
            .distinct()
        )
    else:
        raise ValueError(f"unknown candidate mode {mode!r}")
    va = b.select(F.col("id").alias("id_a"), F.col("v").alias("v_a"))
    vb = b.select(F.col("id").alias("id_b"), F.col("v").alias("v_b"))
    pairs = cand.join(va, "id_a").join(vb, "id_b")
    dot = F.aggregate(
        F.zip_with("v_a", "v_b", lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return (
        pairs.withColumn("cosine", dot / (_norm(F.col("v_a")) * _norm(F.col("v_b"))))
        .filter(F.col("cosine") >= threshold)
        .select("id_a", "id_b", "cosine")
    )


# ---------------------------------------------------------------------------
# IVF — k-means coarse quantizer (the FAISS IVF-flat layout on parquet)
# ---------------------------------------------------------------------------


def _unit(M: np.ndarray) -> np.ndarray:
    n = np.sqrt((M * M).sum(axis=1, keepdims=True))
    n[n == 0] = 1.0
    return M / n


def ivf_train_centroids(
    df: DataFrame,
    n_centroids: int = 16,
    n_iters: int = 5,
    vec_col: str = "embedding",
    seed: int = 11,
) -> np.ndarray:
    """Deterministic distributed spherical k-means (Lloyd) — the IVF
    coarse quantizer.  Vectors and centroids are L2-normalized, so
    cosine assignment is one matmul argmax.  Init comes from the
    reproducible LCG plane generator (no data-dependent seeding), and
    each iteration is ONE job: every Arrow batch emits per-centroid
    partial (sum, count) rows — batches × n_centroids rows, never the
    vectors — which a tiny grouped combine folds into new centroids.
    Ties (equal dot) assign to the lowest centroid id; empty centroids
    keep their previous position.  Returns (n_centroids, dim) float64."""
    dim = len(df.select(vec_col).head()[0])
    cents = _unit(_hyperplanes(dim, n_centroids, seed, gen="lcg"))
    part_schema = T.StructType(
        [
            T.StructField("cid", T.IntegerType(), False),
            T.StructField("vsum", T.ArrayType(T.DoubleType()), False),
            T.StructField("cnt", T.LongType(), False),
        ]
    )
    for _ in range(int(n_iters)):
        C = cents  # capture per-iteration

        def partials(batches):
            for pdf in batches:
                M = _unit(
                    np.stack(
                        [np.asarray(v, np.float64) for v in pdf[vec_col]]
                    )
                )
                cid = np.argmax(M @ C.T, axis=1)
                out = []
                for c in np.unique(cid):
                    sel = M[cid == c]
                    out.append((int(c), sel.sum(axis=0).tolist(), len(sel)))
                yield pd.DataFrame(out, columns=["cid", "vsum", "cnt"])

        rows = (
            df.select(vec_col)
            .mapInPandas(partials, part_schema)
            .groupBy("cid")
            .applyInPandas(
                lambda key, pdf: pd.DataFrame(
                    [
                        (
                            int(key[0]),
                            np.sum(
                                np.stack([np.asarray(v) for v in pdf["vsum"]]),
                                axis=0,
                            ).tolist(),
                            int(pdf["cnt"].sum()),
                        )
                    ],
                    columns=["cid", "vsum", "cnt"],
                ),
                part_schema,
            )
            .collect()
        )
        new = cents.copy()
        for r in rows:
            if r["cnt"] > 0:
                new[r["cid"]] = np.asarray(r["vsum"], np.float64) / r["cnt"]
        cents = _unit(new)
    return cents


def ivf_assign_udf(centroids: np.ndarray):
    """pandas_udf: embedding → nearest-centroid id (normalized dot,
    ties to the lowest id).  One matmul per batch."""
    C = np.asarray(centroids, np.float64)

    @F.pandas_udf(T.IntegerType())
    def assign(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
        for ser in batches:
            M = _unit(np.stack([np.asarray(v, np.float64) for v in ser]))
            yield pd.Series(np.argmax(M @ C.T, axis=1).astype(np.int32))

    return assign


def write_ivf_partitioned(
    df: DataFrame,
    path: str,
    n_centroids: int = 16,
    n_iters: int = 5,
    vec_col: str = "embedding",
    seed: int = 11,
) -> np.ndarray:
    """Train the coarse quantizer, then persist embeddings partitioned
    by centroid id (`cid=`) with the centroids JSON beside the data —
    the FAISS IVF-flat layout on parquet.  An ANN query reads only the
    probed centroids' files (partition pruning), ~nprobe/n_centroids of
    the corpus at 10^12 vectors."""
    import json
    import os

    cents = ivf_train_centroids(df, n_centroids, n_iters, vec_col, seed)
    df.withColumn("cid", ivf_assign_udf(cents)(F.col(vec_col))).write.mode(
        "overwrite"
    ).partitionBy("cid").parquet(path)
    with open(os.path.join(path, "_centroids.json"), "w") as f:
        json.dump(cents.tolist(), f)
    return cents


def ann_ivf_topk(
    spark,
    path: str,
    query_vec: list[float],
    k: int = 10,
    nprobe: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """ANN over a `write_ivf_partitioned` layout: rank centroids by
    query dot, read the top-``nprobe`` partitions (a PARTITION filter —
    only those files are scanned), exact cosine top-k inside.  With
    ``nprobe >= n_centroids`` the result is EXACTLY `cosine_topk` over
    the whole table (same JVM cosine expression) — the correctness
    oracle; smaller nprobe trades recall for scan fraction."""
    import json
    import os

    with open(os.path.join(path, "_centroids.json")) as f:
        cents = np.asarray(json.load(f), np.float64)
    q = np.asarray(query_vec, np.float64)
    qn = np.sqrt((q * q).sum())
    order = np.argsort(-(cents @ (q / (qn if qn else 1.0))), kind="stable")
    probes = sorted(int(c) for c in order[: int(nprobe)])
    cand = spark.read.parquet(path).filter(F.col("cid").isin(probes))
    return cosine_topk(cand, query_vec, k, vec_col, id_col)
