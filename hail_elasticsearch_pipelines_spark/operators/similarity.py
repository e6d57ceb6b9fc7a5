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


def _hyperplanes(dim: int, n_planes: int, seed: int = 11) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_planes, dim))


def lsh_bucket_udf(dim: int, n_planes: int = 16, seed: int = 11):
    """Returns a pandas_udf mapping embedding → int bucket (sign bits of
    random-hyperplane projections).  Vectorized: one matmul per batch."""
    planes = _hyperplanes(dim, n_planes, seed)

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
) -> DataFrame:
    """Approximate NN: probe the query's LSH bucket plus all buckets
    within `multiprobe` sign flips, brute-force cosine inside.

    At scale the table is WRITTEN partitioned by bucket (see
    `write_lsh_partitioned`) so this filter prunes files; here it
    filters post-scan."""
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
    bucketed = df.withColumn("bucket", lsh_bucket_udf(len(query_vec), n_planes, seed)(F.col(vec_col)))
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


def embedding_cosine_pairs(
    df: DataFrame,
    threshold: float = 0.95,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_planes: int = 8,
    seed: int = 11,
) -> DataFrame:
    """Embedding near-dup candidate pairs: LSH-bucket equi-join (pairs
    agreeing on ALL sign bits), verified with exact cosine >= threshold.
    Approximate by construction (a near-dup pair can straddle a
    hyperplane); recall grows with fewer planes."""
    dim = len(df.select(vec_col).head()[0])
    b = df.withColumn("bucket", lsh_bucket_udf(dim, n_planes, seed)(F.col(vec_col)))
    left = b.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("v_a"), "bucket")
    right = b.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("v_b"), "bucket")
    cand = left.join(right, "bucket").filter(F.col("id_a") < F.col("id_b"))
    dot = F.aggregate(
        F.zip_with("v_a", "v_b", lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return (
        cand.withColumn("cosine", dot / (_norm(F.col("v_a")) * _norm(F.col("v_b"))))
        .filter(F.col("cosine") >= threshold)
        .select("id_a", "id_b", "cosine")
    )
