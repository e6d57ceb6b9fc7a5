"""Phase-isolation benchmarks for optimization round 7 (guide §1.4).

NOT the driver bench — bench.py stays frozen.  This file times the
expensive operators in isolation with noop sinks so each change can be
attributed.  Pass phase names as argv (default: all).

Env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS (same contract as bench.py).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F

from hail_elasticsearch_pipelines_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
BENCH_DIR = os.environ.get(
    "SPARK_GRAFT_BENCH_DIR",
    "/dev/shm/spark_graft_bench" if os.access("/dev/shm", os.W_OK) else "/tmp",
)
N_DOCS = int(os.environ.get("SPARK_GRAFT_BENCH_DOCS", "200000"))
REPS = int(os.environ.get("SPARK_GRAFT_EXTRA_REPS", "2"))


def _read(spark, table):
    return spark.read.parquet(os.path.join(SF_DIR, f"{table}.parquet"))


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def best_of(fn, reps=None, label=""):
    best = float("inf")
    for _ in range(reps or REPS):
        t0 = time.time()
        fn()
        best = min(best, time.time() - t0)
    return round(best, 3)


def main():
    phases = set(sys.argv[1:]) or {
        "decontam", "minhash", "percolate", "build", "misc"
    }
    spark = get_spark(
        app_name="bench_extra", master=f"local[{CPUS}]",
        shuffle_partitions=CPUS,
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    sc = spark.sparkContext
    out: dict[str, float] = {}
    docs = _read(spark, "documents")

    if "decontam" in phases:
        from hail_elasticsearch_pipelines_spark.operators.quality import (
            _gram_col,
            ngram_overlap,
        )

        bench_side = docs.filter(F.col("doc_id") % 37 == 0)
        sc.setJobDescription("decontam: gram build + distinct only")
        out["decontam_grams_only"] = best_of(
            lambda: noop(
                docs.select(
                    "doc_id",
                    F.size(F.array_distinct(_gram_col("text", 13))).alias("n"),
                )
            )
        )
        sc.setJobDescription("decontam: hashed full")
        out["decontam_hashed"] = best_of(
            lambda: ngram_overlap(docs, bench_side, n=13, hashed=True)
            .agg(F.sum("n_overlap"))
            .collect()
        )
        sc.setJobDescription("decontam: exact full")
        out["decontam_exact"] = best_of(
            lambda: ngram_overlap(docs, bench_side, n=13, hashed=False)
            .agg(F.sum("n_overlap"))
            .collect()
        )

    if "minhash" in phases:
        from hail_elasticsearch_pipelines_spark.operators import dedup as dd

        sc.setJobDescription("minhash: shingle hash arrays only")
        out["minhash_shingles_only"] = best_of(
            lambda: noop(
                docs.select(
                    "doc_id",
                    F.transform(
                        dd.token_shingles(F.col("text"), 3),
                        lambda s: F.xxhash64(s),
                    ).alias("sh"),
                )
            )
        )
        sc.setJobDescription("minhash: signatures")
        out["minhash_signatures"] = best_of(
            lambda: noop(dd.minhash_signatures(docs))
        )
        sc.setJobDescription("minhash: lsh candidates")
        out["minhash_candidates"] = best_of(
            lambda: noop(
                dd.minhash_lsh_candidates(dd.minhash_signatures(docs), 16, 4)
            )
        )
        sc.setJobDescription("minhash: full pairs")
        out["minhash_pairs"] = best_of(
            lambda: dd.minhash_dedup_pairs(docs, threshold=0.8).collect()
        )

    if "percolate" in phases:
        import hail_elasticsearch_pipelines_spark.operators.percolate as _perc
        from hail_elasticsearch_pipelines_spark.sources.corpus import pages_df

        pages_path = f"{BENCH_DIR}/pages_{N_DOCS}"
        if not os.path.exists(os.path.join(pages_path, "_SUCCESS")):
            pages_df(spark, N_DOCS, n_partitions=max(CPUS * 2, 8)).write.mode(
                "overwrite"
            ).parquet(pages_path)
        pages = spark.read.parquet(pages_path)
        perc_docs = pages.where(F.col("text").isNotNull()).select(
            F.monotonically_increasing_id().alias("doc_id"), "text", "lang"
        )
        sc.setJobDescription("percolate: 200k x 4 queries")
        q4 = {
            "w1": "term4000 OR term4001",
            "w2": '"of the"',
            "w3": "lang:en AND term400*",
            "w4": "the AND NOT of",
        }
        out["percolate_200k"] = best_of(
            lambda: _perc.percolate(perc_docs, q4).count()
        )
        watch_q = {}
        for i in range(5000):
            if i % 10 == 9:
                watch_q[f"w{i:05d}"] = (
                    f"term{i % 997:04d} OR term{(i + 13) % 997:04d}"
                )
            else:
                watch_q[f"w{i:05d}"] = (
                    f"term{i % 997:04d} AND term{(i * 7) % 997:04d}"
                )
        perc5 = perc_docs.limit(20_000).repartition(CPUS).cache()
        perc5.count()
        sc.setJobDescription("percolate: 5kq prefiltered")
        out["percolate_5kq"] = best_of(
            lambda: _perc.percolate(perc5, watch_q).count()
        )
        sc.setJobDescription("percolate: 5kq naive")
        _orig = _perc._Prefilter
        _perc._Prefilter = lambda compiled: None
        try:
            out["percolate_5kq_naive"] = best_of(
                lambda: _perc.percolate(perc5, watch_q).count(), reps=1
            )
        finally:
            _perc._Prefilter = _orig
        perc5.unpersist()

    if "build" in phases:
        from hail_elasticsearch_pipelines_spark.operators.index_build import (
            build_index,
        )
        from hail_elasticsearch_pipelines_spark.sources.corpus import pages_df

        pages_path = f"{BENCH_DIR}/pages_{N_DOCS}"
        if not os.path.exists(os.path.join(pages_path, "_SUCCESS")):
            pages_df(spark, N_DOCS, n_partitions=max(CPUS * 2, 8)).write.mode(
                "overwrite"
            ).parquet(pages_path)
        pages = spark.read.parquet(pages_path)
        idx_dir = f"{BENCH_DIR}/index_extra_{CPUS}"
        times = []
        for _ in range(3):
            shutil.rmtree(idx_dir, ignore_errors=True)
            sc.setJobDescription("index build")
            t0 = time.time()
            build_index(
                spark, pages, idx_dir, docs_per_part=4000, n_term_buckets=16,
                checkpoint_normalize=False,
            )
            times.append(round(time.time() - t0, 2))
        out["index_build_reps"] = times  # type: ignore[assignment]

    if "misc" in phases:
        from hail_elasticsearch_pipelines_spark.functions.tokenize import (
            tokenize_col,
        )
        from hail_elasticsearch_pipelines_spark.operators import similarity as sim
        from hail_elasticsearch_pipelines_spark.operators.bm25 import (
            bm25_exhaustive_df,
        )
        from hail_elasticsearch_pipelines_spark.operators.quality import (
            repetition_stats,
        )

        toks = docs.select("doc_id", tokenize_col("text").alias("toks"))
        sc.setJobDescription("bm25 exhaustive sf")
        out["bm25_exhaustive_sf"] = best_of(
            lambda: bm25_exhaustive_df(
                toks, ["fast", "key", "table"], "OR", 20, tokens_col="toks"
            ).collect()
        )
        sc.setJobDescription("repetition stats sf")
        out["repetition_stats_sf"] = best_of(
            lambda: repetition_stats(docs, n=2).count()
        )
        emb = _read(spark, "embeddings")
        qvec = [
            float(x)
            for x in emb.filter(F.col("vec_id") == 0)
            .select("embedding")
            .head()[0]
        ]
        sc.setJobDescription("cosine topk sf")
        out["cosine_topk_sf"] = best_of(
            lambda: sim.cosine_topk(emb, qvec, k=20).collect()
        )

    print(json.dumps({"sf_dir": SF_DIR, "cpus": CPUS, "results": out}))


if __name__ == "__main__":
    main()
