"""Capture .explain('formatted') for the r07-touched query paths.

Usage: python scripts/capture_plans_r07.py <repo_root> <suffix>
e.g.   python scripts/capture_plans_r07.py /tmp/r6tree before
       python scripts/capture_plans_r07.py /root/repo after

Writes plans/r07/<query>_<suffix>.txt under /root/repo.
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

root = sys.argv[1]
suffix = sys.argv[2]
sys.path.insert(0, root)

from pyspark.sql import functions as F  # noqa: E402

from hail_elasticsearch_pipelines_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT = "/root/repo/plans/r07"


def plan_of(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def main():
    spark = get_spark(
        app_name="plans_r07", master="local[8]", shuffle_partitions=8,
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
    emb = spark.read.parquet(os.path.join(SF_DIR, "embeddings.parquet"))

    from hail_elasticsearch_pipelines_spark.functions.tokenize import (
        tokenize_col,
    )
    from hail_elasticsearch_pipelines_spark.operators import dedup as dd
    from hail_elasticsearch_pipelines_spark.operators import similarity as sim
    from hail_elasticsearch_pipelines_spark.operators.bm25 import (
        bm25_exhaustive_df,
    )
    from hail_elasticsearch_pipelines_spark.operators.quality import (
        gopher_filter,
        ngram_overlap,
        repetition_stats,
    )

    bench_side = docs.filter(F.col("doc_id") % 37 == 0)
    plans = {
        "decontam_hashed": lambda: ngram_overlap(
            docs, bench_side, n=13, hashed=True
        ),
        "decontam_exact": lambda: ngram_overlap(docs, bench_side, n=13),
        "minhash_dedup": lambda: dd.minhash_dedup_pairs(docs, threshold=0.8),
        "repetition_stats": lambda: repetition_stats(docs, n=2),
        "gopher_filter": lambda: gopher_filter(docs),
        "bm25_exhaustive": lambda: bm25_exhaustive_df(
            docs.select("doc_id", tokenize_col("text").alias("toks")),
            ["fast", "key", "table"], "OR", 20, tokens_col="toks",
        ),
        "cosine_topk": lambda: sim.cosine_topk(
            emb,
            [float(x) for x in emb.filter(F.col("vec_id") == 0)
             .select("embedding").head()[0]],
            k=20,
        ),
    }
    os.makedirs(OUT, exist_ok=True)
    for name, fn in plans.items():
        try:
            p = plan_of(fn())
        except Exception as e:  # pragma: no cover
            p = f"ERROR: {e}\n"
        with open(os.path.join(OUT, f"{name}_{suffix}.txt"), "w") as f:
            f.write(p)
        print(name, "ok")


if __name__ == "__main__":
    main()
