"""Time ONLY the index build at a given parallelism/config — the fast
inner loop for scaling experiments (bench.py runs the full suite).

Usage: python scripts/build_probe.py CPUS N_DOCS [REPS]
Env:   SPARK_GRAFT_FUSE=1            fuse normalize+docs (default 1)
       SPARK_GRAFT_PARQUET_CODEC     stage parquet codec (default snappy)
       SPARK_GRAFT_SHUFFLE_CODEC     spark.io.compression.codec (default lz4)
       SPARK_GRAFT_ARROW_BATCH       arrow maxRecordsPerBatch (default 10000)
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hail_elasticsearch_pipelines_spark.operators.index_build import build_index
from hail_elasticsearch_pipelines_spark.session import get_spark
from hail_elasticsearch_pipelines_spark.sources.corpus import pages_df

BENCH_DIR = os.environ.get(
    "SPARK_GRAFT_BENCH_DIR",
    "/dev/shm/spark_graft_bench" if os.access("/dev/shm", os.W_OK) else "/tmp",
)


def main():
    cpus = int(sys.argv[1])
    n_docs = int(sys.argv[2])
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 2
    fuse = os.environ.get("SPARK_GRAFT_FUSE", "1") == "1"
    extra = {}
    if os.environ.get("SPARK_GRAFT_PARQUET_CODEC"):
        extra["spark.sql.parquet.compression.codec"] = os.environ[
            "SPARK_GRAFT_PARQUET_CODEC"
        ]
    if os.environ.get("SPARK_GRAFT_SHUFFLE_CODEC"):
        extra["spark.io.compression.codec"] = os.environ["SPARK_GRAFT_SHUFFLE_CODEC"]
    if os.environ.get("SPARK_GRAFT_ARROW_BATCH"):
        extra["spark.sql.execution.arrow.maxRecordsPerBatch"] = os.environ[
            "SPARK_GRAFT_ARROW_BATCH"
        ]
    spark = get_spark(
        app_name="build_probe",
        master=f"local[{cpus}]",
        shuffle_partitions=cpus,
        extra_conf=extra,
    )
    pages_path = f"{BENCH_DIR}/pages_{n_docs}"
    if not os.path.exists(os.path.join(pages_path, "_SUCCESS")):
        pages_df(spark, n_docs, n_partitions=max(cpus * 2, 8)).write.mode(
            "overwrite"
        ).parquet(pages_path)
    pages = spark.read.parquet(pages_path)
    idx = f"{BENCH_DIR}/probe_idx_{cpus}"
    times = []
    for _ in range(reps):
        shutil.rmtree(idx, ignore_errors=True)
        t0 = time.time()
        build_index(
            spark,
            pages,
            idx,
            docs_per_part=int(os.environ.get("SPARK_GRAFT_DPP", "4000")),
            n_term_buckets=16,
            checkpoint_normalize=not fuse,
        )
        times.append(round(time.time() - t0, 2))
    print(
        json.dumps(
            {
                "cpus": cpus,
                "n_docs": n_docs,
                "fuse": fuse,
                "conf": extra,
                "reps_sec": times,
                "best_sec": min(times),
                "docs_per_sec": round(n_docs / min(times), 1),
            }
        )
    )


if __name__ == "__main__":
    main()
