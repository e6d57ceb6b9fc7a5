"""Dump .explain('formatted') for the headline query plans and grep the
properties that matter at 100 TB: parquet PushedFilters / partition
pruning on term_bucket, broadcast joins on small dims, WholeStageCodegen
spans around the JVM-side expression work.

Usage: python scripts/explain_plans.py [sf_dir]
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry
from hail_elasticsearch_pipelines_spark.session import get_spark

# wants: substrings that MUST appear; bans: substrings that must NOT
# (EvalPython = row/Arrow Python in the hot path — the JVM-side column
# expressions like tokenize are higher-order functions, which Spark
# never whole-stage-codegens, but they still run entirely in the JVM)
CHECKS = {
    # pos_blob banned: positions are phrase-only; shipping them through
    # the scoring shuffle would double the scan+exchange bytes
    "bm25_index_or": (["PartitionFilters", "term_bucket"], ["pos_blob"]),
    "top_customers": (["BroadcastHashJoin"], ["SortMergeJoin"]),
    "token_count": (["ReadSchema"], ["EvalPython"]),
    "text_quality": (["ReadSchema"], ["EvalPython"]),
    "pricing_summary": (["PushedFilters", "HashAggregate"], ["EvalPython"]),
    "hourly_events": (["HashAggregate"], ["EvalPython"]),
    # r5 doc values: the range predicate must reach the doclens scan
    # (BKD analog — row-group min/max pruning), never a post-scan filter
    # over a full doclens read; sorts stay TakeOrderedAndProject
    "range_search": (["(n_chars", ">= 150"], ["SortMergeJoin"]),
    "sort_recent": (["TakeOrderedAndProject"], ["SortMergeJoin", "Exchange rangepartitioning"]),
    "date_histogram": (["HashAggregate"], ["SortMergeJoin"]),
    # bucket+metric sub-agg fast path: per-segment partial aggregates,
    # ONE cogroup, no doc_id join stage
    "bucket_metrics_day": (["FlatMapCoGroupsInPandas", "HashAggregate"], ["SortMergeJoin"]),
}


def plan_of(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def check_corpus_date_pruning(spark) -> bool:
    """P9 time axis: a crawl_date-bounded read of a date-partitioned
    corpus must show non-empty PartitionFilters and NO residual row
    DataFilters (bounds fully absorbed by directory pruning)."""
    from hail_elasticsearch_pipelines_spark.sources.corpus import pages_df
    from hail_elasticsearch_pipelines_spark.sources.readers import (
        read_pages_interval,
        write_pages_partitioned,
    )

    path = "/tmp/explain_pages_by_date"
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        write_pages_partitioned(pages_df(spark, 3000, 4), path)
    pruned = read_pages_interval(
        spark, path, start_date="2025-01-16", end_date="2025-01-17"
    )
    plan = plan_of(pruned)
    pf = [ln for ln in plan.splitlines() if "PartitionFilters" in ln]
    exec_plan = pruned._jdf.queryExecution().executedPlan().toString()
    ok = (
        bool(pf)
        and "crawl_date" in pf[0]
        and ">=" in pf[0]
        and "DataFilters: []" in exec_plan
    )
    print(f"corpus_date_pruning: {'OK' if ok else 'MISSING partition pruning'}")
    if not ok:
        print(plan[:4000])
    return ok


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark(app_name="explain", master="local[8]", shuffle_partitions=8)
    qs = entry.queries()
    bad = []
    if not check_corpus_date_pruning(spark):
        bad.append("corpus_date_pruning")
    for name, (wants, bans) in CHECKS.items():
        plan = plan_of(qs[name](spark, sf_dir))
        missing = [w for w in wants if w not in plan]
        present = [b for b in bans if b in plan]
        ok = not missing and not present
        print(f"{name}: {'OK' if ok else f'MISSING {missing} BANNED-PRESENT {present}'}")
        if not ok:
            bad.append(name)
            print(plan[:4000])
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
