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
    "bm25_index_or": (["PartitionFilters", "term_bucket"], []),
    "top_customers": (["BroadcastHashJoin"], ["SortMergeJoin"]),
    "token_count": (["ReadSchema"], ["EvalPython"]),
    "text_quality": (["ReadSchema"], ["EvalPython"]),
    "pricing_summary": (["PushedFilters", "HashAggregate"], ["EvalPython"]),
    "hourly_events": (["HashAggregate"], ["EvalPython"]),
}


def plan_of(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark(app_name="explain", master="local[8]", shuffle_partitions=8)
    qs = entry.queries()
    bad = []
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
