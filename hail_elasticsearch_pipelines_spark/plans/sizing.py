"""Data-volume-driven physical sizing heuristics.

Reference analogs:
  * ES shard count `max(min_shards, ceil(rows*cols / 1.4e9))`
    (luigi_pipeline/lib/hail_tasks.py:247-251)
  * size-dependent plan switching: small callset < 1,000 samples,
    huge >= 100,000 (batch_seqr_loader/batch_workflow.py:447-452)
"""

from __future__ import annotations

import math

# postings per index partition — the 1.4e9-cells-per-shard analog;
# ~1 GB of compressed postings per partition at ~1 byte/posting
TARGET_POSTINGS_PER_PARTITION = 1_000_000_000
# docs per build partition: bounds partial-index memory (tokens of one
# partition live in one Arrow group during the build)
TARGET_DOCS_PER_BUILD_PARTITION = 50_000


def num_index_partitions(total_postings: int, min_partitions: int = 1) -> int:
    return max(min_partitions, math.ceil(total_postings / TARGET_POSTINGS_PER_PARTITION))


def num_build_partitions(n_docs: int, min_partitions: int = 1, docs_per_partition: int | None = None) -> int:
    per = docs_per_partition or TARGET_DOCS_PER_BUILD_PARTITION
    return max(min_partitions, math.ceil(n_docs / per))


def corpus_size_class(n_docs: int) -> str:
    """small/medium/huge strategy switch (reference thresholds scaled to
    docs instead of samples)."""
    if n_docs < 100_000:
        return "small"
    if n_docs < 1_000_000_000:
        return "medium"
    return "huge"
