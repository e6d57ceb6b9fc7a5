"""Snapshot / restore (ES _snapshot repository analog,
plans/maintenance.py): point-in-time hardlink copies, generation-flip
restores, pinned-searcher isolation."""

from __future__ import annotations

import os

import pytest

from hail_elasticsearch_pipelines_spark.layout import load_manifest, table_path
from hail_elasticsearch_pipelines_spark.operators.bm25 import IndexSearcher
from hail_elasticsearch_pipelines_spark.operators.serve import LocalSearcher
from hail_elasticsearch_pipelines_spark.plans.maintenance import (
    delete_by_query,
    restore_snapshot,
    snapshot_index,
)


@pytest.fixture()
def work_index(spark, small_index, tmp_path):
    import shutil

    work = str(tmp_path / "idx")
    shutil.copytree(small_index[0], work)
    return work


def _results(spark, index_dir, terms=("the", "term0042")):
    s = IndexSearcher(spark, index_dir)
    return (
        s.n_docs,
        [(r.doc_id, r.score) for r in s.search(list(terms), "OR", k=25, algo="exhaustive").collect()],
    )


def test_snapshot_restore_roundtrip_bit_identical(spark, work_index, tmp_path):
    snap = str(tmp_path / "snap")
    before = _results(spark, work_index)
    meta = snapshot_index(work_index, snap)
    assert meta["files_linked"] > 0
    # snapshot data files are hardlinks of the source (inode identity)
    m = load_manifest(work_index)
    src_dir = table_path(work_index, "postings", m)
    rel = os.path.relpath(src_dir, work_index)
    sample = None
    for root, _d, files in os.walk(src_dir):
        for fn in files:
            if fn.endswith(".parquet"):
                sample = (os.path.join(root, fn), os.path.relpath(os.path.join(root, fn), src_dir))
                break
        if sample:
            break
    linked = os.path.join(snap, rel, sample[1])
    assert os.stat(sample[0]).st_ino == os.stat(linked).st_ino
    # mutate the original: docs vanish
    delete_by_query(spark, work_index, ["term0042"], mode="OR")
    mutated = _results(spark, work_index)
    assert mutated != before
    # restore: state is the snapshot's, bit-for-bit
    r = restore_snapshot(snap, work_index)
    assert r["generation"] > m["generation"]
    assert _results(spark, work_index) == before
    # local twin agrees
    L = LocalSearcher(work_index)
    assert L.n_docs == before[0]


def test_restore_is_generation_publish_pinned_searcher_unaffected(
    spark, work_index, tmp_path
):
    snap = str(tmp_path / "snap2")
    snapshot_index(work_index, snap)
    delete_by_query(spark, work_index, ["term0042"], mode="OR")
    pinned = LocalSearcher(work_index)
    n_mutated = pinned.n_docs
    restore_snapshot(snap, work_index)
    # pinned searcher keeps serving the pre-restore generation
    assert pinned.n_docs == n_mutated
    assert pinned.search_count(["term0042"]) == 0
    # reload advances to the restored state
    assert pinned.reload() is True
    assert pinned.search_count(["term0042"]) > 0


def test_snapshot_refuses_nonempty_target(work_index, tmp_path):
    tgt = tmp_path / "occupied"
    tgt.mkdir()
    (tgt / "x").write_text("y")
    with pytest.raises(ValueError):
        snapshot_index(work_index, str(tgt))
