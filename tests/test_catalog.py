"""Index catalog + blue/green reindex_swap (the reference's
datestamped-index rotation, re-expressed as atomic named pointers)."""

from __future__ import annotations

import os

import numpy as np
import pytest

from hail_elasticsearch_pipelines_spark.plans.catalog import (
    IndexCatalog,
    UnknownIndexError,
    reindex_swap,
)
from hail_elasticsearch_pipelines_spark.sources.corpus import gen_pages_pdf


def test_register_resolve_drop(small_index, tmp_path):
    index_dir, _ = small_index
    cat = IndexCatalog(str(tmp_path / "cat"))
    cat.register("web", index_dir)
    assert cat.resolve("web") == os.path.abspath(index_dir)
    assert cat.list_indexes() == {"web": os.path.abspath(index_dir)}
    cat.drop("web")
    with pytest.raises(UnknownIndexError):
        cat.resolve("web")
    assert os.path.exists(index_dir)  # drop without delete_files keeps data
    with pytest.raises(ValueError, match="bad index name"):
        cat.register("Bad Name", index_dir)
    with pytest.raises(FileNotFoundError):
        cat.register("empty", str(tmp_path / "nope"))


def test_reindex_swap_blue_green(spark, tmp_path):
    """Old searchers keep serving their pinned directory through a
    swap; new opens resolve the new one; history records the old."""
    cat = IndexCatalog(str(tmp_path / "cat"))
    m0 = reindex_swap(
        spark,
        cat,
        "web",
        spark.createDataFrame(gen_pages_pdf(np.arange(120))),
        docs_per_part=32,
        seg_group=2,
        n_term_buckets=4,
    )
    assert m0["previous_dir"] is None
    old_dir = cat.resolve("web")
    pinned = cat.open_local("web")
    before = pinned.search(["the"], "OR", 10)
    assert before

    m1 = reindex_swap(
        spark,
        cat,
        "web",
        spark.createDataFrame(gen_pages_pdf(np.arange(200))),
        docs_per_part=32,
        seg_group=2,
        n_term_buckets=4,
    )
    assert m1["previous_dir"] == old_dir
    assert cat.resolve("web") != old_dir
    # pinned searcher unaffected; old dir intact
    assert pinned.search(["the"], "OR", 10) == before
    assert os.path.exists(os.path.join(old_dir, "manifest.json"))
    # fresh open sees the new corpus (more docs match)
    fresh = cat.open_local("web")
    assert fresh.n_docs > pinned.n_docs
    # swap to a non-index path refuses
    with pytest.raises(FileNotFoundError):
        cat.swap("web", str(tmp_path / "nothing"))


def test_reserve_build_dir_never_reuses_live_dirs(small_index, tmp_path):
    """ADVICE r5: concurrent reindexes must get DISTINCT build dirs
    (reservation under the catalog lock), and a dir referenced by the
    current pointer or history must never be picked even when a manual
    register() reset the history to []."""
    import threading

    index_dir, _ = small_index
    cat = IndexCatalog(str(tmp_path / "cat"))
    root = str(tmp_path / "indexes")
    cat.register("web", index_dir)

    # concurrent reservations: all distinct, all pre-created
    got, errs = [], []
    barrier = threading.Barrier(4)

    def reserve():
        try:
            barrier.wait()
            got.append(cat.reserve_build_dir("web", root))
        except Exception as e:  # noqa: BLE001
            errs.append(e)

    ts = [threading.Thread(target=reserve) for _ in range(4)]
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    assert not errs and len(set(got)) == 4
    assert all(os.path.isdir(d) for d in got)

    # history-reset hazard: point the name at a dir INSIDE the build
    # root whose rev the naive len(history)+1 scheme would pick next
    live = os.path.join(root, "web-r1")
    assert live in got or os.path.isdir(live)
    import shutil

    shutil.copytree(index_dir, live, dirs_exist_ok=True)
    cat.register("web", index_dir)  # resets history to []
    cat.swap("web", live)  # current = web-r1, history = [index_dir]
    marker = os.path.join(live, "PINNED")
    open(marker, "w").close()
    nxt = cat.reserve_build_dir("web", root)
    assert os.path.abspath(nxt) != os.path.abspath(live)
    assert os.path.exists(marker), "reservation touched a live dir"


def test_concurrent_swaps_keep_full_history(small_index, tmp_path):
    """Two threads swapping the same name serialize under the catalog
    flock: both swaps land and the history holds every prior dir."""
    import shutil
    import threading

    index_dir, _ = small_index
    cat = IndexCatalog(str(tmp_path / "cat"))
    dirs = []
    for i in range(3):
        d = str(tmp_path / f"idx{i}")
        shutil.copytree(index_dir, d)
        dirs.append(d)
    cat.register("web", dirs[0])
    barrier = threading.Barrier(2)
    errs = []

    def swapper(d):
        try:
            barrier.wait()
            cat.swap("web", d)
        except Exception as e:  # noqa: BLE001
            errs.append(e)

    ts = [threading.Thread(target=swapper, args=(d,)) for d in dirs[1:]]
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    assert not errs
    entry_hist = cat._read("web")["history"]
    # both swaps recorded: initial dir + the loser of the race
    assert len(entry_hist) == 2
    assert cat.resolve("web") in (os.path.abspath(d) for d in dirs[1:])
