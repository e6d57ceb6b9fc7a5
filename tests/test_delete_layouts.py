"""Tombstone-layout compatibility: legacy flat root-level delete files,
hive sidecars, and MIXED layouts must all be read losslessly, and the
first sidecar publish on a legacy index migrates flat files away.

Reference analog: ES delete/update write ops keep live-docs server-side
(hail_scripts/v02/utils/elasticsearch_client.py:106-113); here the
on-disk layout evolved (flat → per-segment sidecars) and old indexes
must keep their tombstones across the transition (ADVICE r3, high).
"""

from __future__ import annotations

import datetime as dt
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from hail_elasticsearch_pipelines_spark.functions.extract import py_extract_text
from hail_elasticsearch_pipelines_spark.operators.bm25 import (
    IndexSearcher,
    load_deletes,
    read_segment_deletes,
)
from hail_elasticsearch_pipelines_spark.operators.index_build import build_index
from hail_elasticsearch_pipelines_spark.operators.serve import LocalSearcher
from hail_elasticsearch_pipelines_spark.plans.maintenance import (
    ConcurrentMaintenanceError,
    _maintenance_lock,
    upsert_index,
)
from hail_elasticsearch_pipelines_spark.sources.corpus import (
    BASE_TS,
    _build_html,
    _doc_tokens,
    gen_pages_pdf,
)


def _recrawl_pdf(indices) -> pd.DataFrame:
    rows = []
    for i in indices:
        i = int(i)
        url = f"https://site{i % 97}.example/cat{i % 11}/page-{i:08d}"
        toks = _doc_tokens(i, 1)
        html = _build_html(i, toks, "en")
        rows.append(
            (url, BASE_TS + dt.timedelta(days=365), html, py_extract_text(html), "en")
        )
    return pd.DataFrame(rows, columns=["url", "warc_ts", "html", "text", "lang"])


def _flatten_deletes(index_dir: str) -> dict[int, np.ndarray]:
    """Rewrite the deletes dir into the LEGACY flat layout (one root
    parquet file with a ``segment`` data column); returns the original
    per-segment tombstones."""
    import shutil

    orig = load_deletes(index_dir)
    assert orig, "fixture must have tombstones"
    dpath = os.path.join(index_dir, "deletes")
    shutil.rmtree(dpath)
    os.makedirs(dpath)
    segs = np.concatenate([np.full(v.size, s, np.int32) for s, v in orig.items()])
    ids = np.concatenate(list(orig.values()))
    pq.write_table(
        pa.table({"segment": segs, "doc_id": ids}),
        os.path.join(dpath, "legacy-flat-0000.parquet"),
    )
    return orig


@pytest.fixture(scope="module")
def legacy_index(spark, tmp_path_factory):
    """Index with tombstones REWRITTEN into the legacy flat layout."""
    out = str(tmp_path_factory.mktemp("legacy") / "idx")
    base = gen_pages_pdf(np.arange(60))
    build_index(
        spark,
        spark.createDataFrame(base),
        out,
        docs_per_part=17,
        seg_group=2,
        n_term_buckets=8,
    )
    upsert_index(spark, out, spark.createDataFrame(_recrawl_pdf(np.arange(5, 20))))
    orig = _flatten_deletes(out)
    return out, orig


def test_flat_layout_read_back(legacy_index):
    out, orig = legacy_index
    got = load_deletes(out)
    assert set(got) == set(orig)
    for s, v in orig.items():
        np.testing.assert_array_equal(got[s], v)
        np.testing.assert_array_equal(read_segment_deletes(os.path.join(out, "deletes"), s, epoch=101), v)


def test_mixed_layout_unions_flat_and_sidecar(legacy_index, tmp_path):
    """A sidecar appearing NEXT TO flat files must union, not shadow:
    segments with a sidecar keep their flat tombstones, segments without
    one keep theirs too, and load_deletes doesn't crash on the mix."""
    out, orig = legacy_index
    some_seg = sorted(orig)[0]
    side = os.path.join(out, "deletes", f"segment={some_seg}")
    os.makedirs(side, exist_ok=True)
    extra = np.array([999_999], np.int64)
    pq.write_table(pa.table({"doc_id": extra}), os.path.join(side, "new.parquet"))
    try:
        got = load_deletes(out)
        np.testing.assert_array_equal(
            got[some_seg], np.union1d(orig[some_seg], extra)
        )
        for s in sorted(orig)[1:]:
            np.testing.assert_array_equal(got[s], orig[s])
            np.testing.assert_array_equal(
                read_segment_deletes(os.path.join(out, "deletes"), s, epoch=202), orig[s]
            )
        np.testing.assert_array_equal(
            read_segment_deletes(os.path.join(out, "deletes"), some_seg, epoch=202),
            np.union1d(orig[some_seg], extra),
        )
    finally:
        import shutil

        shutil.rmtree(side)


def test_upsert_on_legacy_index_migrates_and_keeps_tombstones(
    spark, legacy_index
):
    """First new-code upsert on a flat-layout index: publishes sidecars,
    migrates flat files away, and NO tombstone is resurrected."""
    out, orig = legacy_index
    manifest = upsert_index(
        spark, out, spark.createDataFrame(_recrawl_pdf(np.arange(40, 50)))
    )
    dpath = os.path.join(out, "deletes")
    flat_left = [f for f in os.listdir(dpath) if f.endswith(".parquet")]
    assert flat_left == [], "flat files must be migrated into sidecars"
    got = load_deletes(out)
    for s, v in orig.items():
        assert np.isin(v, got.get(s, np.array([], np.int64))).all(), (
            f"segment {s} lost flat-era tombstones"
        )
    n_dead = sum(v.size for v in got.values())
    assert n_dead == sum(v.size for v in orig.values()) + 10
    # searches (distributed + local) exclude every tombstoned doc
    dead_ids = {int(i) for v in got.values() for i in v}
    s = IndexSearcher(spark, out)
    hits = {
        int(r["doc_id"])
        for r in s.search(["the"], "OR", k=500, algo="exhaustive").collect()
    }
    assert not (hits & dead_ids)
    ls = LocalSearcher(out)
    hits_local = {d for d, _ in ls.search(["the"], "OR", k=500, algo="exhaustive")}
    assert not (hits_local & dead_ids)
    assert manifest["metrics"]["n_tombstones"] == n_dead


def _contend_for_lock(idx: str, start_evt, q) -> None:
    """Child-process contender: reports 'acquired'/'busy'/error repr."""
    import time

    start_evt.wait()
    try:
        with _maintenance_lock(idx):
            lock = os.path.join(idx, "_MAINTENANCE_LOCK")
            with open(lock) as f:
                held_pid = int(f.read())
            time.sleep(0.3)  # overlap the other contenders' attempts
            q.put(("acquired", held_pid == os.getpid()))
    except ConcurrentMaintenanceError:
        q.put(("busy", True))
    except Exception as e:  # noqa: BLE001
        q.put(("error", repr(e)))


def test_stale_lock_steal_is_single_winner(tmp_path):
    """N processes contending over a dead holder's lockfile: the steal
    must be atomic — exactly one contender acquires (the rest observe
    the winner's live pid and raise ConcurrentMaintenanceError), and
    the second unlink of the old unsafe steal path must neither delete
    the winner's fresh lock nor leak FileNotFoundError (ADVICE r3)."""
    import multiprocessing as mp

    ctx = mp.get_context("fork")
    idx = str(tmp_path)
    lock = os.path.join(idx, "_MAINTENANCE_LOCK")
    with open(lock, "w") as f:
        f.write("999999999")  # dead holder
    q = ctx.Queue()
    start_evt = ctx.Event()
    procs = [
        ctx.Process(target=_contend_for_lock, args=(idx, start_evt, q))
        for _ in range(6)
    ]
    for p in procs:
        p.start()
    start_evt.set()
    results = [q.get(timeout=30) for _ in procs]
    for p in procs:
        p.join(timeout=30)
    outcomes = [r[0] for r in results]
    assert outcomes.count("error") == 0, results
    assert outcomes.count("acquired") == 1, results
    assert outcomes.count("busy") == len(procs) - 1, results
    winner = [r for r in results if r[0] == "acquired"][0]
    assert winner[1], "winner's lockfile must carry the winner's pid"
    assert not os.path.exists(lock)
