"""Index maintenance: incremental append/upsert, tombstoned deletes,
and segment compaction.

Reference analogs:
  * ES write ops ``index/create/update/upsert`` for re-export into an
    existing index (hail_scripts/shared/elasticsearch_utils.py:11-17,
    hail_scripts/v02/utils/elasticsearch_client.py:106-113) →
    ``extend_index(mode="create")`` appends only new urls;
    ``upsert_index`` (mode="upsert") additionally TOMBSTONES the old
    doc of every re-crawled url and indexes the new content — the #1
    operation on a crawl corpus.  Deletes follow Lucene live-docs
    semantics: postings stay on disk, a per-segment tombstone set is
    consulted at query time, and compaction physically drops them.
  * ES ``forcemerge`` after load (elasticsearch_client.py:214) →
    ``compact_index``: strips tombstoned postings and coarsens the
    segment axis by an integer factor, concat-merging each term's
    per-segment rows.

Statistics contract (ES/Lucene-identical): after an upsert, ``n_docs``
/ ``total_tokens`` / ``avgdl`` are EXACT (the tombstoned docs' lengths
are subtracted using the doclens table), but per-term ``df`` still
counts tombstoned docs until compaction — exactly how Lucene collection
statistics behave between deletes and merges.  ``compact_index``
restores exact ``df``/``cf`` (it recounts while rewriting blobs), so a
compacted index scores bit-identically to a fresh build of the live
corpus.
"""

from __future__ import annotations

import contextlib
import json
import os

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import codecs
from ..operators import index_build as ib
from ..operators.bm25 import load_deletes
from .pipeline import _swap_dir, _update_termdict, _write_termdict


def _load_manifest(index_dir: str) -> dict:
    with open(os.path.join(index_dir, "manifest.json")) as f:
        return json.load(f)


def _save_manifest(index_dir: str, manifest: dict) -> None:
    with open(os.path.join(index_dir, "manifest.json"), "w") as f:
        json.dump(manifest, f, indent=2)


def _postings_metrics(postings: DataFrame) -> dict:
    row = postings.agg(
        F.sum("df").alias("postings_emitted"),
        F.sum("n_bytes").alias("bytes_compressed"),
        F.count("*").alias("posting_rows"),
        F.countDistinct("term").alias("n_terms"),
        F.countDistinct("segment").alias("n_segments"),
    ).collect()[0]
    return {
        "postings_emitted": int(row["postings_emitted"] or 0),
        "bytes_compressed": int(row["bytes_compressed"] or 0),
        "posting_rows": int(row["posting_rows"]),
        "n_terms": int(row["n_terms"]),
        "n_segments": int(row["n_segments"]),
    }


def _segment_col(doc_id_col, dpp: int, seg_group: int):
    """segment = (doc_id // dpp) // seg_group, JVM-side."""
    return (
        F.floor(F.floor(doc_id_col / F.lit(dpp)) / F.lit(seg_group))
    ).cast("int")


class ConcurrentMaintenanceError(RuntimeError):
    """Another maintenance op (extend/upsert/update/compact) holds the
    index's lock."""


@contextlib.contextmanager
def _maintenance_lock(index_dir: str):
    """Single-writer guard for index maintenance: O_EXCL lockfile with
    the holder's pid.  Concurrent extend/compact/update would interleave
    postings appends and dir swaps unpredictably — ES serializes these
    through the cluster state; here a lockfile does.  A lock whose pid
    is dead (crashed holder) is stolen — the on-disk formats are
    crash-consistent, so retrying over a crashed op's leavings is safe.
    (On a shared cluster fs the pid check is only advisory; a TTL lease
    would replace it.)"""
    import fcntl

    lock = os.path.join(index_dir, "_MAINTENANCE_LOCK")
    # Mutual exclusion comes from kernel flock — auto-released when the
    # holder dies, so there is NO stale-lock steal logic to race (the
    # r3 pid-file steal had an unfixable check-then-rename TOCTOU: two
    # waiters observing a dead pid could free-for-all and one would
    # delete the winner's fresh lock).  The pid content is diagnostic
    # plus an ADVISORY guard for legacy lockfiles written without
    # flock.  The open/flock/verify loop is the standard pattern for
    # flock on an unlink-on-release path: after acquiring, re-stat the
    # path and retry if our fd no longer names it (the previous holder
    # unlinked between our open and flock).
    while True:
        fd = os.open(lock, os.O_CREAT | os.O_RDWR, 0o644)
        try:
            fcntl.flock(fd, fcntl.LOCK_EX | fcntl.LOCK_NB)
        except BlockingIOError:
            try:
                pid = int(os.read(fd, 64).decode().strip() or "0")
            except ValueError:
                pid = 0
            os.close(fd)
            raise ConcurrentMaintenanceError(
                f"index {index_dir} is being maintained by pid {pid or '?'}"
            ) from None
        try:
            if os.fstat(fd).st_ino != os.stat(lock).st_ino:
                os.close(fd)
                continue  # holder unlinked under us; retry on fresh inode
        except FileNotFoundError:
            os.close(fd)
            continue
        try:
            pid = int(os.read(fd, 64).decode().strip() or "0")
        except ValueError:
            pid = 0
        if pid and pid != os.getpid():
            alive = True
            try:
                os.kill(pid, 0)
            except (ProcessLookupError, PermissionError):
                alive = False
            if alive:  # legacy non-flock holder — honor it
                os.close(fd)
                raise ConcurrentMaintenanceError(
                    f"index {index_dir} is being maintained by pid {pid}"
                )
        os.ftruncate(fd, 0)
        os.pwrite(fd, str(os.getpid()).encode(), 0)
        break
    try:
        yield
    finally:
        with contextlib.suppress(OSError):
            os.unlink(lock)
        os.close(fd)  # releases the flock


def _migrate_flat_deletes(deletes_path: str) -> None:
    """One-shot migration of legacy flat root-level delete files
    (``segment`` as a data column) into per-segment hive sidecars.

    Runs before the first sidecar publish on a legacy index so the two
    layouts never coexist long-term.  Crash-safe ordering: sidecar
    files are written and renamed in FIRST, flat files removed LAST —
    a crash in between leaves a mixed layout that the readers union
    (np.unique absorbs the duplication), never lost tombstones."""
    from ..operators.bm25 import _flat_delete_files

    flat = _flat_delete_files(deletes_path)
    if not flat:
        return
    import pyarrow as pa
    import pyarrow.dataset as ds
    import pyarrow.parquet as pq

    tbl = ds.dataset(flat, format="parquet").to_table(
        columns=["segment", "doc_id"]
    )
    segs = tbl.column("segment").to_numpy(zero_copy_only=False)
    ids = tbl.column("doc_id").to_numpy(zero_copy_only=False)
    for s in np.unique(segs):
        seg_dir = os.path.join(deletes_path, f"segment={int(s)}")
        os.makedirs(seg_dir, exist_ok=True)
        tmp = os.path.join(seg_dir, ".migrated-flat.parquet.tmp")
        pq.write_table(pa.table({"doc_id": np.unique(ids[segs == s])}), tmp)
        os.rename(tmp, os.path.join(seg_dir, "migrated-flat.parquet"))
    for fn in flat:
        with contextlib.suppress(FileNotFoundError):
            os.unlink(fn)


def _publish_tombstones(staging: str, deletes_path: str, id_base: int) -> None:
    """Move staged tombstone files into ``deletes/segment=K/`` sidecars.

    Runs ONLY after the replacement postings/doclens/termdict appends
    succeeded, so every crash state still serves the old doc (worst
    case: old+new both live until the upsert is retried — duplication,
    never loss).  Per-file rename is atomic on one filesystem; names
    carry id_base so retried upserts never collide.  Legacy flat-layout
    delete files are migrated into sidecars first (ADVICE r3: a mixed
    layout must never silently drop flat-era tombstones)."""
    _migrate_flat_deletes(deletes_path)
    for entry in sorted(os.listdir(staging)):
        src_dir = os.path.join(staging, entry)
        if not (entry.startswith("segment=") and os.path.isdir(src_dir)):
            continue
        dst_dir = os.path.join(deletes_path, entry)
        os.makedirs(dst_dir, exist_ok=True)
        for i, fn in enumerate(sorted(os.listdir(src_dir))):
            if not fn.endswith(".parquet"):
                continue
            os.rename(
                os.path.join(src_dir, fn),
                os.path.join(dst_dir, f"ext-{id_base}-{i:04d}.parquet"),
            )
    import shutil

    shutil.rmtree(staging, ignore_errors=True)


def extend_index(
    spark: SparkSession,
    index_dir: str,
    new_pages: DataFrame,
    mode: str = "create",
    validation="default",
) -> dict:
    """See _extend_index_locked; runs under the single-writer
    maintenance lock."""
    with _maintenance_lock(index_dir):
        return _extend_index_locked(
            spark, index_dir, new_pages, mode=mode, validation=validation
        )


def _extend_index_locked(
    spark: SparkSession,
    index_dir: str,
    new_pages: DataFrame,
    mode: str = "create",
    validation="default",
) -> dict:
    """Append a crawl batch to a published index.

    mode="create": only urls NOT already live are added (left_anti
    against live doclens — the reference's ``create``-op semantics).
    mode="upsert": re-crawled urls REPLACE their old doc — the old
    doc_id is tombstoned (query-time delete) and the new content is
    indexed under a fresh id; unseen urls are plain inserts
    (``upsert``-op semantics).

    New doc ids start at the next SEGMENT boundary after the current
    max id, so no (term, segment) key ever holds more than one postings
    row and every existing blob stays byte-identical.
    """
    if mode not in ("create", "upsert"):
        raise ValueError(f"unknown extend mode {mode!r}")
    manifest = _load_manifest(index_dir)
    params = manifest["params"]
    g = manifest["globals"]
    dpp = int(g["docs_per_part"])
    seg_group = int(params["seg_group"])
    n_term_buckets = int(params["n_term_buckets"])

    doclens_path = os.path.join(index_dir, "doclens")
    deletes_path = os.path.join(index_dir, "deletes")
    existing = spark.read.parquet(doclens_path)
    max_id = existing.agg(F.max("doc_id")).collect()[0][0]
    # New ids must start at the next SEGMENT boundary, not merely the next
    # part boundary: segment = (doc_id // dpp) // seg_group, and every
    # query-side scorer assumes at most ONE postings row per (term,
    # segment) — an append sharing a segment with existing rows would be
    # silently clobbered in the postings[term] dict at query time.
    if max_id is None:
        id_base = 0
    else:
        next_seg = (max_id // dpp) // seg_group + 1
        id_base = next_seg * seg_group * dpp

    # live = doclens minus already-tombstoned rows (ids are never reused,
    # so max_id still ranges over ALL rows)
    if os.path.isdir(deletes_path):
        dead_ids = spark.read.parquet(deletes_path).select("doc_id").distinct()
        live = existing.join(F.broadcast(dead_ids), "doc_id", "left_anti")
    else:
        live = existing

    facet_fields = tuple(params.get("facet_fields", ib.DEFAULT_FACET_FIELDS))
    stored_fields = tuple(params.get("stored_fields", ()))
    meta_cols = tuple(dict.fromkeys(facet_fields + stored_fields))
    normalized = ib.normalize_pages(
        new_pages, params.get("lang_filter"), meta_cols=meta_cols
    )
    n_killed, killed_tokens = 0, 0
    tombstone_staging = None
    if mode == "create":
        fresh = normalized.join(live.select("url"), "url", "left_anti")
    else:  # upsert: every normalized row is (re)indexed; old docs die
        fresh = normalized
        to_kill = live.join(
            normalized.select("url").distinct(), "url", "left_semi"
        ).select("doc_id", "doc_len")
        to_kill.persist()
        try:
            krow = to_kill.agg(
                F.count("*").alias("n"), F.sum("doc_len").alias("tok")
            ).collect()[0]
            n_killed = int(krow["n"])
            killed_tokens = int(krow["tok"] or 0)
            if n_killed:
                # STAGE tombstones now, PUBLISH them only after the
                # replacement postings/doclens/termdict are durable —
                # publishing first would leave the old docs dead with no
                # replacement if we crash in between (searchers read
                # deletes/ unconditionally).  Hive-partitioned by
                # segment so each scoring task can read ITS sidecar.
                tombstone_staging = os.path.join(
                    index_dir, "stages", f"deletes_ext_{id_base}"
                )
                (
                    to_kill.select(
                        "doc_id",
                        _segment_col(F.col("doc_id"), dpp, seg_group).alias(
                            "segment"
                        ),
                    )
                    .coalesce(1)
                    .write.mode("overwrite")
                    .partitionBy("segment")
                    .parquet(tombstone_staging)
                )
        finally:
            to_kill.unpersist()

    docs = ib.docs_with_ids(fresh, meta_cols=meta_cols).withColumn(
        "doc_id", F.col("doc_id") + F.lit(id_base)
    )
    docs_path = os.path.join(index_dir, "stages", f"docs_ext_{id_base}")
    docs.write.mode("overwrite").parquet(docs_path)
    spark.catalog.clearCache()  # free assign_dense_ids' persist
    docs = spark.read.parquet(docs_path)
    new_stats = ib.corpus_stats(docs)
    if new_stats["n_docs"] == 0 and n_killed == 0:
        return manifest
    # pre-append validation gate on the BATCH (same thresholds/typed
    # errors as the build's pre-publish gate): a corrupted crawl batch
    # fails here, before any postings/doclens append or tombstone
    # publish — the live index is untouched.
    batch_validation = None
    if validation is not None and new_stats["n_docs"]:
        from .validate import ValidationThresholds, validate_globals

        thr = (
            ValidationThresholds() if validation == "default" else validation
        )
        batch_validation = validate_globals(new_stats, thr)

    if new_stats["n_docs"]:
        partials = ib.build_partials(
            docs, dpp, seg_group,
            with_positions=params.get("with_positions", True),
            facet_fields=facet_fields,
            dlen_buckets=params.get("dlen_buckets", False),
        )
        merged = ib.merge_partials(partials).withColumn(
            "term_bucket",
            F.crc32(F.col("term").cast("binary")) % F.lit(n_term_buckets),
        )
        merged.persist()
        try:
            # new segments append as extra files per bucket (ES: more
            # segments; compact_index is the forcemerge that folds them in)
            merged.write.mode("append").partitionBy("term_bucket").parquet(
                os.path.join(index_dir, "postings")
            )
            stored = [c for c in stored_fields if c in docs.columns]
            docs.select("doc_id", "url", "doc_len", *stored).write.mode(
                "append"
            ).parquet(doclens_path)
            # incremental: fold ONLY the new batch into the termdict —
            # O(batch + termdict), never O(full postings)
            _update_termdict(spark, index_dir, merged)
        finally:
            merged.unpersist()

    if tombstone_staging is not None:
        _publish_tombstones(tombstone_staging, deletes_path, id_base)
        manifest["deletes_epoch"] = int(manifest.get("deletes_epoch", 0)) + 1

    g["n_docs"] += new_stats["n_docs"] - n_killed
    g["total_tokens"] += new_stats["total_tokens"] - killed_tokens
    g["avgdl"] = g["total_tokens"] / g["n_docs"] if g["n_docs"] else 0.0
    manifest["globals"] = g
    n_tombstones = (
        int(spark.read.parquet(deletes_path).count())
        if os.path.isdir(deletes_path)
        else 0
    )
    manifest["metrics"] = {
        "docs_indexed": g["n_docs"],
        "n_tombstones": n_tombstones,
        **_postings_metrics(spark.read.parquet(os.path.join(index_dir, "postings"))),
    }
    manifest.setdefault("extensions", []).append(
        {
            "id_base": id_base,
            "mode": mode,
            "docs_added": new_stats["n_docs"],
            "docs_tombstoned": n_killed,
            "validation": batch_validation,
        }
    )
    _save_manifest(index_dir, manifest)
    return manifest


def upsert_index(spark: SparkSession, index_dir: str, new_pages: DataFrame) -> dict:
    """Re-crawl ingestion: tombstone + replace existing urls, insert new
    ones (the reference's ES ``upsert`` write op)."""
    return extend_index(spark, index_dir, new_pages, mode="upsert")


def update_facet_field(
    spark: SparkSession, index_dir: str, field: str, updates: DataFrame
) -> dict:
    """See _update_facet_field_locked; runs under the single-writer
    maintenance lock."""
    with _maintenance_lock(index_dir):
        return _update_facet_field_locked(spark, index_dir, field, updates)


def _update_facet_field_locked(
    spark: SparkSession, index_dir: str, field: str, updates: DataFrame
) -> dict:
    """Partial-document ``update``: re-tag ONE metadata facet field for
    a batch of urls WITHOUT re-tokenizing or re-indexing their text —
    the reference's ES ``update`` write op (merge fields into an
    existing doc, hail_scripts/shared/elasticsearch_utils.py:11-17,
    hail_scripts/v02/utils/elasticsearch_client.py:106-113), which
    ``upsert_index`` (whole-doc replace) previously over-served.

    ``updates``: DataFrame(url, new_value).  Mechanics: the updated
    docs are removed from EVERY existing facet term of the field and
    inserted into their new value's facet token (tf=1, dl=doc_len,
    position = doc_len + the field's facet slot — exactly what a fresh
    build of the re-tagged corpus emits).  Only the parquet buckets
    holding the field's facet terms are rewritten; document text,
    doc ids, doc lengths, n_docs and avgdl are untouched, so every
    BM25 score is bit-identical — only facet filtering changes.

    Scale posture: cost is O(field's facet postings in affected
    buckets), never a corpus re-tokenize or full-index rewrite.  The
    update batch itself is collected (it is the operator's input, the
    same driver-side scale as the upsert kill-list aggregation).

    Crash window: bucket swaps are individually atomic but a crash
    between two bucket swaps can leave a doc removed from its old
    facet token (bucket A swapped) before it appears in the new one
    (bucket B pending) — it temporarily matches NEITHER facet value.
    BM25 scores and document retrievability are unaffected (facet
    tokens only filter), and re-running the same update converges."""
    manifest = _load_manifest(index_dir)
    params, g = manifest["params"], manifest["globals"]
    dpp, seg_group = int(g["docs_per_part"]), int(params["seg_group"])
    n_term_buckets = int(params["n_term_buckets"])
    facet_fields = [
        f
        for f in params.get("facet_fields", ib.DEFAULT_FACET_FIELDS)
        if f is not None
    ]
    if field not in facet_fields:
        raise ValueError(
            f"{field!r} is not a facet field of this index ({facet_fields})"
        )
    facet_slot = facet_fields.index(field)
    with_positions = bool(params.get("with_positions", True))
    postings_path = os.path.join(index_dir, "postings")
    doclens_path = os.path.join(index_dir, "doclens")

    # resolve urls → (doc_id, doc_len, new token); ignore unknown urls
    doclens = spark.read.parquet(doclens_path)
    resolved = (
        doclens.join(updates.select("url", "new_value"), "url")
        .select("doc_id", "doc_len", "new_value")
        .collect()
    )
    if not resolved:
        return manifest
    by_doc = {
        int(r["doc_id"]): (int(r["doc_len"]), ib.facet_token(field, r["new_value"]))
        for r in resolved
    }
    seg_of = lambda d: (d // dpp) // seg_group  # noqa: E731
    removals: dict[int, np.ndarray] = {}
    inserts: dict[tuple[str, int], list[tuple[int, int]]] = {}
    for d, (dl, tok) in by_doc.items():
        s = seg_of(d)
        removals.setdefault(s, []).append(d)  # type: ignore[arg-type]
        inserts.setdefault((tok, s), []).append((d, dl))
    removals = {s: np.unique(np.asarray(v, np.int64)) for s, v in removals.items()}

    # every facet term of the field currently in the index + new tokens
    prefix = f"__{field}_"
    td_path = os.path.join(index_dir, "termdict")
    td = spark.read.parquet(td_path)
    existing_terms = {
        r["term"]
        for r in td.filter(
            F.col("term").startswith(prefix) & F.col("term").endswith("__")
        )
        .select("term")
        .collect()
    }
    all_terms = sorted(existing_terms | {tok for tok, _ in inserts})
    buckets = sorted({ib.term_bucket(t, n_term_buckets) for t in all_terms})
    term_set = set(all_terms)
    cols = [f.name for f in ib.POSTINGS_SCHEMA.fields]

    def _encode_row(term, seg, d, tf, dl, pos):
        # replicate the BUILD's byte layout exactly: the build encodes
        # per (term, part) and concat-merges, so blocks restart at part
        # boundaries — encoding the same way keeps an updated row
        # BYTE-identical to a fresh build of the re-tagged corpus
        # (tested), not merely decode-identical.
        cuts = np.flatnonzero(np.diff(d // dpp)) + 1
        bounds = np.concatenate(([0], cuts, [len(d)]))
        offs = np.concatenate(([0], np.cumsum(tf)))
        pieces, pos_pieces, mins = [], [], []
        for lo, hi in zip(bounds[:-1], bounds[1:]):
            pieces.append(
                codecs.encode_postings(d[lo:hi], tf[lo:hi], dls=dl[lo:hi])
            )
            bstarts = np.arange(0, hi - lo, codecs.BLOCK_SIZE)
            mins.append(np.minimum.reduceat(dl[lo:hi], bstarts))
            if with_positions:
                pos_pieces.append(
                    codecs.encode_position_lists(
                        pos[offs[lo] : offs[hi]], tf[lo:hi]
                    )
                )
        blob, blast, bmaxtf, boff = codecs.merge_encoded(pieces)
        bmin_dl = np.concatenate(mins)
        pos_blob = codecs.merge_streams(pos_pieces) if with_positions else b""
        return (
            term, int(seg), int(d[0]), int(len(d)), int(tf.sum()), blob,
            blast.tolist(), bmaxtf.tolist(), bmin_dl.tolist(), boff.tolist(),
            pos_blob, len(blob) + len(pos_blob),
        )

    def rewrite(batches):
        for pdf in batches:
            if pdf.empty:
                continue
            rows = []
            for r in pdf.itertuples():
                term, seg = r.term, int(r.segment)
                dead = removals.get(seg)
                if term not in term_set or dead is None:
                    rows.append(
                        (
                            term, seg, int(r.min_doc), int(r.df), int(r.cf),
                            bytes(r.blob), list(r.block_last),
                            list(r.block_max_tf), list(r.block_min_dl),
                            list(r.block_off), bytes(r.pos_blob), int(r.n_bytes),
                        )
                    )
                    continue
                d, tf, dl = codecs.decode_postings(bytes(r.blob))
                keep = ~np.isin(d, dead, assume_unique=True)
                d2, tf2, dl2 = d[keep], tf[keep], dl[keep]
                pos2 = offs2 = None
                if with_positions:
                    pos, offs = codecs.decode_position_lists(bytes(r.pos_blob), tf)
                    ki = np.flatnonzero(keep)
                    sl = [pos[offs[i] : offs[i + 1]] for i in ki]
                    pos2 = (
                        np.concatenate(sl) if sl else np.array([], np.int64)
                    )
                ins = inserts.get((term, seg))
                if ins:
                    add_d = np.array(sorted(x[0] for x in ins), np.int64)
                    add_dl = np.array(
                        [by_doc[int(x)][0] for x in add_d], np.int64
                    )
                    where = np.searchsorted(d2, add_d)
                    d2 = np.insert(d2, where, add_d)
                    tf2 = np.insert(tf2, where, 1)
                    dl2 = np.insert(dl2, where, add_dl)
                    if with_positions:
                        # splice each new doc's single facet position
                        # (doc_len + slot) into the flat stream at its
                        # post-insertion row offset
                        pos2 = _splice_positions(
                            pos2, tf2, where, add_dl + facet_slot
                        )
                if len(d2) == 0:
                    continue
                rows.append(_encode_row(term, seg, d2, tf2, dl2, pos2))
            yield pd.DataFrame(rows, columns=cols)

    # existing (term, segment) rows are discovered by the scan itself;
    # rows that need CREATING (new facet value in a segment with no row
    # yet) are found by diffing against this pruned listing
    pruned = spark.read.parquet(postings_path).filter(
        F.col("term_bucket").isin(buckets)
    )
    have = {
        (r["term"], int(r["segment"]))
        for r in pruned.filter(F.col("term").isin(all_terms))
        .select("term", "segment")
        .collect()
    }
    rewritten = pruned.drop("term_bucket").select(*cols).mapInPandas(
        rewrite, schema=ib.POSTINGS_SCHEMA
    )
    new_rows = []
    for (tok, seg), ins in inserts.items():
        if (tok, seg) in have:
            continue
        add_d = np.array(sorted(x[0] for x in ins), np.int64)
        add_dl = np.array([by_doc[int(x)][0] for x in add_d], np.int64)
        pos = (add_dl + facet_slot) if with_positions else None
        new_rows.append(
            _encode_row(tok, seg, add_d, np.ones(len(add_d), np.int64), add_dl, pos)
        )
    if new_rows:
        rewritten = rewritten.unionByName(
            spark.createDataFrame(
                pd.DataFrame(new_rows, columns=cols), schema=ib.POSTINGS_SCHEMA
            )
        )

    staging = postings_path + "__updating"
    (
        rewritten.withColumn(
            "term_bucket",
            F.crc32(F.col("term").cast("binary")) % F.lit(n_term_buckets),
        )
        .repartitionByRange(max(len(buckets), 1), "term_bucket", "term", "segment")
        .sortWithinPartitions("term_bucket", "term", "segment")
        .write.mode("overwrite")
        .partitionBy("term_bucket")
        .parquet(staging)
    )
    # swap ONLY the affected bucket directories (a bucket missing from
    # staging means the rewrite emptied it entirely — remove it)
    import shutil

    for b in buckets:
        src = os.path.join(staging, f"term_bucket={b}")
        dst = os.path.join(postings_path, f"term_bucket={b}")
        if os.path.isdir(src):
            _swap_dir(src, dst)
        else:
            shutil.rmtree(dst, ignore_errors=True)
    shutil.rmtree(staging, ignore_errors=True)

    # termdict: replace the affected terms' rows with recomputed stats
    new_td = (
        spark.read.parquet(postings_path)
        .filter(F.col("term_bucket").isin(buckets) & F.col("term").isin(all_terms))
        .groupBy("term_bucket", "term")
        .agg(
            F.sum("df").alias("df"),
            F.sum("cf").alias("cf"),
            F.count("*").alias("n_rows"),
        )
    )
    combined = td.filter(~F.col("term").isin(all_terms)).unionByName(new_td)
    td_staging = td_path + "__staging"
    (
        combined.repartition("term_bucket")
        .sortWithinPartitions("term")
        .write.mode("overwrite")
        .partitionBy("term_bucket")
        .parquet(td_staging)
    )
    _swap_dir(td_staging, td_path)

    # stored-field refresh (only when the field rides doclens)
    if field in doclens.columns:
        orig_cols = doclens.columns
        upd = updates.select("url", F.col("new_value").alias("__new__"))
        dl_new = (
            doclens.join(F.broadcast(upd), "url", "left")
            .withColumn(field, F.coalesce(F.col("__new__"), F.col(field)))
            .select(*orig_cols)
        )
        dl_staging = doclens_path + "__updating"
        dl_new.write.mode("overwrite").parquet(dl_staging)
        _swap_dir(dl_staging, doclens_path)

    manifest.setdefault("updates", []).append(
        {"field": field, "docs_updated": len(by_doc)}
    )
    _save_manifest(index_dir, manifest)
    return manifest


def _splice_positions(
    pos2: np.ndarray,
    tf_after: np.ndarray,
    where: np.ndarray,
    new_positions: np.ndarray,
) -> np.ndarray:
    """Insert one position per new doc into the flat positions stream.

    ``tf_after`` is the per-doc tf AFTER doc insertion (new docs have
    tf=1), ``where`` the sorted insertion indices into the
    pre-insertion doc array (np.insert semantics), ``new_positions``
    the single position of each inserted doc (same order)."""
    offs_after = np.concatenate(([0], np.cumsum(tf_after)))
    rows_after = where + np.arange(len(where))
    # row r starts at offs_after[r] post-insertion; np.insert wants
    # indices into the PRE-insertion flat array, so subtract the count
    # of earlier single-element insertions
    pre_idx = offs_after[rows_after] - np.arange(len(rows_after))
    return np.insert(pos2, pre_idx, new_positions)


def _strip_tombstones(
    postings: DataFrame, deleted_by_seg: dict[int, np.ndarray]
) -> DataFrame:
    """Rewrite posting rows with tombstoned docs physically removed
    (blob re-encoded, df/cf/min_doc/block index recomputed; rows left
    empty are dropped).  mapInPandas — no shuffle, each file rewritten
    in place of its scan task."""
    cols = [f.name for f in ib.POSTINGS_SCHEMA.fields]

    def strip(batches):
        for pdf in batches:
            if pdf.empty:
                continue
            rows = []
            for r in pdf.itertuples():
                dead = deleted_by_seg.get(int(r.segment))
                blob = bytes(r.blob)
                pos_blob = bytes(r.pos_blob)
                if dead is None or dead.size == 0:
                    rows.append(
                        (
                            r.term, int(r.segment), int(r.min_doc), int(r.df),
                            int(r.cf), blob, list(r.block_last),
                            list(r.block_max_tf), list(r.block_min_dl),
                            list(r.block_off), pos_blob, int(r.n_bytes),
                        )
                    )
                    continue
                d, tf, dl = codecs.decode_postings(blob)
                keep = ~np.isin(d, dead, assume_unique=True)
                if keep.all():
                    rows.append(
                        (
                            r.term, int(r.segment), int(r.min_doc), int(r.df),
                            int(r.cf), blob, list(r.block_last),
                            list(r.block_max_tf), list(r.block_min_dl),
                            list(r.block_off), pos_blob, int(r.n_bytes),
                        )
                    )
                    continue
                if not keep.any():
                    continue
                d2, tf2, dl2 = d[keep], tf[keep], dl[keep]
                nblob, blast, bmaxtf, boff = codecs.encode_postings(
                    d2, tf2, dls=dl2
                )
                starts = np.arange(0, len(d2), codecs.BLOCK_SIZE)
                bmin_dl = np.minimum.reduceat(dl2, starts)
                if pos_blob:
                    pos, offs = codecs.decode_position_lists(pos_blob, tf)
                    kept_idx = np.flatnonzero(keep)
                    slices = [pos[offs[i] : offs[i + 1]] for i in kept_idx]
                    newpos = (
                        np.concatenate(slices)
                        if slices
                        else np.array([], dtype=np.int64)
                    )
                    pos_blob = codecs.encode_position_lists(newpos, tf2)
                rows.append(
                    (
                        r.term, int(r.segment), int(d2[0]), int(len(d2)),
                        int(tf2.sum()), nblob, blast.tolist(), bmaxtf.tolist(),
                        bmin_dl.tolist(), boff.tolist(), pos_blob,
                        len(nblob) + len(pos_blob),
                    )
                )
            yield pd.DataFrame(rows, columns=cols)

    return postings.select(*cols).mapInPandas(strip, schema=ib.POSTINGS_SCHEMA)


def compact_index(spark: SparkSession, index_dir: str, factor: int = 2) -> dict:
    """See _compact_index_locked; runs under the single-writer
    maintenance lock."""
    with _maintenance_lock(index_dir):
        return _compact_index_locked(spark, index_dir, factor)


def _compact_index_locked(spark: SparkSession, index_dir: str, factor: int = 2) -> dict:
    """Forcemerge analog: physically drop tombstoned postings, then
    coarsen segments by ``factor``.  segment' = segment // factor remains
    a pure function of doc_id, so a doc's postings for every term still
    land in exactly ONE query task and per-term rows stay disjoint
    ascending → concat-merge applies.  After compaction df/cf are exact
    again and the deletes set is empty."""
    manifest = _load_manifest(index_dir)
    postings_path = os.path.join(index_dir, "postings")
    deletes_path = os.path.join(index_dir, "deletes")
    doclens_path = os.path.join(index_dir, "doclens")
    deleted_by_seg = load_deletes(index_dir)
    n_stripped = int(sum(v.size for v in deleted_by_seg.values()))

    postings = spark.read.parquet(postings_path)
    if deleted_by_seg:
        postings = _strip_tombstones(postings, deleted_by_seg)
    remapped = postings.withColumn(
        "segment", (F.col("segment") / F.lit(factor)).cast("int")
    ).drop("n_bytes", "term_bucket")
    merged = ib.merge_partials(remapped).withColumn(
        "term_bucket",
        F.crc32(F.col("term").cast("binary"))
        % F.lit(manifest["params"]["n_term_buckets"]),
    )
    n_out = max(
        spark.sparkContext.defaultParallelism, manifest["params"]["n_term_buckets"]
    )
    staging = postings_path + "__compacting"
    (
        merged.repartitionByRange(n_out, "term_bucket", "term", "segment")
        .sortWithinPartitions("term_bucket", "term", "segment")
        .write.mode("overwrite")
        .partitionBy("term_bucket")
        .parquet(staging)
    )
    _swap_dir(staging, postings_path)

    if deleted_by_seg:
        # doclens: physically drop tombstoned rows (broadcast anti-join —
        # tombstones are a small fraction by construction), then retire
        # the tombstones themselves
        dead_df = spark.read.parquet(deletes_path).select("doc_id").distinct()
        doclens = spark.read.parquet(doclens_path)
        live = doclens.join(F.broadcast(dead_df), "doc_id", "left_anti")
        dl_staging = doclens_path + "__compacting"
        live.write.mode("overwrite").parquet(dl_staging)
        _swap_dir(dl_staging, doclens_path)
        import shutil

        shutil.rmtree(deletes_path, ignore_errors=True)
        manifest["deletes_epoch"] = int(manifest.get("deletes_epoch", 0)) + 1

    _write_termdict(spark, index_dir)
    manifest["metrics"] = {
        "docs_indexed": manifest["globals"]["n_docs"],
        "n_tombstones": 0,
        **_postings_metrics(spark.read.parquet(postings_path)),
    }
    manifest.setdefault("compactions", []).append(
        {"factor": factor, "tombstones_dropped": n_stripped}
    )
    _save_manifest(index_dir, manifest)
    return manifest
