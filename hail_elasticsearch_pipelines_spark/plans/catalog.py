"""Named index catalog + blue/green reindex — the reference's index
LIFECYCLE re-expressed.

The reference rotates whole Elasticsearch indexes: every load builds a
fresh datestamped index (``get_es_index_name``,
sv_pipeline/utils/common.py:63-76), creates it explicitly
(elasticsearch_client_v7.py:49-107), routes it to loading nodes during
the bulk write and to serving nodes after
(elasticsearch_client_v7.py:109-131), and seqr is pointed at the new
name once complete — the old index keeps serving until the flip.  The
analog here: a tiny file-backed catalog mapping a stable NAME to the
current index directory, updated with one atomic replace, plus
``reindex_swap`` which builds a brand-new generation directory and
flips the name — readers that resolved the old directory keep their
pinned snapshot (generation-pointer semantics one level up).

Scale posture: catalog entries are O(1) metadata files; a swap costs
one small-file replace no matter how large the index.  Old index dirs
are retained for the caller to GC after its serving fleet has reloaded
(the same grace-period discipline as layout.gc_stale_dirs).
"""

from __future__ import annotations

import json
import os
import re
import shutil

_NAME_RE = re.compile(r"^[a-z0-9][a-z0-9_-]*$")


class UnknownIndexError(KeyError):
    pass


class IndexCatalog:
    """Directory of ``<name>.json`` pointer files; each maps a stable
    index name to its current index directory and keeps the swap
    history (the datestamped-name audit trail the reference embeds in
    index names)."""

    def __init__(self, root: str):
        self.root = root
        os.makedirs(root, exist_ok=True)

    def _path(self, name: str) -> str:
        if not _NAME_RE.match(name):
            raise ValueError(f"bad index name {name!r}")
        return os.path.join(self.root, f"{name}.json")

    def _read(self, name: str) -> dict:
        try:
            with open(self._path(name)) as f:
                return json.load(f)
        except FileNotFoundError:
            raise UnknownIndexError(name) from None

    def _write_atomic(self, name: str, entry: dict) -> None:
        p = self._path(name)
        tmp = f"{p}.tmp.{os.getpid()}"
        with open(tmp, "w") as f:
            json.dump(entry, f, indent=2)
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, p)

    def register(self, name: str, index_dir: str) -> None:
        """Point ``name`` at an existing published index directory."""
        if not os.path.exists(os.path.join(index_dir, "manifest.json")):
            raise FileNotFoundError(
                f"{index_dir} has no manifest.json — not a published index"
            )
        self._write_atomic(
            name, {"index_dir": os.path.abspath(index_dir), "history": []}
        )

    def resolve(self, name: str) -> str:
        """Current index directory for ``name``."""
        return self._read(name)["index_dir"]

    def swap(self, name: str, new_dir: str) -> str:
        """Atomically repoint ``name`` → ``new_dir``; returns the OLD
        directory (still intact — callers GC it after their searchers
        reload, never at swap time).  The read-modify-write runs under
        a kernel flock so concurrent swappers serialize instead of
        losing a history entry (same discipline as the maintenance
        single-writer lock)."""
        import fcntl

        if not os.path.exists(os.path.join(new_dir, "manifest.json")):
            raise FileNotFoundError(
                f"{new_dir} has no manifest.json — not a published index"
            )
        lock_path = os.path.join(self.root, ".catalog.lock")
        with open(lock_path, "w") as lock:
            fcntl.flock(lock, fcntl.LOCK_EX)
            entry = self._read(name)
            old = entry["index_dir"]
            entry["history"] = (entry.get("history") or []) + [old]
            entry["index_dir"] = os.path.abspath(new_dir)
            self._write_atomic(name, entry)
        return old

    def list_indexes(self) -> dict[str, str]:
        out = {}
        for fn in sorted(os.listdir(self.root)):
            if fn.endswith(".json"):
                with open(os.path.join(self.root, fn)) as f:
                    out[fn[: -len(".json")]] = json.load(f)["index_dir"]
        return out

    def drop(self, name: str, delete_files: bool = False) -> None:
        """Forget ``name``; with ``delete_files`` also remove its
        current directory (the reference's delete-index cleanup,
        hail_scripts/shared/elasticsearch_client_v7.py es.indices
        lifecycle)."""
        entry = self._read(name)
        os.unlink(self._path(name))
        if delete_files:
            shutil.rmtree(entry["index_dir"], ignore_errors=True)

    def reserve_build_dir(self, name: str, root: str) -> str:
        """Pick and RESERVE a fresh build directory for a reindex of
        ``name`` — the whole selection runs under the catalog lock and
        ends with an atomic mkdir, so two concurrent reindexes can
        never pick the same dir (ADVICE r5: rev = len(history)+1 chosen
        outside the lock let them clobber each other's build).  A dir
        equal to the CURRENT pointer or any history entry is never
        reused either, even when a manual ``register`` reset the
        history — pinned searchers may still reference those paths."""
        import fcntl

        os.makedirs(root, exist_ok=True)
        lock_path = os.path.join(self.root, ".catalog.lock")
        with open(lock_path, "w") as lock:
            fcntl.flock(lock, fcntl.LOCK_EX)
            try:
                entry = self._read(name)
                taken = {
                    os.path.abspath(p)
                    for p in [entry["index_dir"], *(entry.get("history") or [])]
                }
                rev = len(entry.get("history") or []) + 1
            except UnknownIndexError:
                taken, rev = set(), 0
            while True:
                dest = os.path.join(root, f"{name}-r{rev}")
                if os.path.abspath(dest) not in taken and not os.path.exists(
                    dest
                ):
                    os.makedirs(dest)  # atomic reservation
                    return dest
                rev += 1

    def open_local(self, name: str):
        """LocalSearcher over the name's CURRENT directory (pinned —
        a later swap does not move it; construct again to follow)."""
        from ..operators.serve import LocalSearcher

        return LocalSearcher(self.resolve(name))

    def open_searcher(self, spark, name: str):
        """IndexSearcher over the name's CURRENT directory (pinned)."""
        from ..operators.bm25 import IndexSearcher

        return IndexSearcher(spark, self.resolve(name))


def reindex_swap(
    spark,
    catalog: IndexCatalog,
    name: str,
    pages,
    indexes_root: str | None = None,
    **build_opts,
) -> dict:
    """Blue/green full reindex: build a brand-new index generation in a
    fresh directory (``<root>/<name>-r<N>``), then flip the catalog
    name to it — the reference's build-new-datestamped-index +
    repoint-seqr flow.  The old directory stays on disk for pinned
    searchers; the caller GC's it after its fleet reloads.  Returns the
    new index's manifest (with ``index_dir``/``previous_dir`` added).

    First-time names (nothing registered yet) are allowed — the build
    registers instead of swapping.

    Concurrency: the destination dir is reserved atomically under the
    catalog lock (``reserve_build_dir``) before the build starts, and
    nothing is ever deleted here — a dir matching the current pointer
    or a history entry is skipped, never rmtree'd (ADVICE r5).  A
    crashed build leaves only its own reserved dir behind; since it is
    neither current nor history, the caller's GC may remove it."""
    from ..operators.index_build import build_index

    root = indexes_root or os.path.join(catalog.root, "indexes")
    dest = catalog.reserve_build_dir(name, root)
    manifest = build_index(spark, pages, dest, **build_opts)
    try:
        prev = catalog.swap(name, dest)
    except UnknownIndexError:
        catalog.register(name, dest)
        prev = None
    manifest["index_dir"] = dest
    manifest["previous_dir"] = prev
    return manifest
