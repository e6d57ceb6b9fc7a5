"""Low-latency serving path over a published index — no Spark jobs.

The reference hands queries to Elasticsearch data nodes that read local
segment files.  The analog here: a searcher process reads ONLY the
query's term_bucket partition directories (hive pruning) and, within
them, the term's rows (parquet row-group min/max on the sorted `term`
column) via pyarrow — millisecond-scale for the lookup, then the SAME
numpy scoring kernels as the distributed path, so results are
bit-identical (tests/test_serve.py).

Scale posture: the distributed `IndexSearcher` is the 10^12-doc path
(per-segment scoring fans out across executors).  `LocalSearcher` is
the latency path for small/medium indexes and the per-shard inner loop
a real serving tier would run on each index node.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pyarrow.dataset as ds

from ..functions import codecs
from .bm25 import (
    _adl,
    _BlockCache,
    _eval_bool_blockmax,
    _mask_deleted,
    _phrase_match_counts,
    _score_intersection,
    _score_intersection_blockmax,
    _score_union_blockmax,
    _score_union_exhaustive,
    _score_union_maxscore,
    _topk,
    analyzed_fields_of,
    dv_filter_fields_of,
    expand_fielded_terms,
    field_avgdl_map,
    load_deletes,
)
from .index_build import bm25_idf, bm25_tf_weight, term_bucket


def _list_np(list_scalar, dtype) -> np.ndarray:
    """pyarrow ListScalar -> numpy without per-element Python objects."""
    return list_scalar.values.to_numpy(zero_copy_only=False).astype(dtype, copy=False)


class _CacheRow:
    """Adapter: one pyarrow table row → the attribute shape _BlockCache
    expects, with arrow-native list extraction (no per-element as_py)."""

    __slots__ = (
        "term", "segment", "df", "blob", "block_last", "block_off",
        "block_max_tf", "block_min_dl",
    )

    def __init__(self, tbl, i: int):
        self.term = tbl["term"][i].as_py()
        self.segment = tbl["segment"][i].as_py()
        self.df = tbl["df"][i].as_py()
        self.blob = tbl["blob"][i].as_py()
        self.block_last = _list_np(tbl["block_last"][i], np.int64)
        self.block_off = _list_np(tbl["block_off"][i], np.int32)
        # legacy rows may carry NULL score-bound lists — keep None so
        # _BlockCache omits bounds and the scorers take their explicit
        # exhaustive fallback instead of crashing the serving path
        bmt, bmd = tbl["block_max_tf"][i], tbl["block_min_dl"][i]
        self.block_max_tf = None if not bmt.is_valid else _list_np(bmt, np.int64)
        self.block_min_dl = None if not bmd.is_valid else _list_np(bmd, np.int64)

    def nbytes(self) -> int:
        n = len(self.blob) + self.block_last.nbytes + self.block_off.nbytes
        if self.block_max_tf is not None:
            n += self.block_max_tf.nbytes + self.block_min_dl.nbytes
        return n


def _put_unique(d: dict, key, value) -> None:
    """Insert enforcing the one-row-per-(term, segment) invariant."""
    if key in d:
        raise ValueError(
            f"corrupt index: multiple postings rows for term {key!r} in one "
            "segment (was the index extended with a misaligned id_base?)"
        )
    d[key] = value


class LocalSearcher:
    def __init__(self, index_dir: str):
        self.index_dir = index_dir
        self._load_snapshot()

    def _load_snapshot(self) -> None:
        """Pin to the CURRENT manifest generation (see
        IndexSearcher._load_snapshot): table paths resolve through the
        manifest's generation pointers once, deletes are read at the
        manifest's epoch, so a concurrent maintenance publish never
        changes what this searcher serves mid-query."""
        from ..layout import load_manifest, table_path

        self.manifest = load_manifest(self.index_dir)
        self.n_docs = self.manifest["globals"]["n_docs"]
        self.avgdl = self.manifest["globals"]["avgdl"]
        self.n_term_buckets = self.manifest["params"]["n_term_buckets"]
        self._postings = ds.dataset(
            table_path(self.index_dir, "postings", self.manifest),
            format="parquet",
            partitioning="hive",
        )
        td = table_path(self.index_dir, "termdict", self.manifest)
        self._termdict = (
            ds.dataset(td, format="parquet", partitioning="hive")
            if os.path.exists(td)
            else None
        )
        self._deletes = load_deletes(
            self.index_dir,
            epoch=int(self.manifest.get("deletes_epoch", 0)),
            manifest=self.manifest,
        )
        # bounded decoded-postings cache (the ES page/query-cache
        # analog): hot terms — stopwords above all — stop paying the
        # PFor decode on every query.  Keyed by (term, segment); valid
        # for this searcher's index snapshot.
        self._cache: dict[tuple[str, int], tuple] = {}
        self._cache_bytes = 0
        self._cache_cap = 256 * 1024 * 1024
        # block-level cache for the WAND path (keyed (segment) →
        # {(term, block_idx): decoded block}) and positions cache for
        # the phrase path — the p99 of both was dominated by re-decoding
        # hot stopword blocks / position lists on every query.
        self._bmw_cache: dict[int, dict] = {}
        self._bmw_cache_blocks = 0
        self._bmw_cache_max_blocks = 65536
        self._pos_cache: dict[tuple[str, int], tuple] = {}
        self._pos_cache_bytes = 0
        self._pos_cache_cap = 128 * 1024 * 1024
        # term-ROWS cache: term → {segment: _CacheRow} (undecoded blob +
        # block metadata).  The pyarrow dataset scan is the warm-path
        # floor (~20 ms per to_table on a 200k-doc index regardless of
        # OS page cache — row-group stat evaluation + parquet decode);
        # holding hot terms' rows on the heap removes it entirely, the
        # same move as ES/Lucene serving segments out of memory.  Valid
        # for this searcher's pinned snapshot; reload() drops it.
        self._rows_cache: dict[str, dict[int, _CacheRow]] = {}
        self._rows_cache_bytes = 0
        self._rows_cache_cap = 512 * 1024 * 1024
        # doc-values cache: field → (doc_id sorted asc, values aligned)
        # — the ES in-memory doc-values/fielddata analog.  One columnar
        # two-column doclens read per field, then every sort / range
        # filter / aggregation is a numpy lookup.  Pinned to this
        # snapshot; reload() drops it.
        self._doclens_path = table_path(self.index_dir, "doclens", self.manifest)
        self._nested_path = table_path(self.index_dir, "nested", self.manifest)
        self._dv_cache: dict[str, tuple[np.ndarray, np.ndarray]] = {}
        self._dv_array_fields: set[str] = set()
        self._dv_cache_bytes = 0
        self._dv_cache_cap = 256 * 1024 * 1024

    def reload(self) -> bool:
        """Advance a long-lived serving process to the latest published
        generation (the IndexSearcher.reload_manifest analog — the ES
        index-refresh the reference gets from the cluster,
        hail_scripts/shared/elasticsearch_client_v7.py:109-149).
        Re-reads the manifest; when anything changed (generation flip,
        deletes epoch bump, globals), rebuilds datasets/deletes and
        DROPS all four caches — they are keyed (term, segment) and
        only valid for one snapshot.  No-op (caches kept warm) when the
        manifest is unchanged.  Returns True iff a new snapshot was
        loaded."""
        from ..layout import load_manifest

        new = load_manifest(self.index_dir)
        if new == self.manifest:
            return False
        self._load_snapshot()
        return True

    def _bmw_blocks_for(self, seg: int) -> dict:
        if self._bmw_cache_blocks >= self._bmw_cache_max_blocks:
            self._bmw_cache.clear()
            self._bmw_cache_blocks = 0
        return self._bmw_cache.setdefault(int(seg), {})

    def _pos_cached(self, term: str, seg: int, pos_blob, tf: np.ndarray) -> tuple:
        key = (term, int(seg))
        hit = self._pos_cache.get(key)
        if hit is not None:
            return hit
        out = codecs.decode_position_lists(
            pos_blob.as_py() if hasattr(pos_blob, "as_py") else pos_blob, tf
        )
        sz = sum(a.nbytes for a in out if a is not None)
        while self._pos_cache and self._pos_cache_bytes + sz > self._pos_cache_cap:
            old = self._pos_cache.pop(next(iter(self._pos_cache)))
            self._pos_cache_bytes -= sum(a.nbytes for a in old if a is not None)
        self._pos_cache[key] = out
        self._pos_cache_bytes += sz
        return out

    def _cache_put(self, term: str, seg: int, out: tuple) -> None:
        key = (term, seg)
        if key in self._cache:
            return
        sz = sum(a.nbytes for a in out if a is not None)
        while self._cache and self._cache_bytes + sz > self._cache_cap:
            old = self._cache.pop(next(iter(self._cache)))  # FIFO eviction
            self._cache_bytes -= sum(a.nbytes for a in old if a is not None)
        self._cache[key] = out
        self._cache_bytes += sz

    def _decode_cached(self, term: str, seg: int, blob) -> tuple:
        hit = self._cache.get((term, seg))
        if hit is not None:
            return hit
        out = codecs.decode_postings(blob.as_py() if hasattr(blob, "as_py") else blob)
        self._cache_put(term, seg, out)
        return out

    def _bucket_filter(self, terms: list[str]):
        buckets = sorted({term_bucket(t, self.n_term_buckets) for t in terms})
        return ds.field("term_bucket").isin(buckets) & ds.field("term").isin(terms)

    def global_dfs(self, terms: list[str]) -> dict[str, int]:
        src = self._termdict if self._termdict is not None else self._postings
        tbl = src.to_table(filter=self._bucket_filter(terms), columns=["term", "df"])
        out: dict[str, int] = {}
        for t, d in zip(tbl["term"].to_pylist(), tbl["df"].to_pylist()):
            out[t] = out.get(t, 0) + int(d)
        return out

    def _term_rows(self, terms: list[str], columns: list[str]):
        return self._postings.to_table(
            filter=self._bucket_filter(terms), columns=columns
        )

    SCORING_ROW_COLS = [
        "term", "segment", "df", "blob",
        "block_last", "block_max_tf", "block_min_dl", "block_off",
    ]

    def _rows_for(self, terms: list[str]) -> dict[str, dict[int, "_CacheRow"]]:
        """Hot-row lookup: per term, its posting rows across segments —
        ONE dataset scan for the cache-missing terms only; warm terms
        never touch the dataset again.  Terms absent from the index get
        a negative entry so repeated queries don't re-scan for them."""
        missing = [t for t in terms if t not in self._rows_cache]
        if missing:
            tbl = self._term_rows(missing, self.SCORING_ROW_COLS)
            for i in range(tbl.num_rows):
                row = _CacheRow(tbl, i)
                seg_map = self._rows_cache.setdefault(row.term, {})
                if int(row.segment) not in seg_map:
                    self._rows_cache_bytes += row.nbytes()
                seg_map[int(row.segment)] = row
            for t in missing:
                self._rows_cache.setdefault(t, {})
            while (
                self._rows_cache_bytes > self._rows_cache_cap
                and len(self._rows_cache) > len(terms)
            ):
                # FIFO eviction of whole terms, skipping this query's
                old_t = next(
                    (t for t in self._rows_cache if t not in set(terms)), None
                )
                if old_t is None:
                    break
                old = self._rows_cache.pop(old_t)
                self._rows_cache_bytes -= sum(r.nbytes() for r in old.values())
        return {t: self._rows_cache[t] for t in terms}

    def _bounds_from_rows(
        self,
        rows: dict[str, dict[int, "_CacheRow"]],
        idf: dict[str, float],
        avgdl: "float | dict[str, float] | None" = None,
    ) -> tuple[dict[int, float], dict[int, int]]:
        """Per-segment score bounds from cached rows (no dataset read):
        same math as _bounds_from_table."""
        if avgdl is None:
            avgdl = self.avgdl
        bounds: dict[int, float] = {}
        present: dict[int, int] = {}
        for t, seg_map in rows.items():
            for seg, r in seg_map.items():
                if r.block_max_tf is None or r.block_min_dl is None:
                    b = float("inf")
                else:
                    b = idf.get(t, 0.0) * float(
                        bm25_tf_weight(
                            np.array([r.block_max_tf.max()], np.float64),
                            np.array([r.block_min_dl.min()], np.float64),
                            _adl(avgdl, t),
                        )[0]
                    )
                bounds[seg] = bounds.get(seg, 0.0) + b
                present[seg] = present.get(seg, 0) + 1
        return bounds, present

    def _bounds_from_table(
        self,
        mtbl,
        idf: dict[str, float],
        avgdl: "float | dict[str, float] | None" = None,
    ) -> tuple[dict[int, float], dict[int, int]]:
        """Per-segment BM25 score upper bounds from any row table
        carrying (term, segment, block_max_tf, block_min_dl):
        bound(seg) = Σ_t idf_t · w(max over blocks of max_tf, min over
        blocks of min_dl).  Mixing one block's max_tf with another's
        min_dl only loosens the bound (w is ↑ in tf, ↓ in dl), so it
        stays safe.  Legacy rows without block bounds force +inf (never
        skipped).  Returns (bounds, per-segment present-term counts)."""
        if avgdl is None:
            avgdl = self.avgdl
        bounds: dict[int, float] = {}
        present: dict[int, int] = {}
        segs = mtbl["segment"].to_pylist()
        for i in range(mtbl.num_rows):
            seg = int(segs[i])
            t = mtbl["term"][i].as_py()
            bmt, bmd = mtbl["block_max_tf"][i], mtbl["block_min_dl"][i]
            if not bmt.is_valid or not bmd.is_valid:
                b = float("inf")
            else:
                b = idf[t] * float(
                    bm25_tf_weight(
                        np.array([_list_np(bmt, np.int64).max()], np.float64),
                        np.array([_list_np(bmd, np.int64).min()], np.float64),
                        _adl(avgdl, t),
                    )[0]
                )
            bounds[seg] = bounds.get(seg, 0.0) + b
            present[seg] = present.get(seg, 0) + 1
        return bounds, present

    def search(
        self,
        terms: list[str],
        mode: str = "OR",
        k: int = 10,
        algo: str = "auto",
        min_should_match: int = 1,
    ) -> list[tuple[int, float]]:
        """Top-k BM25 → [(doc_id, score)] by (score desc, doc_id asc).
        Identical accumulation order to IndexSearcher → bit-identical.
        algo mirrors IndexSearcher.search: "auto" (AND → block-skip,
        OR → MaxScore), "bmw", "maxscore", "exhaustive".

        The pruned paths (auto/maxscore/AND-block-skip) add
        CROSS-SEGMENT pruning (the Lucene/ES per-segment max-score
        analog the reference delegates to ES): segments are scored in
        descending bound order and a segment whose bound is strictly
        below the current k-th score is skipped before its posting
        blobs are ever read or decoded — bit-identical because every
        doc in it scores ≤ bound < k-th (strict, so ties are
        impossible).  ``last_segments_skipped`` reports the count."""
        terms_sorted = sorted(set(terms))
        dfs = self.global_dfs(terms_sorted)
        mode_u = mode.upper()
        msm = int(min_should_match)
        if msm > 1 and mode_u != "OR":
            raise ValueError("min_should_match applies to OR queries only")
        self.last_segments_skipped = 0
        if not dfs or (mode_u == "AND" and any(t not in dfs for t in terms_sorted)):
            return []
        idf = {t: bm25_idf(self.n_docs, d) for t, d in dfs.items()}
        avgdl = field_avgdl_map(self.manifest, terms_sorted)

        if msm > 1:
            from .bm25 import _msm_scores

            rows = self._rows_for(terms_sorted)
            acc_d = np.array([], np.int64)
            acc_s = np.array([], np.float64)
            for seg in sorted({s for m in rows.values() for s in m}):
                postings = {
                    t: self._decode_cached(t, seg, rows[t][seg].blob)
                    for t in terms_sorted
                    if seg in rows.get(t, {})
                }
                postings = _mask_deleted(postings, self._deletes.get(seg))
                docs, scores = _msm_scores(
                    postings, terms_sorted, idf, avgdl, msm
                )
                if docs.size:
                    acc_d, acc_s = _topk(
                        np.concatenate([acc_d, docs]),
                        np.concatenate([acc_s, scores]),
                        k,
                    )
            return list(zip(acc_d.tolist(), acc_s.tolist()))

        cols = ["term", "segment", "df", "blob", "block_last", "block_max_tf", "block_min_dl", "block_off"]
        if algo in ("auto", "maxscore") or (
            mode_u == "AND" and algo != "exhaustive"
        ):
            return self._search_pruned(terms_sorted, mode_u, k, idf, avgdl)
        tbl = self._term_rows(terms_sorted, cols)
        seg_arr = np.asarray(tbl["segment"].to_pylist())
        cand_docs, cand_scores = [], []
        for seg in np.unique(seg_arr):
            idxs = np.flatnonzero(seg_arr == seg)
            dead = self._deletes.get(int(seg))
            if mode_u == "OR" and algo == "bmw":
                blobs, blocks = {}, {}
                for i in idxs:
                    t = tbl["term"][int(i)].as_py()
                    _put_unique(blobs, t, tbl["blob"][int(i)].as_py())
                    # arrow-native list extraction: .values.to_numpy is
                    # O(1)-ish vs as_py()'s per-element Python objects
                    # (a stopword has thousands of blocks per row)
                    blocks[t] = (
                        _list_np(tbl["block_last"][int(i)], np.int64),
                        idf[t]
                        * bm25_tf_weight(
                            _list_np(tbl["block_max_tf"][int(i)], np.int64),
                            _list_np(tbl["block_min_dl"][int(i)], np.int64),
                            _adl(avgdl, t),
                        ),
                        _list_np(tbl["block_off"][int(i)], np.int32),
                    )
                docs, scores = _score_union_blockmax(
                    blobs,
                    blocks,
                    terms_sorted,
                    idf,
                    avgdl,
                    k,
                    deleted=dead,
                    decoded=self._bmw_blocks_for(int(seg)),
                    full_decode=lambda t, s=int(seg): self._decode_cached(
                        t, s, blobs[t]
                    ),
                )
                self._bmw_cache_blocks = sum(
                    len(d) for d in self._bmw_cache.values()
                )
            else:
                postings = {}
                for i in idxs:
                    t = tbl["term"][int(i)].as_py()
                    d, tf, dl = self._decode_cached(t, int(seg), tbl["blob"][int(i)])
                    _put_unique(postings, t, (d, tf, dl))
                postings = _mask_deleted(postings, dead)
                if mode_u == "AND":
                    if not all(t in postings for t in terms_sorted):
                        continue
                    docs, scores = _score_intersection(
                        postings, terms_sorted, idf, avgdl
                    )
                else:
                    docs, scores = _score_union_exhaustive(
                        postings, terms_sorted, idf, avgdl
                    )
                docs, scores = _topk(docs, scores, k)
            cand_docs.append(docs)
            cand_scores.append(scores)
        if not cand_docs:
            return []
        all_d = np.concatenate(cand_docs)
        all_s = np.concatenate(cand_scores)
        d, s = _topk(all_d, all_s, k)
        return list(zip(d.tolist(), s.tolist()))

    def _search_pruned(
        self,
        terms_sorted: list[str],
        mode_u: str,
        k: int,
        idf: dict[str, float],
        avgdl: "float | dict[str, float] | None" = None,
    ) -> list[tuple[int, float]]:
        """auto/maxscore/AND-block-skip scoring with cross-segment
        pruning over the hot term-rows cache: segments score in
        bound-descending order with a running k-th floor; a segment
        whose bound cannot reach the floor is skipped before any of its
        blobs are DECODED.  Cold terms cost one dataset scan
        (_rows_for); warm terms never touch the dataset — the pyarrow
        scan was the warm-path latency floor (r4 bench).  Within each
        surviving segment the same kernels as the distributed searcher
        run, seeded from / harvesting into the decoded-postings
        cache."""
        if avgdl is None:
            avgdl = self.avgdl
        rows = self._rows_for(terms_sorted)
        bounds, present = self._bounds_from_rows(rows, idf, avgdl)
        segs = [
            s
            for s in bounds
            if mode_u != "AND" or present[s] == len(terms_sorted)
        ]
        # bound desc, segment asc for deterministic order on ties
        order = sorted(segs, key=lambda s: (-bounds[s], s))
        acc_d = np.array([], np.int64)
        acc_s = np.array([], np.float64)
        floor = -np.inf
        for seg in order:
            if len(acc_d) >= k and bounds[seg] < floor:
                self.last_segments_skipped += 1
                continue
            seg_rows = [
                rows[t][seg] for t in terms_sorted if seg in rows.get(t, {})
            ]
            if not seg_rows:
                continue
            dead = self._deletes.get(int(seg))
            cache = _BlockCache(seg_rows)
            for t in cache.blob:
                hit = self._cache.get((t, int(seg)))
                if hit is not None:
                    cache._full[t] = hit
            if mode_u == "AND":
                docs, scores = _score_intersection_blockmax(
                    cache, terms_sorted, idf, avgdl, dead=dead
                )
                docs, scores = _topk(docs, scores, k)
            else:
                docs, scores = _score_union_maxscore(
                    cache, terms_sorted, idf, avgdl, k, dead=dead
                )
            for t, out in cache._full.items():
                self._cache_put(t, int(seg), out)
            acc_d, acc_s = _topk(
                np.concatenate([acc_d, docs]),
                np.concatenate([acc_s, scores]),
                k,
            )
            if len(acc_d) >= k:
                floor = float(acc_s[-1])
        return list(zip(acc_d.tolist(), acc_s.tolist()))

    DEFAULT_MAX_EXPANSIONS = 128

    def expand_prefix(
        self, prefix: str, max_expansions: int = DEFAULT_MAX_EXPANSIONS
    ) -> list[str]:
        """Indexed terms starting with ``prefix`` — pyarrow termdict
        range scan; same semantics/caps as IndexSearcher.expand_prefix
        (body prefixes never leak field/facet terms; overflow raises
        PrefixExpansionError)."""
        from .bm25 import PrefixExpansionError, prefix_term_range

        lo, hi = prefix_term_range(prefix)
        src = self._termdict if self._termdict is not None else self._postings
        tbl = src.to_table(
            filter=(ds.field("term") >= lo) & (ds.field("term") < hi),
            columns=["term"],
        )
        terms = set(tbl["term"].to_pylist())
        if ":" not in prefix:
            terms = {t for t in terms if ":" not in t}
        if len(terms) > max_expansions:
            raise PrefixExpansionError(
                f"prefix {prefix!r} expands to more than {max_expansions} "
                "terms; narrow the prefix or raise max_expansions"
            )
        return sorted(terms)

    def search_prefix(
        self,
        prefix: str,
        k: int = 10,
        max_expansions: int = DEFAULT_MAX_EXPANSIONS,
    ) -> list[tuple[int, float]]:
        """Prefix query — expansion + disjunctive BM25, bit-identical
        to IndexSearcher.search_prefix."""
        terms = self.expand_prefix(prefix, max_expansions)
        if not terms:
            return []
        return self.search(terms, mode="OR", k=k)

    DEFAULT_FUZZY_EXPANSIONS = 50

    def expand_fuzzy(
        self,
        term: str,
        max_edits: int = 1,
        prefix_length: int = 0,
        max_expansions: int = DEFAULT_FUZZY_EXPANSIONS,
    ) -> list[str]:
        """Serving twin of IndexSearcher.expand_fuzzy: pyarrow termdict
        scan (length ± max_edits prune, optional prefix range) + the
        pure-python Levenshtein DP — same algorithm as Spark's
        levenshtein expression, so both searchers expand identically."""
        from .bm25 import (
            _PREFIX_RE,
            FuzzyExpansionError,
            prefix_term_range,
            py_levenshtein_within,
        )

        if not _PREFIX_RE.match(term):
            raise ValueError(
                f"bad fuzzy term {term!r}: expected lowercase [a-z0-9]+ "
                "with an optional 'field:' prefix"
            )
        field, body = term.split(":", 1) if ":" in term else (None, term)
        src = self._termdict if self._termdict is not None else self._postings
        # length ±max_edits pushed into the scan (plus the field's
        # prefix bytes) — the termdict materializes only plausible
        # candidates, not the whole vocabulary
        import pyarrow.compute as pc

        base = len(term) - len(body)
        flt = pc.utf8_length(ds.field("term")).cast("int64").isin(
            list(
                range(
                    max(1, base + len(body) - max_edits),
                    base + len(body) + max_edits + 1,
                )
            )
        )
        if prefix_length > 0:
            lo, hi = prefix_term_range(term[:base + prefix_length])
            flt = flt & (ds.field("term") >= lo) & (ds.field("term") < hi)
        tbl = src.to_table(filter=flt, columns=["term"])
        out = set()
        pre = f"{field}:" if field is not None else None
        for t in set(tbl["term"].to_pylist()):
            if pre is not None:
                if not t.startswith(pre):
                    continue
                tb = t.split(":", 1)[1]
            else:
                if ":" in t or t.startswith("__"):
                    continue
                tb = t
            if abs(len(tb) - len(body)) > max_edits:
                continue
            if py_levenshtein_within(tb, body, max_edits):
                out.add(t)
                if len(out) > max_expansions:
                    raise FuzzyExpansionError(
                        f"fuzzy term {term!r} (edits≤{max_edits}) expands "
                        f"to more than {max_expansions} terms; raise "
                        "max_expansions or prefix_length"
                    )
        return sorted(out)

    def search_fuzzy(
        self,
        term: str,
        k: int = 10,
        max_edits: int = 1,
        prefix_length: int = 0,
        max_expansions: int = DEFAULT_FUZZY_EXPANSIONS,
    ) -> list[tuple[int, float]]:
        """Fuzzy query — bit-identical to IndexSearcher.search_fuzzy."""
        terms = self.expand_fuzzy(
            term, max_edits, prefix_length, max_expansions
        )
        if not terms:
            return []
        return self.search(terms, mode="OR", k=k)

    def expand_regexp(
        self,
        pattern: str,
        max_expansions: int = DEFAULT_MAX_EXPANSIONS,
        field: str | None = None,
    ) -> list[str]:
        """Serving twin of IndexSearcher.expand_regexp: literal-prefix
        range pushdown into the pyarrow termdict scan, anchored
        ``re.fullmatch`` over the pruned vocabulary (Python re, Java
        regex, and RE2 agree on the safe dialect check_regexp
        enforces)."""
        import re as _re

        from .bm25 import (
            RegexpExpansionError,
            check_regexp,
            prefix_term_range,
            regexp_prefixes,
        )

        check_regexp(pattern)
        if field is not None and not _re.fullmatch(r"[a-z0-9]+", field):
            raise ValueError(f"bad field name {field!r}")
        src = self._termdict if self._termdict is not None else self._postings
        prefixes = regexp_prefixes(pattern)
        flt = None
        if prefixes:
            # union of the branch prefix ranges — never a full
            # vocabulary scan when every alternation branch is anchored
            for lit in prefixes:
                pfx = f"{field}:{lit}" if field is not None else lit
                lo, hi = prefix_term_range(pfx)
                r = (ds.field("term") >= lo) & (ds.field("term") < hi)
                flt = r if flt is None else (flt | r)
        elif field is not None:
            # [field:, field;) — ';' = chr(ord(':')+1) bounds exactly
            # the field-prefixed terms even with no literal prefix
            lo, hi = field + ":", field + ";"
            flt = (ds.field("term") >= lo) & (ds.field("term") < hi)
        tbl = src.to_table(filter=flt, columns=["term"])
        rex = _re.compile(pattern)
        terms = set()
        for t in set(tbl["term"].to_pylist()):
            if field is not None:
                body = t.split(":", 1)[1]
            else:
                if ":" in t or t.startswith("__"):
                    continue
                body = t
            if rex.fullmatch(body):
                terms.add(t)
                if len(terms) > max_expansions:
                    raise RegexpExpansionError(
                        f"regexp {pattern!r} expands to more than "
                        f"{max_expansions} terms; narrow the pattern or "
                        "raise max_expansions"
                    )
        return sorted(terms)

    def search_regexp(
        self,
        pattern: str,
        k: int = 10,
        max_expansions: int = DEFAULT_MAX_EXPANSIONS,
        field: str | None = None,
    ) -> list[tuple[int, float]]:
        """Regexp query — bit-identical to IndexSearcher.search_regexp."""
        terms = self.expand_regexp(pattern, max_expansions, field)
        if not terms:
            return []
        return self.search(terms, mode="OR", k=k)

    def search_fielded(
        self,
        terms: list[str],
        fields: dict[str, float] | None = None,
        k: int = 10,
        mode: str = "OR",
        tie_breaker: float = 0.0,
    ) -> list[tuple[int, float]]:
        """Multi-field BM25F-lite top-k — bit-identical to
        IndexSearcher.search_fielded (same expansion, same weighted-idf
        fold, same kernels with per-term field avgdl), served from the
        hot-row cache (OR mode adds cross-segment pruning).  mode="BEST"
        is the dis_max / best_fields variant (same kernel as the
        distributed twin)."""
        from .bm25 import (
            _fielded_and_scores,
            _fielded_best_scores,
            _mask_deleted,
            fielded_term_field,
        )

        mode_u = mode.upper()
        text_fields = analyzed_fields_of(self.manifest)
        if fields is None:
            fields = {"text": 1.0, **{f: 1.0 for f in text_fields}}
        expanded, weight = expand_fielded_terms(terms, fields, text_fields)
        avgdl = field_avgdl_map(self.manifest, expanded)
        dfs = self.global_dfs(expanded)
        self.last_segments_skipped = 0
        if not dfs:
            return []
        idf = {
            t: weight[t] * bm25_idf(self.n_docs, d) for t, d in dfs.items()
        }
        if mode_u not in ("AND", "BEST"):
            return self._search_pruned(expanded, "OR", k, idf, avgdl)
        variants = {
            t: sorted(t if f == "text" else f"{f}:{t}" for f in fields)
            for t in dict.fromkeys(terms)
        }
        field_of = {t: fielded_term_field(t) for t in expanded}
        rows = self._rows_for(expanded)
        acc_d = np.array([], np.int64)
        acc_s = np.array([], np.float64)
        for seg in sorted({s for m in rows.values() for s in m}):
            postings = {
                t: self._decode_cached(t, seg, rows[t][seg].blob)
                for t in expanded
                if seg in rows.get(t, {})
            }
            postings = _mask_deleted(postings, self._deletes.get(seg))
            if mode_u == "AND":
                docs, scores = _fielded_and_scores(
                    postings, variants, expanded, idf, avgdl
                )
            else:
                docs, scores = _fielded_best_scores(
                    postings, field_of, expanded, idf, avgdl, tie_breaker
                )
            if docs.size:
                acc_d, acc_s = _topk(
                    np.concatenate([acc_d, docs]),
                    np.concatenate([acc_s, scores]),
                    k,
                )
        return list(zip(acc_d.tolist(), acc_s.tolist()))

    def search_facets(
        self,
        query: list[str] | str,
        fields: list[str],
        mode: str = "OR",
    ) -> list[tuple[str, str, int]]:
        """ES ``terms`` aggregation, serving-path twin of
        IndexSearcher.search_facets: [(field, value, doc_count)] sorted
        by (field, count desc, value), counting ALL matching live docs.
        Same semantics, no Spark jobs."""
        from functools import reduce

        from ..functions import boolquery as bq

        mode_u = mode.upper()
        if mode_u == "BOOL":
            ast = bq.parse(query)  # type: ignore[arg-type]
            qterms = sorted(set(bq.all_terms(ast)))
        else:
            ast = None
            qterms = sorted(set(query))
        prefixes = {f: f"__{f}_" for f in fields}
        src = self._termdict if self._termdict is not None else self._postings
        tnames = src.to_table(columns=["term"]).column("term").to_pylist()
        fterms = sorted(
            {
                t
                for t in tnames
                if t.endswith("__")
                and any(t.startswith(p) for p in prefixes.values())
            }
        )
        all_terms = sorted(set(qterms) | set(fterms))
        if not qterms:
            return []
        tbl = self._term_rows(all_terms, ["term", "segment", "blob"])
        seg_arr = np.asarray(tbl["segment"].to_pylist())
        counts: dict[tuple[str, str], int] = {}
        qset = set(qterms)
        for seg in np.unique(seg_arr):
            idxs = np.flatnonzero(seg_arr == seg)
            qdocs: dict[str, np.ndarray] = {}
            facet_rows: list[tuple[str, int]] = []
            for i in idxs:
                t = tbl["term"][int(i)].as_py()
                if t in qset:
                    d, _tf, _dl = self._decode_cached(
                        t, int(seg), tbl["blob"][int(i)]
                    )
                    qdocs[t] = d
                if t in fterms:
                    facet_rows.append((t, int(i)))
            if ast is not None:
                cand = bq.eval_docs(ast, qdocs)
                matches = (
                    np.array([], np.int64) if isinstance(cand, tuple) else cand
                )
            elif mode_u == "AND":
                if any(t not in qdocs for t in qterms):
                    matches = np.array([], np.int64)
                else:
                    matches = reduce(
                        lambda a, b: np.intersect1d(a, b, assume_unique=True),
                        (qdocs[t] for t in qterms),
                    )
            else:
                present = [qdocs[t] for t in qterms if t in qdocs]
                matches = (
                    reduce(np.union1d, present)
                    if present
                    else np.array([], np.int64)
                )
            dead = self._deletes.get(int(seg))
            if dead is not None and dead.size and matches.size:
                matches = matches[~np.isin(matches, dead, assume_unique=True)]
            if not matches.size:
                continue
            for t, i in facet_rows:
                fd, _tf, _dl = self._decode_cached(t, int(seg), tbl["blob"][i])
                n = int(np.isin(fd, matches, assume_unique=True).sum())
                if n:
                    f = next(
                        f for f, p in prefixes.items() if t.startswith(p)
                    )
                    value = t[len(prefixes[f]) : -2]
                    key = (f, value)
                    counts[key] = counts.get(key, 0) + n
        return sorted(
            ((f, v, c) for (f, v), c in counts.items()),
            key=lambda x: (x[0], -x[2], x[1]),
        )

    def search_page(
        self,
        terms: list[str],
        mode: str = "OR",
        k: int = 10,
        after: tuple[float, int] | None = None,
    ) -> list[tuple[int, float]]:
        """Keyset pagination (ES ``search_after``), serving-path twin of
        IndexSearcher.search_page: top-k matches strictly after cursor
        (score, doc_id) in (score desc, doc_id asc) order."""
        terms_sorted = sorted(set(terms))
        dfs = self.global_dfs(terms_sorted)
        mode_u = mode.upper()
        if not dfs or (mode_u == "AND" and any(t not in dfs for t in terms_sorted)):
            return []
        idf = {t: bm25_idf(self.n_docs, d) for t, d in dfs.items()}
        tbl = self._term_rows(terms_sorted, ["term", "segment", "blob"])
        seg_arr = np.asarray(tbl["segment"].to_pylist())
        cand_d, cand_s = [], []
        for seg in np.unique(seg_arr):
            idxs = np.flatnonzero(seg_arr == seg)
            postings = {}
            for i in idxs:
                t = tbl["term"][int(i)].as_py()
                d, tf, dl = self._decode_cached(t, int(seg), tbl["blob"][int(i)])
                _put_unique(postings, t, (d, tf, dl))
            postings = _mask_deleted(postings, self._deletes.get(int(seg)))
            if mode_u == "AND":
                if not all(t in postings for t in terms_sorted):
                    continue
                docs, scores = _score_intersection(
                    postings, terms_sorted, idf, self.avgdl
                )
            else:
                docs, scores = _score_union_exhaustive(
                    postings, terms_sorted, idf, self.avgdl
                )
            if after is not None and docs.size:
                s_a, d_a = float(after[0]), int(after[1])
                keep = (scores < s_a) | ((scores == s_a) & (docs > d_a))
                docs, scores = docs[keep], scores[keep]
            docs, scores = _topk(docs, scores, k)
            cand_d.append(docs)
            cand_s.append(scores)
        if not cand_d:
            return []
        d, s = _topk(np.concatenate(cand_d), np.concatenate(cand_s), k)
        return list(zip(d.tolist(), s.tolist()))

    def warm_top_terms(self, n: int = 256) -> int:
        """ES index-warmer analog: preload the ``n`` highest-df terms —
        rows into the term-rows cache AND decoded postings into the
        decode cache — so a fresh serving process reaches its warm p99
        before real traffic instead of during it.  The df ranking comes
        from the termdict (tiny scan); stopwords, which dominate cold
        latency, rank first by construction.  Returns the number of
        terms warmed."""
        import pyarrow as pa
        import pyarrow.compute as pc

        src = self._termdict if self._termdict is not None else self._postings
        tbl = src.to_table(columns=["term", "df"])
        # arrow-side aggregation: filter facet tokens, sum df per term —
        # the python dict loop over a web-scale vocabulary cost ~0.6 s
        tbl = tbl.filter(
            pc.invert(pc.starts_with(tbl.column("term"), "__"))
        )
        agg_t = pa.table(
            {"term": tbl.column("term"), "df": tbl.column("df")}
        ).group_by("term").aggregate([("df", "sum")])
        order = pc.sort_indices(
            agg_t,
            sort_keys=[("df_sum", "descending"), ("term", "ascending")],
        )[: max(0, n)]
        top = pc.take(agg_t.column("term"), order).to_pylist()
        if not top:
            return 0
        rows = self._rows_for(sorted(top))
        # batch decode: one width-grouped unpack across every warmed
        # blob instead of per-blob decode (thousands of small blobs)
        todo = [
            (t, int(seg), r.blob)
            for t, seg_map in rows.items()
            for seg, r in seg_map.items()
            if (t, int(seg)) not in self._cache
        ]
        blobs = [
            b.as_py() if hasattr(b, "as_py") else b for _t, _s, b in todo
        ]
        for (t, seg, _b), decoded in zip(
            todo, codecs.decode_postings_many(blobs)
        ):
            self._cache_put(t, seg, decoded)
        return len(top)

    def search_count(self, query: list[str] | str, mode: str = "OR") -> int:
        """ES ``_count`` — serving twin of IndexSearcher.search_count."""
        from functools import reduce

        from ..functions import boolquery as bq

        mode_u = mode.upper()
        if mode_u == "BOOL":
            from .bm25 import nested_paths_of

            ast = bq.parse(
                query,  # type: ignore[arg-type]
                analyzed_fields=set(analyzed_fields_of(self.manifest)),
                dv_fields=dv_filter_fields_of(self.manifest),
                nested_fields=nested_paths_of(self.manifest),
            )
            if bq.has_wildcards(ast):
                ast = bq.expand_wildcards(
                    ast, self.expand_prefix, self.expand_fuzzy
                )
            if bq.range_atoms(ast) or bq.phrase_atoms(ast) or bq.nested_atoms(ast):
                # doc-value / positional / nested atoms resolve on the
                # aggregation front half
                return int(len(self.matched_ids(query, "BOOL")))
            qterms = sorted(set(bq.all_terms(ast)))
        else:
            ast = None
            qterms = sorted(set(query))
        if not qterms:
            return 0
        rows = self._rows_for(qterms)
        segs = sorted({s for m in rows.values() for s in m})
        total = 0
        for seg in segs:
            qdocs = {
                t: self._decode_cached(t, seg, rows[t][seg].blob)[0]
                for t in qterms
                if seg in rows.get(t, {})
            }
            if ast is not None:
                cand = bq.eval_docs(ast, qdocs)
                matches = (
                    np.array([], np.int64) if isinstance(cand, tuple) else cand
                )
            elif mode_u == "AND":
                if any(t not in qdocs for t in qterms):
                    continue
                matches = reduce(
                    lambda a, b: np.intersect1d(a, b, assume_unique=True),
                    (qdocs[t] for t in qterms),
                )
            else:
                present = list(qdocs.values())
                if not present:
                    continue
                matches = reduce(np.union1d, present)
            dead = self._deletes.get(seg)
            if dead is not None and dead.size and matches.size:
                matches = matches[~np.isin(matches, dead, assume_unique=True)]
            total += int(matches.size)
        return total

    def _segment_match_dls(self, query, mode: str):
        """Per segment, (matching live doc ids, their doc lengths) —
        the shared serving kernel behind stats/histogram aggs."""
        from .bm25 import _match_dls, _match_docs, analyzed_fields_of

        from ..functions import boolquery as bq

        mode_u = mode.upper()
        if mode_u == "BOOL":
            ast = bq.parse(
                query,
            analyzed_fields=set(analyzed_fields_of(self.manifest)),
            dv_fields=dv_filter_fields_of(self.manifest),
            )
            if bq.has_wildcards(ast):
                ast = bq.expand_wildcards(
                    ast, self.expand_prefix, self.expand_fuzzy
                )
            qterms = sorted(set(bq.all_terms(ast)))
        else:
            ast = None
            qterms = sorted(set(query))
        if not qterms:
            return
        rows = self._rows_for(qterms)
        for seg in sorted({s for m in rows.values() for s in m}):
            qdocs, decoded = {}, []
            for t in qterms:
                if seg in rows.get(t, {}):
                    d, _tf, dl = self._decode_cached(t, seg, rows[t][seg].blob)
                    qdocs[t] = d
                    decoded.append((d, dl))
            matches = _match_docs(qdocs, qterms, mode_u, ast)
            dead = self._deletes.get(seg)
            if dead is not None and dead.size and matches.size:
                matches = matches[~np.isin(matches, dead, assume_unique=True)]
            if matches.size:
                yield matches, _match_dls(decoded, matches)

    def search_stats(self, query, mode: str = "OR") -> dict:
        """ES ``stats`` aggregation — serving twin of
        IndexSearcher.search_stats: {n_hits, min_dl, max_dl, sum_dl,
        avg_dl} over the matching live docs."""
        n = s = 0
        mn = mx = None
        for _m, dls in self._segment_match_dls(query, mode) or ():
            n += int(dls.size)
            s += int(dls.sum())
            mn = int(dls.min()) if mn is None else min(mn, int(dls.min()))
            mx = int(dls.max()) if mx is None else max(mx, int(dls.max()))
        return {
            "n_hits": n,
            "min_dl": mn,
            "max_dl": mx,
            "sum_dl": s,
            "avg_dl": (s / n) if n else None,
        }

    def search_histogram(
        self, query, interval: int, mode: str = "OR"
    ) -> list[tuple[int, int]]:
        """ES ``histogram`` aggregation — serving twin: [(bucket,
        doc_count)] sorted by bucket."""
        if interval <= 0:
            raise ValueError("interval must be positive")
        acc: dict[int, int] = {}
        for _m, dls in self._segment_match_dls(query, mode) or ():
            b, c = np.unique(dls // interval * interval, return_counts=True)
            for bb, cc in zip(b.tolist(), c.tolist()):
                acc[int(bb)] = acc.get(int(bb), 0) + int(cc)
        return sorted(acc.items())

    # ---- doc-value queries: serving twins of the docvalues.py ops ----

    def _docvalues(self, field: str) -> tuple[np.ndarray, np.ndarray]:
        """(doc_ids sorted asc, aligned values) for one doc-value field
        — a two-column columnar doclens read, cached."""
        hit = self._dv_cache.get(field)
        if hit is not None:
            return hit
        import pyarrow.dataset as _ds

        from .docvalues import DocValueError

        dset = _ds.dataset(self._doclens_path, format="parquet")
        if field not in dset.schema.names:
            raise DocValueError(
                f"{field!r} is not a doc-value field of this index "
                f"(doclens columns: {sorted(n for n in dset.schema.names if n != 'doc_id')})"
            )
        tbl = dset.to_table(columns=["doc_id", field])
        # docs with a NULL value are absent from the column (ES
        # missing-field semantics — aggregations/sorts/ranges skip
        # them); dropping BEFORE to_numpy also keeps integer columns
        # integer instead of NaN-widened float64
        import pyarrow.compute as _pc

        if tbl[field].null_count:
            tbl = tbl.filter(_pc.is_valid(tbl[field]))
        import pyarrow as _pa

        ftype = tbl.schema.field(field).type
        if _pa.types.is_list(ftype) or _pa.types.is_large_list(ftype):
            # multi-valued field: an EMPTY array is missing too (ES
            # semantics); kept values come back as an object array of
            # per-doc numpy arrays
            self._dv_array_fields.add(field)
            tbl = tbl.filter(_pc.greater(_pc.list_value_length(tbl[field]), 0))
        ids = tbl["doc_id"].to_numpy(zero_copy_only=False)
        vals = tbl[field].to_numpy(zero_copy_only=False)
        order = np.argsort(ids, kind="stable")
        out = (ids[order], vals[order])
        nbytes = out[0].nbytes + getattr(out[1], "nbytes", len(out[1]) * 8)
        if self._dv_cache_bytes + nbytes > self._dv_cache_cap:
            self._dv_cache.clear()
            self._dv_cache_bytes = 0
        self._dv_cache[field] = out
        self._dv_cache_bytes += nbytes
        return out

    def matched_ids(self, query=None, mode: str = "OR") -> np.ndarray:
        """Sorted live doc ids matching the query; None = match_all.
        BOOL queries may contain doc-value range atoms (incl.
        pure-range queries — bounded filters of match_all)."""
        if query is None:
            ids, _ = self._docvalues("doc_len")
            dead_all = [d for d in self._deletes.values() if d is not None and d.size]
            if dead_all:
                dead = np.unique(np.concatenate(dead_all))
                ids = ids[~np.isin(ids, dead, assume_unique=True)]
            return ids
        if mode.upper() == "BOOL":
            from ..functions import boolquery as bq
            from .bm25 import analyzed_fields_of, nested_paths_of

            ast = bq.parse(
                query,
            analyzed_fields=set(analyzed_fields_of(self.manifest)),
            dv_fields=dv_filter_fields_of(self.manifest),
            nested_fields=nested_paths_of(self.manifest),
            )
            if bq.has_wildcards(ast):
                ast = bq.expand_wildcards(
                    ast, self.expand_prefix, self.expand_fuzzy
                )
            if bq.range_atoms(ast) or bq.phrase_atoms(ast) or bq.nested_atoms(ast):
                return self._matched_ids_ranges(ast)
        parts = [m for m, _dls in self._segment_match_dls(query, mode) or ()]
        if not parts:
            return np.array([], np.int64)
        return np.concatenate(parts)  # segments hold disjoint id ranges

    def _matched_ids_ranges(self, ast) -> np.ndarray:
        """matched_ids for a BOOL AST with doc-value range atoms:
        allowed ids resolve once from the cached doc values, sliced
        per segment and injected into the shared match kernel."""
        from ..functions import boolquery as bq
        from .bm25 import _match_docs
        from .docvalues import range_mask

        qterms = sorted(set(bq.all_terms(ast)))
        g, p = self.manifest["globals"], self.manifest["params"]
        dpp, seg_group = int(g["docs_per_part"]), int(p["seg_group"])
        range_sets = {}
        for rt in bq.range_atoms(ast):
            all_ids, vals = self._docvalues(rt.field)
            ids = all_ids[
                range_mask(vals, rt, rt.field in self._dv_array_fields)
            ]
            range_sets[rt.key()] = (ids, (ids // dpp) // seg_group)
        for pt in bq.phrase_atoms(ast):
            ids = np.sort(self._phrase_match_rows(list(pt.tokens), pt.slop)[0])
            range_sets[pt.key()] = (ids, (ids // dpp) // seg_group)
        for nt in bq.nested_atoms(ast):
            from . import nested as nst

            ids = nst.local_atom_ids(self, nt)
            range_sets[nt.key()] = (ids, (ids // dpp) // seg_group)
        rows = self._rows_for(qterms) if qterms else {}
        seg_list = {s for m in rows.values() for s in m}
        for _ids, segs in range_sets.values():
            seg_list |= set(np.unique(segs).tolist())
        out = []
        for seg in sorted(seg_list):
            qdocs = {}
            for t in qterms:
                if seg in rows.get(t, {}):
                    d, _tf, _dl = self._decode_cached(
                        t, seg, rows[t][seg].blob
                    )
                    qdocs[t] = d
            for rk, (ids, segs) in range_sets.items():
                qdocs[rk] = ids[segs == seg]
            matches = _match_docs(qdocs, qterms, "BOOL", ast)
            dead = self._deletes.get(int(seg))
            if dead is not None and dead.size and matches.size:
                matches = matches[~np.isin(matches, dead, assume_unique=True)]
            if matches.size:
                out.append(matches)
        if not out:
            return np.array([], np.int64)
        return np.concatenate(out)

    def _dv_lookup(
        self, field: str, ids: np.ndarray, allow_array: bool = False
    ) -> tuple[np.ndarray, np.ndarray]:
        """(present_mask aligned with ``ids``, values aligned with
        ``ids[present_mask]``) — docs whose field is NULL (or an empty
        array) are absent from the doc-value column (ES missing-field
        semantics), so callers must drop them from the matched set.
        Scalar-only callers reject multi-valued fields loudly."""
        from .docvalues import DocValueError

        all_ids, vals = self._docvalues(field)
        if not allow_array and field in self._dv_array_fields:
            raise DocValueError(
                f"{field!r} is a multi-valued (array) doc-value field — "
                "this operation takes single-valued fields"
            )
        idx = np.searchsorted(all_ids, ids)
        ok = idx < len(all_ids)
        ok[ok] = all_ids[idx[ok]] == ids[ok]
        return ok, vals[idx[ok]]

    def search_sorted(
        self, query, by: str, ascending: bool = False, k: int = 10,
        mode: str = "OR", after=None,
    ) -> list[tuple]:
        """ES sort-by-field — serving twin of IndexSearcher.search_sorted:
        [(doc_id, value)] ordered by (value asc/desc, doc_id asc).
        ``after=(value, doc_id)`` = search_after pagination."""
        import pandas as pd

        ids = np.sort(self.matched_ids(query, mode))
        present, vals = self._dv_lookup(by, ids)
        ids = ids[present]
        if not ids.size:
            return []
        if after is not None:
            av, aid = after
            if np.issubdtype(vals.dtype, np.datetime64):
                av = np.datetime64(pd.Timestamp(av))
            m = (vals > av) if ascending else (vals < av)
            m |= (vals == av) & (ids > int(aid))
            ids, vals = ids[m], vals[m]
        df = pd.DataFrame({"doc_id": ids, "v": vals}).sort_values(
            ["v", "doc_id"], ascending=[ascending, True], kind="mergesort"
        ).head(int(k))
        return list(zip(df["doc_id"].tolist(), df["v"].tolist()))

    def search_range(
        self, query, field: str, lo=None, hi=None, mode: str = "OR",
        k: int = 10,
    ) -> list[tuple[int, float]]:
        """BM25 top-k with a range filter clause — serving twin of
        docvalues.search_range, bit-identical scores (same exhaustive
        _msm_scores kernel, same global idf/avgdl, filter context)."""
        from .bm25 import _msm_scores
        from .docvalues import DocValueError

        if lo is None and hi is None:
            raise DocValueError("range filter needs at least one bound")
        mode_u = mode.upper()
        if mode_u not in ("OR", "AND"):
            raise ValueError("search_range supports OR/AND term queries")
        qterms = sorted(set(query))
        if not qterms:
            return []
        all_ids, vals = self._docvalues(field)
        if np.issubdtype(vals.dtype, np.datetime64):
            import pandas as pd

            lo = None if lo is None else np.datetime64(pd.Timestamp(lo))
            hi = None if hi is None else np.datetime64(pd.Timestamp(hi))
        keep = np.ones(len(all_ids), dtype=bool)
        if lo is not None:
            keep &= vals >= lo
        if hi is not None:
            keep &= vals <= hi
        allowed = all_ids[keep]
        if not allowed.size:
            return []
        dfs = self.global_dfs(qterms)
        if not dfs or (mode_u == "AND" and any(t not in dfs for t in qterms)):
            return []
        idf = {t: bm25_idf(self.n_docs, d) for t, d in dfs.items()}
        avgdl = field_avgdl_map(self.manifest, qterms)
        msm = len(qterms) if mode_u == "AND" else 1
        rows = self._rows_for(qterms)
        acc_d, acc_s = [], []
        for seg in sorted({s for m in rows.values() for s in m}):
            postings = {
                t: self._decode_cached(t, seg, rows[t][seg].blob)
                for t in qterms
                if seg in rows.get(t, {})
            }
            docs, scores = _msm_scores(postings, qterms, idf, avgdl, msm)
            if not docs.size:
                continue
            m = np.isin(docs, allowed, assume_unique=True)
            dead = self._deletes.get(seg)
            if dead is not None and dead.size:
                m &= ~np.isin(docs, dead, assume_unique=True)
            acc_d.append(docs[m])
            acc_s.append(scores[m])
        if not acc_d:
            return []
        docs, scores = _topk(np.concatenate(acc_d), np.concatenate(acc_s), k)
        return list(zip(docs.tolist(), scores.tolist()))

    def nested_match_ids(self, field: str, conditions: dict) -> np.ndarray:
        """Sorted live doc ids with ≥1 nested object satisfying ALL
        conditions — serving twin of IndexSearcher.nested_match_ids."""
        from . import nested as nst

        ids = nst.local_match_ids(self, field, conditions)
        dead_all = [
            d for d in self._deletes.values() if d is not None and d.size
        ]
        if dead_all and ids.size:
            dead = np.unique(np.concatenate(dead_all))
            ids = ids[~np.isin(ids, dead)]
        return ids

    def search_nested_terms(
        self, query, field: str, leaf: str, size: int = 10,
        mode: str = "OR", count: str = "docs",
    ) -> "list[tuple[str, int]]":
        """ES nested terms aggregation — serving twin (see
        operators/nested.local_nested_terms)."""
        from . import nested as nst

        return nst.local_nested_terms(
            self, query, field, leaf, size, mode, count
        )

    def nested_inner_hits(
        self, field: str, conditions: dict
    ) -> "list[tuple[int, int]]":
        """ES inner_hits — serving twin of
        IndexSearcher.nested_inner_hits: sorted (doc_id, obj) pairs of
        live objects satisfying ALL conditions."""
        from . import nested as nst

        return nst.local_inner_hits(self, field, conditions)

    def search_nested(
        self, query, field: str, conditions: dict, mode: str = "OR",
        k: int = 10,
    ) -> list[tuple[int, float]]:
        """BM25 top-k with an ES ``nested`` filter clause (all
        conditions within the SAME object) — serving twin of
        operators/nested.search_nested, bit-identical scores (same
        exhaustive _msm_scores kernel, filter context)."""
        from . import nested as nst
        from .bm25 import _msm_scores

        mode_u = mode.upper()
        if mode_u not in ("OR", "AND"):
            raise ValueError("search_nested supports OR/AND term queries")
        qterms = sorted(set(query))
        if not qterms:
            return []
        allowed = nst.local_match_ids(self, field, conditions)
        if not allowed.size:
            return []
        dfs = self.global_dfs(qterms)
        if not dfs or (mode_u == "AND" and any(t not in dfs for t in qterms)):
            return []
        idf = {t: bm25_idf(self.n_docs, d) for t, d in dfs.items()}
        avgdl = field_avgdl_map(self.manifest, qterms)
        msm = len(qterms) if mode_u == "AND" else 1
        rows = self._rows_for(qterms)
        acc_d, acc_s = [], []
        for seg in sorted({s for m in rows.values() for s in m}):
            postings = {
                t: self._decode_cached(t, seg, rows[t][seg].blob)
                for t in qterms
                if seg in rows.get(t, {})
            }
            docs, scores = _msm_scores(postings, qterms, idf, avgdl, msm)
            if not docs.size:
                continue
            m = np.isin(docs, allowed, assume_unique=True)
            dead = self._deletes.get(seg)
            if dead is not None and dead.size:
                m &= ~np.isin(docs, dead, assume_unique=True)
            acc_d.append(docs[m])
            acc_s.append(scores[m])
        if not acc_d:
            return []
        docs, scores = _topk(np.concatenate(acc_d), np.concatenate(acc_s), k)
        return list(zip(docs.tolist(), scores.tolist()))

    @staticmethod
    def _trunc_time(vals: np.ndarray, unit: str) -> np.ndarray:
        """Calendar truncation matching Spark date_trunc: hour/day are
        floors, week is the preceding Monday 00:00, month the 1st."""
        import pandas as pd

        s = pd.Series(vals)
        if unit == "hour":
            return s.dt.floor("h").to_numpy()
        if unit == "day":
            return s.dt.normalize().to_numpy()
        if unit == "week":
            d = s.dt.normalize()
            return (d - pd.to_timedelta(d.dt.weekday, unit="D")).to_numpy()
        if unit == "month":
            return s.dt.normalize().to_numpy().astype("datetime64[M]").astype("datetime64[us]")
        from .docvalues import CALENDAR_UNITS, DocValueError

        raise DocValueError(
            f"timestamp bucketing takes a calendar unit {CALENDAR_UNITS}, got {unit!r}"
        )

    def search_value_histogram(
        self, query, field: str, interval, mode: str = "OR",
        cumulative: bool = False,
    ) -> list[tuple]:
        """Histogram / date_histogram on a doc-value field — serving
        twin: [(bucket, doc_count)] sorted by bucket.
        ``cumulative=True`` = the cumulative_sum pipeline agg."""
        from .docvalues import DocValueError

        ids = self.matched_ids(query, mode)
        vals = self._dv_lookup(field, np.sort(ids))[1]
        if not vals.size:
            return []
        if np.issubdtype(vals.dtype, np.datetime64):
            buckets = self._trunc_time(vals, interval)
        else:
            iv = int(interval)
            if iv <= 0:
                raise DocValueError("numeric interval must be a positive int")
            buckets = vals.astype(np.int64) // iv * iv
        b, c = np.unique(buckets, return_counts=True)
        if cumulative:
            c = np.cumsum(c)
        return list(zip(b.tolist(), c.tolist()))

    def histogram_pipeline(
        self, query, field: str, interval, mode: str = "OR", *,
        dense: bool = False,
        cumulative: bool = False, derivative: bool = False,
        moving_avg: "int | None" = None, serial_diff: "int | None" = None,
        min_doc_count: "int | None" = None,
        sort_by: "tuple[str, str] | None" = None, size: "int | None" = None,
    ) -> list[tuple]:
        """ES pipeline aggregations over a histogram parent — serving
        twin of docvalues.histogram_pipeline: same column order
        (bucket, doc_count[, cum_count][, derivative][, moving_avg]
        [, serial_diff]), same evaluation order (pipeline metrics →
        bucket_selector → bucket_sort), same exact integer window sums
        (moving_avg = Σwindow/|window| over int64, bit-identical to the
        distributed F.avg of longs)."""
        from .docvalues import _SORTABLE, DocValueError

        rows = self.search_value_histogram(query, field, interval, mode)
        if dense and rows:
            import pandas as pd

            from .docvalues import CALENDAR_UNITS

            if interval in CALENDAR_UNITS:
                freq = {"hour": "h", "day": "D", "week": "7D", "month": "MS"}[
                    interval
                ]
                present = {pd.Timestamp(b): v for b, v in rows}
                spine = pd.date_range(
                    pd.Timestamp(rows[0][0]), pd.Timestamp(rows[-1][0]),
                    freq=freq,
                )
                rows = [
                    (b.to_pydatetime(), present.get(b, 0)) for b in spine
                ]
            else:
                present = dict(rows)
                iv = int(interval)
                rows = [
                    (b, present.get(b, 0))
                    for b in range(int(rows[0][0]), int(rows[-1][0]) + 1, iv)
                ]
        buckets = [r[0] for r in rows]
        c = np.asarray([r[1] for r in rows], dtype=np.int64)
        cols: dict[str, list] = {
            "bucket": buckets,
            "doc_count": c.tolist(),
        }
        if cumulative:
            cols["cum_count"] = np.cumsum(c).tolist()
        if derivative:
            cols["derivative"] = [None] + (c[1:] - c[:-1]).astype(
                np.float64
            ).tolist()
        if moving_avg is not None:
            mw = int(moving_avg)
            if mw <= 0:
                raise DocValueError("moving_avg window must be a positive int")
            cs = np.concatenate([[0], np.cumsum(c)])
            mv = []
            for i in range(c.size):
                lo = max(0, i - mw + 1)
                mv.append(float(cs[i + 1] - cs[lo]) / (i + 1 - lo))
            cols["moving_avg"] = mv
        if serial_diff is not None:
            lag_n = int(serial_diff)
            if lag_n <= 0:
                raise DocValueError("serial_diff lag must be a positive int")
            cols["serial_diff"] = [None] * min(lag_n, c.size) + (
                c[lag_n:] - c[:-lag_n]
            ).astype(np.float64).tolist()
        names = list(cols)
        out = [tuple(cols[n][i] for n in names) for i in range(c.size)]
        if min_doc_count is not None:
            m = int(min_doc_count)
            out = [r for r in out if r[1] >= m]
        if sort_by is not None:
            col, direction = sort_by
            if col not in names or col not in _SORTABLE:
                raise DocValueError(
                    f"bucket_sort key {col!r} is not a computed column "
                    f"(have {names})"
                )
            if direction not in ("asc", "desc"):
                raise DocValueError("bucket_sort direction must be asc|desc")
            j = names.index(col)
            if col == "bucket":
                out.sort(key=lambda r: r[0], reverse=(direction == "desc"))
            else:
                # numeric keys; Spark NULL order (asc NULLS FIRST, desc
                # NULLS LAST) == treating NULL as -inf in both, so
                # negating the filled value for desc puts NULLs last
                sgn = 1.0 if direction == "asc" else -1.0
                out.sort(
                    key=lambda r: (
                        sgn * (float("-inf") if r[j] is None else float(r[j])),
                        r[0],
                    )
                )
        if size is not None:
            out = out[: int(size)]
        return out

    def bucket_stat(
        self, query, field: str, interval, stat: str, mode: str = "OR"
    ) -> list[tuple]:
        """ES sibling pipeline aggs (max/min/avg/sum _bucket) — serving
        twin of docvalues.bucket_stat: [(bucket, value)], max/min emit
        every tying bucket ascending, avg/sum one (None, value) row."""
        from .docvalues import DocValueError

        stat_l = str(stat).lower()
        if stat_l not in ("max", "min", "avg", "sum"):
            raise DocValueError("bucket_stat takes stat in {max, min, avg, sum}")
        rows = self.search_value_histogram(query, field, interval, mode)
        c = np.asarray([r[1] for r in rows], dtype=np.int64)
        if stat_l == "sum":
            return [(None, float(c.sum()) if c.size else None)]
        if stat_l == "avg":
            return [(None, float(c.sum()) / c.size if c.size else None)]
        if not c.size:
            return []
        ext = c.max() if stat_l == "max" else c.min()
        return [(b, float(n)) for b, n in rows if n == ext]

    def search_percentiles(
        self, query, field: str, percents=(0.25, 0.5, 0.75, 0.95),
        mode: str = "OR",
    ) -> list[tuple[float, float]]:
        """ES percentiles aggregation — serving twin: [(pct, value)]
        ordered by pct; np.quantile linear interpolation matches the
        distributed Spark ``percentile`` bit-for-bit."""
        from .docvalues import DocValueError

        pcts = [float(p) for p in percents]
        if not pcts or any(not 0.0 <= p <= 1.0 for p in pcts):
            raise DocValueError("percents must be fractions in [0, 1]")
        ids = self.matched_ids(query, mode)
        vals = self._dv_lookup(field, np.sort(ids))[1]
        if np.issubdtype(vals.dtype, np.datetime64):
            raise DocValueError(
                "percentiles takes a numeric doc-value field — epoch-cast "
                "timestamp fields upstream"
            )
        if not vals.size:
            return []
        qs = np.quantile(vals.astype(np.float64), pcts, method="linear")
        return sorted(zip(pcts, qs.tolist()))

    def search_range_buckets(
        self, query, field: str, ranges, mode: str = "OR"
    ) -> list[tuple[str, int]]:
        """ES range aggregation — serving twin: [(key, doc_count)]
        ordered by key; [lo, hi) buckets, either bound None, overlaps
        and empty buckets per ES."""
        import pandas as pd

        from .docvalues import check_range_buckets

        rngs = check_range_buckets(ranges)
        ids = self.matched_ids(query, mode)
        vals = (
            self._dv_lookup(field, np.sort(ids))[1]
            if ids.size
            else np.array([], np.float64)
        )
        is_time = np.issubdtype(vals.dtype, np.datetime64)
        out = []
        for key, lo, hi in rngs:
            if is_time:
                lo = None if lo is None else np.datetime64(pd.Timestamp(lo))
                hi = None if hi is None else np.datetime64(pd.Timestamp(hi))
            m = np.ones(len(vals), bool)
            if lo is not None:
                m &= vals >= lo
            if hi is not None:
                m &= vals < hi
            out.append((key, int(m.sum())))
        return sorted(out)

    def search_collapse(
        self, query, field: str, k: int = 10, mode: str = "OR"
    ) -> list[tuple]:
        """ES field collapsing — serving twin of
        docvalues.search_collapse: [(value, doc_id, score)] keeping
        only the best-scoring live hit per distinct field value, by
        (score desc, doc_id asc); scores bit-identical to the
        distributed path (same exhaustive _msm_scores kernel)."""
        import pandas as pd

        from .bm25 import _msm_scores

        mode_u = mode.upper()
        if mode_u not in ("OR", "AND"):
            raise ValueError("search_collapse supports OR/AND term queries")
        qterms = sorted(set(query))
        if not qterms:
            return []
        dfs = self.global_dfs(qterms)
        if not dfs or (mode_u == "AND" and any(t not in dfs for t in qterms)):
            return []
        idf = {t: bm25_idf(self.n_docs, d) for t, d in dfs.items()}
        avgdl = field_avgdl_map(self.manifest, qterms)
        msm = len(qterms) if mode_u == "AND" else 1
        rows = self._rows_for(qterms)
        acc_d, acc_s = [], []
        for seg in sorted({s for m in rows.values() for s in m}):
            postings = {
                t: self._decode_cached(t, seg, rows[t][seg].blob)
                for t in qterms
                if seg in rows.get(t, {})
            }
            docs, scores = _msm_scores(postings, qterms, idf, avgdl, msm)
            if not docs.size:
                continue
            dead = self._deletes.get(seg)
            if dead is not None and dead.size:
                m = ~np.isin(docs, dead, assume_unique=True)
                docs, scores = docs[m], scores[m]
            acc_d.append(docs)
            acc_s.append(scores)
        if not acc_d:
            return []
        docs = np.concatenate(acc_d)
        scores = np.concatenate(acc_s)
        present, values = self._dv_lookup(field, docs)
        pdf = pd.DataFrame(
            {
                "value": values,
                "doc_id": docs[present],
                "score": scores[present],
            }
        ).sort_values(["score", "doc_id"], ascending=[False, True], kind="mergesort")
        pdf = pdf.drop_duplicates("value", keep="first").head(int(k))
        return list(
            zip(pdf["value"].tolist(), pdf["doc_id"].tolist(), pdf["score"].tolist())
        )

    def search_field_stats(
        self, query, field: str, mode: str = "OR", extended: bool = False
    ) -> dict:
        """ES stats / extended_stats on a numeric doc-value field —
        serving twin: {n_hits, min_v, max_v, sum_v, avg_v} (+
        variance_pop/std_pop when extended)."""
        from .docvalues import DocValueError

        ids = self.matched_ids(query, mode)
        vals = self._dv_lookup(field, np.sort(ids))[1]
        if np.issubdtype(vals.dtype, np.datetime64):
            raise DocValueError(
                "field stats take a numeric doc-value field — epoch-cast "
                "timestamp fields upstream"
            )
        if not vals.size:
            base = {
                "n_hits": 0, "min_v": None, "max_v": None,
                "sum_v": None, "avg_v": None,
            }
            if extended:
                base.update({"variance_pop": None, "std_pop": None})
            return base
        out = {
            "n_hits": int(len(vals)),
            "min_v": vals.min().item(),
            "max_v": vals.max().item(),
            "sum_v": vals.sum().item(),
            "avg_v": float(vals.sum().item() / len(vals)),
        }
        if extended:
            v = vals.astype(np.float64)
            out["variance_pop"] = float(np.var(v))
            out["std_pop"] = float(np.std(v))
        return out

    def search_grouped_tophits(
        self, query, field: str, n_buckets: int = 5, per_bucket: int = 3,
        mode: str = "OR",
    ) -> list[tuple]:
        """ES terms agg + top_hits sub-agg — serving twin of
        docvalues.search_grouped_tophits: [(value, rank, doc_id,
        score)] — top n_buckets values by best hit, each with its top
        per_bucket hits, ordered (bucket best desc, value asc, rank)."""
        import pandas as pd

        from .bm25 import _msm_scores

        mode_u = mode.upper()
        if mode_u not in ("OR", "AND"):
            raise ValueError(
                "search_grouped_tophits supports OR/AND term queries"
            )
        qterms = sorted(set(query))
        if not qterms:
            return []
        dfs = self.global_dfs(qterms)
        if not dfs or (mode_u == "AND" and any(t not in dfs for t in qterms)):
            return []
        idf = {t: bm25_idf(self.n_docs, d) for t, d in dfs.items()}
        avgdl = field_avgdl_map(self.manifest, qterms)
        msm = len(qterms) if mode_u == "AND" else 1
        rows = self._rows_for(qterms)
        acc_d, acc_s = [], []
        for seg in sorted({s for m in rows.values() for s in m}):
            postings = {
                t: self._decode_cached(t, seg, rows[t][seg].blob)
                for t in qterms
                if seg in rows.get(t, {})
            }
            docs, scores = _msm_scores(postings, qterms, idf, avgdl, msm)
            if not docs.size:
                continue
            dead = self._deletes.get(seg)
            if dead is not None and dead.size:
                m = ~np.isin(docs, dead, assume_unique=True)
                docs, scores = docs[m], scores[m]
            acc_d.append(docs)
            acc_s.append(scores)
        if not acc_d:
            return []
        docs = np.concatenate(acc_d)
        scores = np.concatenate(acc_s)
        present, values = self._dv_lookup(field, docs)
        pdf = pd.DataFrame(
            {
                "value": values,
                "doc_id": docs[present],
                "score": scores[present],
            }
        ).sort_values(["score", "doc_id"], ascending=[False, True], kind="mergesort")
        hits = pdf.groupby("value", sort=False).head(int(per_bucket)).copy()
        hits["rank"] = hits.groupby("value", sort=False).cumcount() + 1
        best = (
            hits.groupby("value", sort=False)["score"]
            .max()
            .reset_index(name="best")
            .sort_values(["best", "value"], ascending=[False, True], kind="mergesort")
            .head(int(n_buckets))
        )
        out = hits.merge(best, on="value").sort_values(
            ["best", "value", "rank"], ascending=[False, True, True], kind="mergesort"
        )
        return list(
            zip(
                out["value"].tolist(),
                out["rank"].tolist(),
                out["doc_id"].tolist(),
                out["score"].tolist(),
            )
        )

    def search_cardinality(self, query, field: str, mode: str = "OR") -> int:
        """Exact distinct doc-value count among matching live docs."""
        ids = self.matched_ids(query, mode)
        if not ids.size:
            return 0
        vals = self._dv_lookup(field, np.sort(ids), allow_array=True)[1]
        if field in self._dv_array_fields:
            if not len(vals):
                return 0
            vals = np.concatenate(list(vals))
        return int(len(np.unique(vals)))

    def significant_terms(
        self, query, field: str, size: int = 10, mode: str = "OR"
    ) -> list[tuple]:
        """significant_terms by relative-frequency lift — serving twin:
        [(value, fg_count, bg_count, lift)] by (lift desc, value asc)."""
        fg_ids = np.sort(self.matched_ids(query, mode))
        if not fg_ids.size:
            return []
        bg_ids = self.matched_ids(None)

        def _vals(ids):
            v = self._dv_lookup(field, ids, allow_array=True)[1]
            if field in self._dv_array_fields:
                v = (
                    np.concatenate([np.unique(x) for x in v])
                    if len(v)
                    else np.array([], dtype=object)
                )
            return v

        fg_v, fg_c = np.unique(_vals(fg_ids), return_counts=True)
        bg_v, bg_c = np.unique(_vals(bg_ids), return_counts=True)
        bg_map = dict(zip(bg_v.tolist(), bg_c.tolist()))
        fg_total, bg_total = int(fg_c.sum()), int(bg_c.sum())
        out = []
        for v, c in zip(fg_v.tolist(), fg_c.tolist()):
            bc = bg_map.get(v)
            if bc is None:
                continue
            out.append((v, int(c), int(bc), (c / fg_total) / (bc / bg_total)))
        out.sort(key=lambda r: (-r[3], r[0]))
        return out[: int(size)]

    def search_decay(
        self, query, field: str, origin, scale: float, decay: float = 0.5,
        offset: float = 0.0, fn: str = "gauss", mode: str = "OR",
        k: int = 10,
    ) -> list[tuple[int, float]]:
        """function_score decay — serving twin of
        docvalues.search_decay, bit-identical (same exhaustive scoring
        kernel, same float64 decay_factors; docs missing the field
        keep factor 1.0 per ES)."""
        from .bm25 import _topk
        from .docvalues import check_decay, decay_factors, dv_float, origin_float

        check_decay(fn, scale, decay, offset)
        mode_u = mode.upper()
        if mode_u == "BOOL":
            # boolean filter + decay ("recent docs matching the
            # filter"); k=n_docs keeps every path exact — the floor
            # never rises, so nothing prunes
            full = self.search_bool(query, k=self.n_docs)
        elif mode_u in ("OR", "AND"):
            qterms = sorted(set(query))
            if not qterms:
                return []
            full = self.search(
                qterms, mode=mode_u, k=self.n_docs, algo="exhaustive"
            )
        else:
            raise ValueError("search_decay supports OR/AND term queries or BOOL")
        if not full:
            return []
        docs = np.fromiter((d for d, _ in full), np.int64, len(full))
        scores = np.fromiter((s for _, s in full), np.float64, len(full))
        present, vals = self._dv_lookup(field, docs)
        is_time = np.issubdtype(vals.dtype, np.datetime64)
        factors = np.ones(len(docs), dtype=np.float64)
        factors[present] = decay_factors(
            dv_float(vals),
            origin_float(origin, is_time),
            float(scale),
            float(decay),
            float(offset),
            fn,
        )
        docs, scores = _topk(docs, scores * factors, k)
        return list(zip(docs.tolist(), scores.tolist()))

    def search_field_value_factor(
        self, query, field: str, factor: float = 1.0,
        modifier: str = "log1p", missing: float = 1.0, mode: str = "OR",
        k: int = 10,
    ) -> list[tuple[int, float]]:
        """function_score field_value_factor — serving twin of
        docvalues.search_field_value_factor, bit-identical (same
        exhaustive kernel, same float64 modifier; absent docs take the
        ``missing`` substitute)."""
        from .bm25 import _topk
        from .docvalues import (
            FVF_MODIFIERS,
            DocValueError,
            dv_float,
            fvf_factor_values,
        )

        mode_u = mode.upper()
        if mode_u not in ("OR", "AND"):
            raise ValueError(
                "search_field_value_factor supports OR/AND term queries"
            )
        if modifier not in FVF_MODIFIERS:
            raise DocValueError(
                f"field_value_factor modifier must be one of {FVF_MODIFIERS}"
            )
        qterms = sorted(set(query))
        if not qterms:
            return []
        full = self.search(qterms, mode=mode_u, k=self.n_docs, algo="exhaustive")
        if not full:
            return []
        docs = np.fromiter((d for d, _ in full), np.int64, len(full))
        scores = np.fromiter((s for _, s in full), np.float64, len(full))
        present, vals = self._dv_lookup(field, docs)
        if np.issubdtype(vals.dtype, np.datetime64):
            raise DocValueError(
                "field_value_factor takes a numeric doc-value field — use "
                "search_decay for timestamp boosts"
            )
        missing_factor = float(
            fvf_factor_values(np.array([float(missing)]), factor, modifier)[0]
        )
        factors = np.full(len(docs), missing_factor, dtype=np.float64)
        factors[present] = fvf_factor_values(dv_float(vals), factor, modifier)
        docs, scores = _topk(docs, scores * factors, k)
        return list(zip(docs.tolist(), scores.tolist()))

    def search_random_score(
        self, query, seed: int = 0, mode: str = "OR", k: int = 10
    ) -> list[tuple[int, float]]:
        """function_score random_score — serving twin of
        docvalues.search_random_score, bit-identical (same pinned
        two-round minstd hash per doc id)."""
        from .bm25 import _topk
        from .docvalues import random_score_values

        mode_u = mode.upper()
        if mode_u not in ("OR", "AND"):
            raise ValueError("search_random_score supports OR/AND term queries")
        qterms = sorted(set(query))
        if not qterms:
            return []
        full = self.search(qterms, mode=mode_u, k=self.n_docs, algo="exhaustive")
        if not full:
            return []
        docs = np.fromiter((d for d, _ in full), np.int64, len(full))
        scores = np.fromiter((s for _, s in full), np.float64, len(full))
        factors = random_score_values(docs, int(seed))
        docs, scores = _topk(docs, scores * factors, k)
        return list(zip(docs.tolist(), scores.tolist()))

    def search_missing(self, query, field: str, mode: str = "OR") -> int:
        """ES missing aggregation — serving twin of
        docvalues.search_missing: matched live docs with no value for
        ``field``."""
        ids = self.matched_ids(query, mode)
        if not ids.size:
            return 0
        present, _ = self._dv_lookup(field, np.sort(ids), allow_array=True)
        return int(len(ids) - int(present.sum()))

    def _two_field_vals(self, query, f1: str, f2: str, mode: str):
        """(x, y) float64 arrays over matching live docs holding BOTH
        scalar numeric fields — twin of docvalues._two_field_rows."""
        from .docvalues import DocValueError

        ids = np.sort(self.matched_ids(query, mode))
        out = []
        masks = []
        for f in (f1, f2):
            present, vals = self._dv_lookup(f, ids)
            if np.issubdtype(vals.dtype, np.datetime64):
                raise DocValueError(
                    f"{f!r} is a timestamp field — epoch-cast it upstream "
                    "for two-field metric aggregations"
                )
            full = np.zeros(len(ids), dtype=np.float64)
            full[present] = vals.astype(np.float64)
            out.append(full)
            masks.append(present)
        both = masks[0] & masks[1]
        return out[0][both], out[1][both]

    def search_weighted_avg(
        self, query, field: str, weight_field: str, mode: str = "OR"
    ) -> tuple[int, float, float]:
        """ES weighted_avg — serving twin of
        docvalues.search_weighted_avg: (n, weight_sum, wavg); docs
        missing either field are skipped."""
        v, w = self._two_field_vals(query, field, weight_field, mode)
        if not v.size:
            return 0, None, None
        ws = float(np.sum(w))
        return int(v.size), ws, float(np.sum(v * w)) / ws

    def search_matrix_stats(
        self, query, field_x: str, field_y: str, mode: str = "OR"
    ) -> tuple:
        """ES matrix_stats for a field pair — serving twin of
        docvalues.search_matrix_stats: (n, mean_x, mean_y, var_x,
        var_y, cov, corr), population moments from the same raw sums."""
        x, y = self._two_field_vals(query, field_x, field_y, mode)
        if not x.size:
            return 0, None, None, None, None, None, None
        n = float(x.size)
        sx, sy = float(np.sum(x)), float(np.sum(y))
        sxx, syy = float(np.sum(x * x)), float(np.sum(y * y))
        sxy = float(np.sum(x * y))
        mean_x, mean_y = sx / n, sy / n
        var_x = sxx / n - mean_x * mean_x
        var_y = syy / n - mean_y * mean_y
        cov = sxy / n - mean_x * mean_y
        import math

        return (
            int(x.size), mean_x, mean_y, var_x, var_y, cov,
            cov / math.sqrt(var_x * var_y),
        )

    def search_value_terms(
        self, query, field: str, size: int = 10, after=None,
        mode: str = "OR",
    ) -> list[tuple]:
        """ES composite agg (one terms source, after-key paging) —
        serving twin of docvalues.search_value_terms: [(value,
        doc_count)] ascending by value, strictly after ``after``."""
        ids = self.matched_ids(query, mode)
        if not ids.size:
            return []
        vals = self._dv_lookup(field, np.sort(ids), allow_array=True)[1]
        if field in self._dv_array_fields:
            # multi-valued: one count per distinct value per doc
            vals = (
                np.concatenate([np.unique(x) for x in vals])
                if len(vals)
                else np.array([], dtype=object)
            )
        if after is not None and np.issubdtype(vals.dtype, np.datetime64):
            import pandas as pd

            after = np.datetime64(pd.Timestamp(after))
        v, c = np.unique(vals, return_counts=True)
        if after is not None:
            keep = v > after
            v, c = v[keep], c[keep]
        return [
            (val, int(cnt))
            for val, cnt in zip(v[: int(size)].tolist(), c[: int(size)].tolist())
        ]

    def search_multi_terms(
        self, query, fields: list[str], size: int = 10, mode: str = "OR"
    ) -> list[tuple]:
        """ES multi_terms — serving twin of
        docvalues.search_multi_terms: compound-key buckets, docs
        missing any key field skipped, (count desc, keys asc)."""
        from .docvalues import DocValueError

        if len(fields) < 2:
            raise DocValueError("multi_terms needs at least two fields")
        ids = np.sort(self.matched_ids(query, mode))
        if not ids.size:
            return []
        cols, mask = [], np.ones(len(ids), dtype=bool)
        for f in fields:
            present, vals = self._dv_lookup(f, ids)
            full = np.empty(len(ids), dtype=object)
            full[present] = vals.tolist() if hasattr(vals, "tolist") else vals
            mask &= present
            cols.append(full)
        from collections import Counter

        keys = Counter(
            tuple(col[i] for col in cols)
            for i in range(len(ids))
            if mask[i]
        )
        out = sorted(keys.items(), key=lambda t: (-t[1], t[0]))[: int(size)]
        return [(*k, int(c)) for k, c in out]

    def search_top_metrics(
        self, query, sort_field: str, metric_fields: list[str],
        ascending: bool = False, size: int = 1, mode: str = "OR",
    ) -> list[tuple]:
        """ES top_metrics — serving twin of
        docvalues.search_top_metrics: metric values of the top docs by
        a field sort; absent metrics are None."""
        top = self.search_sorted(query, sort_field, ascending, size, mode)
        out = []
        for doc, sv in top:
            docs = np.asarray([doc], np.int64)
            row = [doc, sv]
            for f in metric_fields:
                present, vals = self._dv_lookup(f, docs, allow_array=True)
                row.append(vals[0] if present[0] else None)
            out.append(tuple(row))
        return out

    def search_terms_set(
        self, terms: list[str], m_field: str, k: int = 10
    ) -> list[tuple[int, float]]:
        """ES terms_set — serving twin of docvalues.search_terms_set,
        bit-identical: per-doc required count from the doc's own
        ``m_field`` value (clamped ≥1; docs missing the field never
        match), disjunctive-sum scoring over held terms."""
        from functools import reduce

        from .bm25 import _adl, _mask_deleted, bm25_tf_weight
        from .docvalues import DocValueError, dv_float

        qterms = sorted(set(terms))
        if not qterms:
            return []
        dfs = self.global_dfs(qterms)
        if not dfs:
            return []
        idf = {t: bm25_idf(self.n_docs, d) for t, d in dfs.items()}
        avgdl = field_avgdl_map(self.manifest, qterms)
        rows = self._rows_for(qterms)
        acc_d = np.array([], np.int64)
        acc_s = np.array([], np.float64)
        for seg in sorted({s for m in rows.values() for s in m}):
            postings = {
                t: self._decode_cached(t, seg, rows[t][seg].blob)
                for t in qterms
                if seg in rows.get(t, {})
            }
            postings = _mask_deleted(postings, self._deletes.get(seg))
            present = [t for t in qterms if t in postings]
            if not present:
                continue
            all_docs = reduce(np.union1d, (postings[t][0] for t in present))
            if not all_docs.size:
                continue
            scores = np.zeros(all_docs.size, np.float64)
            nmatch = np.zeros(all_docs.size, np.int64)
            for t in present:
                d, tf, dlen = postings[t]
                idx = np.searchsorted(all_docs, d)
                scores[idx] += idf[t] * bm25_tf_weight(tf, dlen, _adl(avgdl, t))
                nmatch[idx] += 1
            ok, m = self._dv_lookup(m_field, all_docs)
            if np.issubdtype(m.dtype, np.datetime64):
                raise DocValueError("terms_set needs a numeric requirement field")
            keep = ok.copy()
            keep[ok] &= nmatch[ok] >= np.maximum(dv_float(m), 1.0)
            if keep.any():
                acc_d, acc_s = _topk(
                    np.concatenate([acc_d, all_docs[keep]]),
                    np.concatenate([acc_s, scores[keep]]),
                    k,
                )
        return list(zip(acc_d.tolist(), acc_s.tolist()))

    def search_rare_terms(
        self, query, field: str, max_doc_count: int = 1, size: int = 100,
        mode: str = "OR",
    ) -> list[tuple]:
        """ES rare_terms — serving twin of docvalues.search_rare_terms:
        [(value, doc_count)] with doc_count <= max_doc_count, ordered
        (doc_count asc, value asc), exact."""
        from .docvalues import DocValueError

        if int(max_doc_count) <= 0:
            raise DocValueError(
                "rare_terms max_doc_count must be a positive int"
            )
        ids = self.matched_ids(query, mode)
        if not ids.size:
            return []
        vals = self._dv_lookup(field, np.sort(ids), allow_array=True)[1]
        if field in self._dv_array_fields:
            vals = (
                np.concatenate([np.unique(x) for x in vals])
                if len(vals)
                else np.array([], dtype=object)
            )
        v, c = np.unique(vals, return_counts=True)
        keep = c <= int(max_doc_count)
        out = sorted(
            zip(v[keep].tolist(), c[keep].tolist()),
            key=lambda t: (t[1], t[0]),
        )[: int(size)]
        return [(val, int(cnt)) for val, cnt in out]

    def search_bucket_metrics(
        self, query, bucket_field: str, interval, metric_field: str,
        mode: str = "OR",
    ) -> list[tuple]:
        """Bucket + metric sub-agg — serving twin of
        docvalues.search_bucket_metrics: [(bucket, doc_count, min_v,
        sum_v, avg_v, max_v)] ascending by bucket.  NULL bucket value
        drops the doc; NULL metric value counts in doc_count only."""
        from .docvalues import DocValueError

        ids = np.sort(self.matched_ids(query, mode))
        bpresent, bvals = self._dv_lookup(bucket_field, ids)
        ids = ids[bpresent]
        if not ids.size:
            return []
        if np.issubdtype(bvals.dtype, np.datetime64):
            buckets = self._trunc_time(bvals, interval)
        else:
            iv = int(interval)
            if iv <= 0:
                raise DocValueError("numeric interval must be a positive int")
            buckets = (bvals // iv) * iv
        mpresent, mvals = self._dv_lookup(metric_field, ids)
        out = []
        uniq = np.unique(buckets)
        # .tolist() keeps the bucket representation identical to
        # search_value_histogram's (datetime for time buckets)
        for b, bv in zip(uniq, uniq.tolist()):
            in_b = buckets == b
            mv = mvals[in_b[mpresent]]
            if mv.size:
                out.append(
                    (
                        bv, int(in_b.sum()), mv.min().item(),
                        mv.sum().item(), float(mv.sum()) / len(mv),
                        mv.max().item(),
                    )
                )
            else:
                out.append((bv, int(in_b.sum()), None, None, None, None))
        return out

    def search_filters(
        self, filters: "dict[str, str]"
    ) -> list[tuple[str, int]]:
        """ES ``filters`` aggregation — named boolean filters, each
        with its live match count; [(name, doc_count)] in name order
        (serving twin of IndexSearcher.search_filters)."""
        self._reject_pure_negation(filters)
        return [
            (name, int(len(self.matched_ids(q, "BOOL"))))
            for name, q in sorted(filters.items())
        ]

    def _reject_pure_negation(self, filters: "dict[str, str]") -> None:
        """Counting aggregations must fail loud on a pure-negation
        filter ('NOT lang:en'): its match set is a complement, which
        the shared match kernel maps to 0 — plausible but wrong
        (ADVICE r5).  Same check as IndexSearcher.search_filters."""
        from ..functions import boolquery as bq

        af = set(analyzed_fields_of(self.manifest))
        dvf = dv_filter_fields_of(self.manifest)
        for name, q in filters.items():
            if bq.is_pure_negation(
                bq.parse(q, analyzed_fields=af, dv_fields=dvf)
            ):
                raise bq.QueryParseError(
                    f"filter {name!r} is pure negation (unbounded match "
                    "set) — rewrite as '<positive> AND NOT ...'"
                )

    def significant_text(
        self,
        texts: "dict[int, str]",
        query,
        size: int = 10,
        sample_size: int = 200,
        mode: str = "OR",
        min_doc_count: int = 3,
    ) -> list[tuple]:
        """significant_text — serving twin of
        IndexSearcher.significant_text over caller-provided doc texts
        (same contract as LocalSearcher.highlight): [(term, fg_count,
        bg_count, lift)] by (lift desc, term asc)."""
        from collections import Counter

        from ..functions.tokenize import py_tokenize

        if isinstance(query, str):
            hits = self.search_bool(query, k=sample_size)
        else:
            hits = self.search(sorted(set(query)), mode=mode, k=sample_size)
        if not hits:
            return []
        ids = [d for d, _s in hits]
        sample_n = len(ids)
        fg: Counter = Counter()
        for d in ids:
            fg.update(set(py_tokenize(texts[d])))
        kept = {t: c for t, c in fg.items() if c >= int(min_doc_count)}
        if not kept:
            return []
        dfs = self.global_dfs(sorted(kept))
        out = [
            (t, c, dfs[t], (c / sample_n) / (dfs[t] / self.n_docs))
            for t, c in kept.items()
            if t in dfs
        ]
        out.sort(key=lambda r: (-r[3], r[0]))
        return out[: int(size)]

    def search_adjacency(self, filters: "dict[str, str]") -> list[tuple]:
        """adjacency_matrix — serving twin of
        IndexSearcher.search_adjacency: [(key, doc_count)] sorted, keys
        ``a`` and ``a&b`` (names sorted), empty pairs omitted."""
        from itertools import combinations

        self._reject_pure_negation(filters)
        sets = {
            name: set(self.matched_ids(q, "BOOL").tolist())
            for name, q in sorted(filters.items())
        }
        for name in sets:
            if "&" in name:
                raise ValueError(f"filter name {name!r} may not contain '&'")
        out = [(n, len(ids)) for n, ids in sets.items()]
        for a, b in combinations(sorted(sets), 2):
            inter = sets[a] & sets[b]
            if inter:
                out.append((f"{a}&{b}", len(inter)))
        return sorted(out)

    def termvectors(
        self, text: str, with_df: bool = True
    ) -> "list[tuple[str, int, int, list[int]]]":
        """ES ``_termvectors`` — serving twin of
        IndexSearcher.termvectors over a caller-provided document text
        (same contract as LocalSearcher.highlight): [(term, tf, df,
        positions)] term-ascending, df from this searcher's termdict."""
        from ..functions.tokenize import py_termvector

        tv = py_termvector(text)
        dfs = (
            self.global_dfs(sorted(t for t, _tf, _p in tv))
            if with_df
            else {}
        )
        return [(t, tf, int(dfs.get(t, 0)), pos) for t, tf, pos in tv]

    def suggest_phrase(
        self,
        text: str,
        size: int = 5,
        max_edits: int = 1,
        max_errors: int = 1,
        per_term: int = 5,
        collate: bool = False,
    ) -> "list[tuple[str, float]]":
        """ES phrase suggester — serving twin of
        IndexSearcher.suggest_phrase (same termdict candidates, same
        beam/LM kernel, identical rows): [(suggestion, score)] by
        (score desc, suggestion asc)."""
        from .bm25 import _phrase_suggest_rows

        return _phrase_suggest_rows(
            self, text, size, max_edits, max_errors, per_term, collate,
            lambda ts: self.search_count(sorted(set(ts)), "AND"),
        )

    def more_like_this(
        self,
        like_text: str,
        k: int = 10,
        max_query_terms: int = 25,
        min_term_freq: int = 1,
        min_doc_freq: int = 2,
    ) -> list[tuple[int, float]]:
        """ES more_like_this — serving twin: identical tf·idf term
        selection (IndexSearcher._mlt_terms via the same global_dfs
        shape) + disjunctive BM25."""
        from collections import Counter

        from ..functions.tokenize import py_tokenize
        from .index_build import bm25_idf as _idf

        tf = Counter(py_tokenize(like_text))
        cand = sorted(t for t, c in tf.items() if c >= min_term_freq)
        if not cand:
            return []
        dfs = self.global_dfs(cand)
        scored = [
            (tf[t] * _idf(self.n_docs, dfs[t]), t)
            for t in cand
            if dfs.get(t, 0) >= max(min_doc_freq, 1)
        ]
        top = [
            t
            for _s, t in sorted(scored, key=lambda x: (-x[0], x[1]))[
                :max_query_terms
            ]
        ]
        if not top:
            return []
        return self.search(top, mode="OR", k=k)

    def suggest_terms(
        self,
        prefix: str,
        size: int = 10,
        max_edits: int = 0,
        max_expansions: int = 10_000,
    ) -> list[tuple[str, int]]:
        """ES term suggester — serving twin: [(term, global df)] by
        (df desc, term asc), termdict-only."""
        terms = (
            self.expand_fuzzy(prefix, max_edits, max_expansions=max_expansions)
            if max_edits > 0
            else self.expand_prefix(prefix, max_expansions)
        )
        if not terms:
            return []
        dfs = self.global_dfs(terms)
        return sorted(dfs.items(), key=lambda x: (-x[1], x[0]))[:size]

    def explain(
        self, doc_id: int, terms: list[str]
    ) -> list[tuple[str, int, int, int, float, float]]:
        """ES ``_explain`` — serving twin: [(term, tf, df, doc_len,
        idf, contrib)] sorted by term; contribs sum to the doc's OR
        score bit-identically."""
        terms_sorted = sorted(set(terms))
        dfs = self.global_dfs(terms_sorted)
        g = self.manifest["globals"]
        dpp = int(g["docs_per_part"])
        seg_group = int(self.manifest["params"]["seg_group"])
        seg = (int(doc_id) // dpp) // seg_group
        rows = self._rows_for(terms_sorted)
        out = []
        for t in terms_sorted:
            r = rows.get(t, {}).get(seg)
            if r is None or t not in dfs:
                continue
            d, tf, dl = self._decode_cached(t, seg, r.blob)
            i = int(np.searchsorted(d, int(doc_id)))
            if i >= len(d) or d[i] != int(doc_id):
                continue
            idf = bm25_idf(self.n_docs, dfs[t])
            w = float(
                bm25_tf_weight(
                    np.array([tf[i]], np.float64),
                    np.array([dl[i]], np.float64),
                    self.avgdl,
                )[0]
            )
            out.append((t, int(tf[i]), int(dfs[t]), int(dl[i]), idf, idf * w))
        return out

    def match_positions(
        self, doc_ids: list[int], terms: list[str]
    ) -> list[tuple[int, str, int]]:
        """Highlighting primitive — serving twin of
        IndexSearcher.match_positions: [(doc_id, term, pos)] sorted."""
        if not self.manifest["params"].get("with_positions", True):
            raise ValueError(
                "match_positions needs positional postings, but this index "
                "was built with with_positions=False"
            )
        terms_sorted = sorted(set(terms))
        targets = np.unique(np.asarray(sorted(doc_ids), dtype=np.int64))
        tbl = self._term_rows(
            terms_sorted, ["term", "segment", "blob", "pos_blob"]
        )
        out = []
        for i in range(tbl.num_rows):
            t = tbl["term"][i].as_py()
            seg = int(tbl["segment"][i].as_py())
            d, tf, _dl = self._decode_cached(t, seg, tbl["blob"][i])
            hit_idx = np.flatnonzero(np.isin(d, targets, assume_unique=True))
            if not hit_idx.size:
                continue
            pos, offs = self._pos_cached(t, seg, tbl["pos_blob"][i], tf)
            for j in hit_idx:
                for x in pos[offs[j] : offs[j + 1]]:
                    out.append((int(d[j]), t, int(x)))
        return sorted(out)

    @staticmethod
    def highlight(
        doc_texts: dict[int, str | None],
        terms: list[str],
        window_chars: int = 120,
        pre_tag: str = "<em>",
        post_tag: str = "</em>",
        ellipsis: str = "…",
    ) -> dict[int, tuple[str, int]]:
        """Serving twin of IndexSearcher.highlight: doc_id → (snippet,
        n_matches) for the docs that matched, byte-identical fragments
        (same functions/snippets.py kernel).  ``doc_texts`` is the
        serving tier's doc store slice for its top-k hits."""
        from ..functions.snippets import py_highlight

        terms_set = set(terms)
        out: dict[int, tuple[str, int]] = {}
        for mid, text in doc_texts.items():
            snippet, n = py_highlight(
                text, terms_set, window_chars, pre_tag, post_tag, ellipsis
            )
            if n:
                out[int(mid)] = (snippet, n)
        return out

    def search_many(self, specs: list[dict]) -> dict[str, list[tuple[int, float]]]:
        """msearch analog: term ("OR"/"AND"), "BOOL" (query string) and
        "PHRASE" specs — same spec shape as IndexSearcher.search_many;
        the searcher's caches amortize shared terms across the batch."""
        out: dict[str, list[tuple[int, float]]] = {}
        for s in specs:
            mode = s.get("mode", "OR").upper()
            k = int(s.get("k", 10))
            if mode == "BOOL":
                out[s["query_id"]] = self.search_bool(s["query"], k)
            elif mode == "PHRASE":
                out[s["query_id"]] = self.search_phrase(list(s["phrase"]), k)
            else:
                out[s["query_id"]] = self.search(s["terms"], mode, k)
        return out

    def search_bool(
        self, query: str, k: int = 10, synonyms: "dict | None" = None
    ) -> list[tuple[int, float]]:
        """Boolean query string — same semantics as
        IndexSearcher.search_bool, no Spark jobs."""
        import numpy as np

        from ..functions import boolquery as bq

        from .bm25 import nested_paths_of

        ast = bq.parse(
            query,
            analyzed_fields=set(analyzed_fields_of(self.manifest)),
            dv_fields=dv_filter_fields_of(self.manifest),
            nested_fields=nested_paths_of(self.manifest),
        )
        if bq.has_wildcards(ast):
            ast = bq.expand_wildcards(
                ast, self.expand_prefix, self.expand_fuzzy
            )
        if synonyms:
            ast = bq.expand_synonyms(ast, synonyms)
        terms = bq.all_terms(ast)
        pos_terms = bq.positive_terms(ast)
        req = bq.required_terms(ast)
        ranges = bq.range_atoms(ast)
        phrases = bq.phrase_atoms(ast)
        nested = bq.nested_atoms(ast)
        if not pos_terms:
            raise bq.QueryParseError("query has no positive terms")
        avgdl = field_avgdl_map(self.manifest, terms)
        dfs = self.global_dfs(terms)
        boosts = bq.term_boosts(ast)
        idf = {
            t: bm25_idf(self.n_docs, d) * boosts.get(t, 1.0)
            for t, d in dfs.items()
        }
        range_sets: dict[str, tuple] = {}
        if ranges or phrases or nested:
            # doc-value range / quoted-phrase / nested atoms (filter
            # context): resolve allowed ids once (cached doc values /
            # positional chain matches / nested-sidecar scan), sliced
            # per segment below; forces the doc-set evaluation path
            from .docvalues import range_mask

            req = []
            g, p = self.manifest["globals"], self.manifest["params"]
            dpp, seg_group = int(g["docs_per_part"]), int(p["seg_group"])
            for rt in ranges:
                all_ids, vals = self._docvalues(rt.field)
                ids = all_ids[
                    range_mask(vals, rt, rt.field in self._dv_array_fields)
                ]
                range_sets[rt.key()] = (ids, (ids // dpp) // seg_group)
            for pt in phrases:
                ids = np.sort(
                    self._phrase_match_rows(list(pt.tokens), pt.slop)[0]
                )
                range_sets[pt.key()] = (ids, (ids // dpp) // seg_group)
            for nt in nested:
                from . import nested as nst

                ids = nst.local_atom_ids(self, nt)
                range_sets[nt.key()] = (ids, (ids // dpp) // seg_group)
        if req:
            # required conjuncts → same block-skip evaluation as the
            # distributed searcher, seeded from the decoded-postings
            # cache and harvesting back into it.  Cross-segment pruning
            # (r4): segments missing a required term are dropped from
            # metadata alone, the rest score in bound-desc order (bound
            # summed over POSITIVE terms only — facet/NOT terms filter,
            # never score) with a running k-th floor.
            cols = [
                "term", "segment", "df", "blob",
                "block_last", "block_max_tf", "block_min_dl", "block_off",
            ]
            tbl = self._term_rows(terms, cols)
            seg_arr = np.asarray(tbl["segment"].to_pylist())
            pos_idf = {t: idf.get(t, 0.0) for t in pos_terms}
            bounds, _present = self._bounds_from_table(
                tbl, {**{t: 0.0 for t in terms}, **pos_idf}, avgdl
            )
            req_count: dict[int, int] = {}
            req_set = set(req)
            terms_col = tbl["term"].to_pylist()
            for i in range(tbl.num_rows):
                if terms_col[i] in req_set:
                    s_ = int(seg_arr[i])
                    req_count[s_] = req_count.get(s_, 0) + 1
            order = sorted(
                (s for s in bounds if req_count.get(s, 0) == len(req_set)),
                key=lambda s: (-bounds[s], s),
            )
            self.last_segments_skipped = 0
            acc_d = np.array([], np.int64)
            acc_s = np.array([], np.float64)
            floor = -np.inf
            for seg in order:
                if len(acc_d) >= k and bounds[seg] < floor:
                    self.last_segments_skipped += 1
                    continue
                idxs = np.flatnonzero(seg_arr == seg)
                cache = _BlockCache(_CacheRow(tbl, int(i)) for i in idxs)
                for t in cache.blob:
                    hit = self._cache.get((t, int(seg)))
                    if hit is not None:
                        cache._full[t] = hit
                docs, scores = _eval_bool_blockmax(
                    cache, ast, req, pos_terms, idf, avgdl,
                    dead=self._deletes.get(int(seg)),
                )
                for t, out in cache._full.items():
                    self._cache_put(t, int(seg), out)
                docs, scores = _topk(docs, scores, k)
                acc_d, acc_s = _topk(
                    np.concatenate([acc_d, docs]),
                    np.concatenate([acc_s, scores]),
                    k,
                )
                if len(acc_d) >= k:
                    floor = float(acc_s[-1])
            return list(zip(acc_d.tolist(), acc_s.tolist()))
        tbl = self._term_rows(terms, ["term", "segment", "blob"])
        seg_arr = np.asarray(tbl["segment"].to_pylist())
        seg_list = set(np.unique(seg_arr).tolist())
        for _ids, segs in range_sets.values():
            # range-only OR branches can match in segments none of the
            # query terms touch
            seg_list |= set(np.unique(segs).tolist())
        cand_d, cand_s = [], []
        for seg in sorted(seg_list):
            idxs = np.flatnonzero(seg_arr == seg)
            postings = {}
            for i in idxs:
                t = tbl["term"][int(i)].as_py()
                d, tf, dl = self._decode_cached(t, int(seg), tbl["blob"][int(i)])
                _put_unique(postings, t, (d, tf, dl))
            dead = self._deletes.get(int(seg))
            postings = _mask_deleted(postings, dead)
            doc_sets = {t: p[0] for t, p in postings.items()}
            for rk, (ids, segs) in range_sets.items():
                sel = ids[segs == seg]
                if dead is not None and dead.size and sel.size:
                    sel = sel[~np.isin(sel, dead, assume_unique=True)]
                doc_sets[rk] = sel
            cand = bq.eval_docs(ast, doc_sets)
            if isinstance(cand, tuple) or cand.size == 0:
                continue
            scores = bq.score_candidates(cand, postings, pos_terms, idf, avgdl)
            d, s = _topk(cand, scores, k)
            cand_d.append(d)
            cand_s.append(s)
        if not cand_d:
            return []
        d, s = _topk(np.concatenate(cand_d), np.concatenate(cand_s), k)
        return list(zip(d.tolist(), s.tolist()))

    def _phrase_match_rows(
        self,
        phrase: list[str],
        slop: int = 0,
        expansions: "list[str] | None" = None,
    ):
        """(docs, tfs, dls) arrays of every live phrase-chain match —
        the shared front half of search_phrase, search_phrase_prefix
        and search_rescore.  With ``expansions``, the final phrase slot
        accepts any of the expanded terms (the match_phrase_prefix
        shape — same synthetic merged posting as the distributed twin)."""
        import numpy as np

        from .bm25 import _PFX_SLOT, _merge_posting_variants

        if not self.manifest["params"].get("with_positions", True):
            raise ValueError(
                "phrase queries need positional postings, but this index was "
                "built with with_positions=False — rebuild with positions"
            )
        exp = sorted(set(expansions)) if expansions is not None else None
        terms_sorted = sorted(set(phrase) | set(exp or ()))
        phrase_t = list(phrase) + ([_PFX_SLOT] if exp is not None else [])
        tbl = self._term_rows(
            terms_sorted, ["term", "segment", "blob", "pos_blob"]
        )
        seg_arr = np.asarray(tbl["segment"].to_pylist())
        all_docs, all_tf, all_dl = [], [], []
        for seg in np.unique(seg_arr):
            idxs = np.flatnonzero(seg_arr == seg)
            post = {}
            for i in idxs:
                t = tbl["term"][int(i)].as_py()
                d, tf, dl = self._decode_cached(t, int(seg), tbl["blob"][int(i)])
                pos, offs = self._pos_cached(t, int(seg), tbl["pos_blob"][int(i)], tf)
                _put_unique(post, t, (d, dl, pos, offs))
            if exp is not None:
                present = [post[v] for v in exp if v in post]
                if not present:
                    continue
                post[_PFX_SLOT] = _merge_posting_variants(present)
            if not all(t in post for t in phrase_t):
                continue
            from functools import reduce

            common = reduce(
                lambda a, b: np.intersect1d(a, b, assume_unique=True),
                (post[t][0] for t in dict.fromkeys(phrase_t)),
            )
            dead = self._deletes.get(int(seg))
            if dead is not None and dead.size:
                common = common[~np.isin(common, dead, assume_unique=True)]
            d0, dl0, _, _ = post[phrase_t[0]]
            dl_idx = np.searchsorted(d0, common)
            tfs = _phrase_match_counts(post, phrase_t, common, int(slop))
            hit = tfs > 0
            all_docs.extend(common[hit].tolist())
            all_tf.extend(tfs[hit].tolist())
            all_dl.extend(dl0[dl_idx[hit]].tolist())
        return (
            np.asarray(all_docs, dtype=np.int64),
            np.asarray(all_tf, dtype=np.int64),
            np.asarray(all_dl, dtype=np.int64),
        )

    def search_phrase(
        self, phrase: list[str], k: int = 10, slop: int = 0
    ) -> list[tuple[int, float]]:
        """Phrase BM25 top-k (exact adjacency, or in-order slop
        window) — same semantics/floats as IndexSearcher.search_phrase
        (tested bit-identical)."""
        from .index_build import BM25_B, BM25_K1

        docs, all_tf, all_dl = self._phrase_match_rows(phrase, slop)
        if not docs.size:
            return []
        idf = bm25_idf(self.n_docs, len(docs))
        tf = all_tf.astype(np.float64)
        dl = all_dl.astype(np.float64)
        w = ((BM25_K1 + 1.0) * tf) / (
            tf + BM25_K1 * ((1.0 - BM25_B) + BM25_B * dl / self.avgdl)
        )
        scores = idf * w
        d, s = _topk(docs, scores, k)
        return list(zip(d.tolist(), s.tolist()))

    def search_span_first(
        self, term: str, end: int, k: int = 10
    ) -> list[tuple[int, float]]:
        """ES span_first — serving twin of
        IndexSearcher.search_span_first, bit-identical (same qualifying
        count, same pseudo-term scoring)."""
        from .index_build import BM25_B, BM25_K1

        if int(end) <= 0:
            raise ValueError("span_first end must be a positive int")
        if not self.manifest["params"].get("with_positions", True):
            raise ValueError(
                "span_first needs positional postings, but this index was "
                "built with with_positions=False — rebuild with positions"
            )
        end_i = int(end)
        tbl = self._term_rows([term], ["term", "segment", "blob", "pos_blob"])
        all_docs, all_tf, all_dl = [], [], []
        for i in range(tbl.num_rows):
            seg = int(tbl["segment"][i].as_py())
            d, tf, dl = self._decode_cached(term, seg, tbl["blob"][i])
            if not d.size:
                continue
            pos, offs = self._pos_cached(term, seg, tbl["pos_blob"][i], tf)
            counts = np.add.reduceat(
                (pos < end_i).astype(np.int64), offs[:-1]
            )
            hit = counts > 0
            docs, tfs, dls = d[hit], counts[hit], dl[hit]
            dead = self._deletes.get(seg)
            if dead is not None and dead.size and docs.size:
                keep = ~np.isin(docs, dead, assume_unique=True)
                docs, tfs, dls = docs[keep], tfs[keep], dls[keep]
            all_docs.extend(docs.tolist())
            all_tf.extend(tfs.tolist())
            all_dl.extend(dls.tolist())
        if not all_docs:
            return []
        docs = np.asarray(all_docs, np.int64)
        tf = np.asarray(all_tf, np.float64)
        dl = np.asarray(all_dl, np.float64)
        idf = bm25_idf(self.n_docs, len(docs))
        w = ((BM25_K1 + 1.0) * tf) / (
            tf + BM25_K1 * ((1.0 - BM25_B) + BM25_B * dl / self.avgdl)
        )
        d_out, s_out = _topk(docs, idf * w, k)
        return list(zip(d_out.tolist(), s_out.tolist()))

    def search_phrase_prefix(
        self,
        phrase: list[str],
        k: int = 10,
        slop: int = 0,
        max_expansions: int = DEFAULT_MAX_EXPANSIONS,
    ) -> list[tuple[int, float]]:
        """ES ``match_phrase_prefix`` — serving twin of
        IndexSearcher.search_phrase_prefix, bit-identical: same prefix
        expansion, same merged pseudo-term posting, same one-pseudo-term
        scoring."""
        from .index_build import BM25_B, BM25_K1

        if not phrase:
            raise ValueError("match_phrase_prefix needs at least one token")
        lead, prefix = list(phrase[:-1]), str(phrase[-1])
        expansions = self.expand_prefix(prefix, max_expansions)
        if not expansions:
            return []
        docs, all_tf, all_dl = self._phrase_match_rows(
            lead, slop, expansions=expansions
        )
        if not docs.size:
            return []
        idf = bm25_idf(self.n_docs, len(docs))
        tf = all_tf.astype(np.float64)
        dl = all_dl.astype(np.float64)
        w = ((BM25_K1 + 1.0) * tf) / (
            tf + BM25_K1 * ((1.0 - BM25_B) + BM25_B * dl / self.avgdl)
        )
        d, s = _topk(docs, idf * w, k)
        return list(zip(d.tolist(), s.tolist()))

    def search_rescore(
        self,
        terms: list[str],
        rescore_phrase: list[str],
        k: int = 10,
        window_size: int = 50,
        query_weight: float = 1.0,
        rescore_weight: float = 1.0,
        mode: str = "OR",
        slop: int = 0,
    ) -> list[tuple[int, float]]:
        """ES rescore (score_mode: total) — serving twin of
        IndexSearcher.search_rescore, bit-identical: same window, same
        global phrase df, same per-doc float64 combination."""
        from .index_build import BM25_B, BM25_K1

        if window_size < k:
            raise ValueError("window_size must be >= k")
        base = self.search(terms, mode=mode, k=window_size)
        if not base:
            return []
        docs, all_tf, all_dl = self._phrase_match_rows(rescore_phrase, slop)
        ph_score: dict[int, float] = {}
        if docs.size:
            idf = bm25_idf(self.n_docs, len(docs))
            win = {d for d, _s in base}
            for d, tf_i, dl_i in zip(
                docs.tolist(), all_tf.tolist(), all_dl.tolist()
            ):
                if d not in win:
                    continue
                tf, dl = float(tf_i), float(dl_i)
                w = ((BM25_K1 + 1.0) * tf) / (
                    tf + BM25_K1 * ((1.0 - BM25_B) + BM25_B * dl / self.avgdl)
                )
                ph_score[d] = idf * w
        qw, rw = float(query_weight), float(rescore_weight)
        return sorted(
            ((d, qw * s + rw * ph_score.get(d, 0.0)) for d, s in base),
            key=lambda t: (-t[1], t[0]),
        )[: int(k)]
