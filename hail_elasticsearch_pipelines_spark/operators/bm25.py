"""BM25 top-k query engine over the segmented inverted index.

The reference delegates this entirely to Elasticsearch (the index it
exports serves the queries; settings at hail_scripts/shared/
elasticsearch_client_v7.py:84-99).  Here it is native:

  * term lookup prunes to the term's bucket (parquet partition column
    `term_bucket` → partition pruning; at 10^12 docs a query touches
    1/n_buckets of the index files, and parquet min/max stats on the
    sorted `term` column prune row groups further)
  * per-segment scoring in Arrow UDFs (segments have disjoint doc-id
    ranges → a doc's full score is computed in exactly one task; the
    segment axis is also the query-time parallelism)
  * global top-k = orderBy(score desc, doc_id asc).limit(k) over at
    most n_segments × k candidate rows (tiny)

Determinism contract (rank-identity, north rule): a doc's score is the
sum of per-term contributions accumulated in ASCENDING TERM order,
float64 throughout; ties break by doc_id asc.  The exhaustive scorer,
the block-max scorer, and the pure-Python oracle all follow the same
accumulation order, so scores are bit-identical.
"""

from __future__ import annotations

import heapq
import json
import os
import re
from functools import reduce

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions import codecs
from .index_build import BM25_B, BM25_K1, bm25_idf, bm25_tf_weight, term_bucket

RESULT_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("score", T.DoubleType(), False),
    ]
)

MULTI_RESULT_SCHEMA = T.StructType(
    [
        T.StructField("query_id", T.StringType(), False),
        T.StructField("rank", T.IntegerType(), False),
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("score", T.DoubleType(), False),
    ]
)

FACET_RESULT_SCHEMA = T.StructType(
    [
        T.StructField("field", T.StringType(), False),
        T.StructField("value", T.StringType(), False),
        T.StructField("doc_count", T.LongType(), False),
    ]
)

STATS_PARTIAL_SCHEMA = T.StructType(
    [
        T.StructField("n", T.LongType(), False),
        T.StructField("sum_dl", T.LongType(), False),
        T.StructField("min_dl", T.LongType(), False),
        T.StructField("max_dl", T.LongType(), False),
    ]
)

HISTOGRAM_SCHEMA = T.StructType(
    [
        T.StructField("bucket", T.LongType(), False),
        T.StructField("doc_count", T.LongType(), False),
    ]
)


def _match_docs(
    qdocs: dict[str, np.ndarray],
    qterms: list[str],
    mode_u: str,
    ast=None,
) -> np.ndarray:
    """One segment's matching doc ids for a term-list (OR/AND) or a
    boolean AST — the shared match-set kernel behind the non-scoring
    APIs (_count, terms/stats/histogram aggregations)."""
    from ..functions import boolquery as bq

    empty = np.array([], np.int64)
    if ast is not None:
        cand = bq.eval_docs(ast, qdocs)
        return empty if isinstance(cand, tuple) else cand
    if mode_u == "AND":
        if any(t not in qdocs for t in qterms):
            return empty
        return reduce(
            lambda a, b: np.intersect1d(a, b, assume_unique=True),
            (qdocs[t] for t in qterms),
        )
    present = [qdocs[t] for t in qterms if t in qdocs]
    return reduce(np.union1d, present) if present else empty


def _msm_scores(
    postings: dict[str, tuple[np.ndarray, np.ndarray, np.ndarray]],
    terms_sorted: list[str],
    idf: dict[str, float],
    avgdl: "float | dict[str, float]",
    min_should_match: int,
) -> tuple[np.ndarray, np.ndarray]:
    """ES ``minimum_should_match`` kernel for one segment: keep docs
    containing at least ``m`` of the query terms, score the keepers by
    the standard disjunctive sum.  Per-doc match counts come from the
    same membership passes as the scores (one extra int array)."""
    present = [t for t in terms_sorted if t in postings]
    if len(present) < min_should_match:
        return np.array([], np.int64), np.array([], np.float64)
    all_docs = reduce(np.union1d, (postings[t][0] for t in present))
    scores = np.zeros(len(all_docs), dtype=np.float64)
    nmatch = np.zeros(len(all_docs), dtype=np.int64)
    for t in present:
        d, tf, dl = postings[t]
        idx = np.searchsorted(all_docs, d)
        scores[idx] += idf[t] * bm25_tf_weight(tf, dl, _adl(avgdl, t))
        nmatch[idx] += 1
    keep = nmatch >= min_should_match
    return all_docs[keep], scores[keep]


def _fielded_and_scores(
    postings: dict[str, tuple[np.ndarray, np.ndarray, np.ndarray]],
    variants: dict[str, list[str]],
    expanded_sorted: list[str],
    idf: dict[str, float],
    avgdl: "float | dict[str, float]",
) -> tuple[np.ndarray, np.ndarray]:
    """ES ``multi_match operator: and`` kernel for one segment: a doc
    matches iff EVERY query token appears in at least one of its field
    variants (per-token cross-field union, conjunction across tokens);
    matching docs score as the weighted most_fields sum over ALL
    present (field, token) contributions — ascending expanded-term
    accumulation, the standard determinism contract."""
    empty = np.array([], np.int64), np.array([], np.float64)
    cand = None
    for _tok, vs in sorted(variants.items()):
        group = [postings[v][0] for v in vs if v in postings]
        if not group:
            return empty
        docs = reduce(np.union1d, group)
        cand = docs if cand is None else np.intersect1d(
            cand, docs, assume_unique=True
        )
        if cand.size == 0:
            return empty
    scores = np.zeros(cand.size, dtype=np.float64)
    for t in expanded_sorted:
        if t not in postings:
            continue
        d, tf, dl = postings[t]
        m = _members(d, cand)
        if m.any():
            idx = np.searchsorted(d, cand[m])
            scores[m] += idf[t] * bm25_tf_weight(
                tf[idx], dl[idx], _adl(avgdl, t)
            )
    return cand, scores


def _fielded_best_scores(
    postings: dict[str, tuple[np.ndarray, np.ndarray, np.ndarray]],
    field_of: dict[str, str],
    expanded_sorted: list[str],
    idf: dict[str, float],
    avgdl: "float | dict[str, float]",
    tie_breaker: float,
) -> tuple[np.ndarray, np.ndarray]:
    """ES ``dis_max`` / ``multi_match best_fields`` kernel for one
    segment: candidate docs are the cross-field union (should
    semantics); each FIELD accumulates its own BM25 sum over its
    present tokens (ascending expanded-term order, the determinism
    contract), and the doc scores max(field sums) + tie_breaker ×
    (sum of the other field sums).  BM25 idf is strictly positive, so
    a field with no match contributes 0 and never wins the max."""
    empty = np.array([], np.int64), np.array([], np.float64)
    present = [t for t in expanded_sorted if t in postings]
    if not present:
        return empty
    all_docs = reduce(np.union1d, (postings[t][0] for t in present))
    fsum: dict[str, np.ndarray] = {}
    for t in present:
        d, tf, dl = postings[t]
        arr = fsum.setdefault(
            field_of[t], np.zeros(all_docs.size, dtype=np.float64)
        )
        idx = np.searchsorted(all_docs, d)
        arr[idx] += idf[t] * bm25_tf_weight(tf, dl, _adl(avgdl, t))
    stack = np.stack([fsum[f] for f in sorted(fsum)])
    mx = stack.max(axis=0)
    tot = stack.sum(axis=0)
    return all_docs, mx + float(tie_breaker) * (tot - mx)


def fielded_term_field(term: str) -> str:
    """Field of an expanded fielded term: 'title:foo' → 'title', bare →
    body ('text')."""
    return term.split(":", 1)[0] if ":" in term else "text"


def _match_dls(
    decoded: list[tuple[np.ndarray, np.ndarray]], matches: np.ndarray
) -> np.ndarray:
    """doc lengths of the matching docs, from the already-decoded
    (docs, dls) posting streams (dl rides every posting — no doclens
    read needed)."""
    all_d = np.concatenate([d for d, _ in decoded])
    all_dl = np.concatenate([dl for _, dl in decoded])
    u, first = np.unique(all_d, return_index=True)
    return all_dl[first][np.searchsorted(u, matches)]


def _adl(avgdl: "float | dict[str, float]", t: str) -> float:
    """Per-term average document length.  A plain float serves the
    single-field index; a dict maps each term to its FIELD's avgdl
    (BM25F-lite: field-prefixed terms like ``title:foo`` carry the
    title field's average length so every field gets its own length
    norm — the ES multi-field ``most_fields`` scoring analog)."""
    return avgdl[t] if isinstance(avgdl, dict) else avgdl


def _score_union_exhaustive(
    postings: dict[str, tuple[np.ndarray, np.ndarray, np.ndarray]],
    terms_sorted: list[str],
    idf: dict[str, float],
    avgdl: "float | dict[str, float]",
) -> tuple[np.ndarray, np.ndarray]:
    """Union scoring: accumulate idf*w per term in sorted-term order."""
    present = [t for t in terms_sorted if t in postings]
    if not present:
        return np.array([], np.int64), np.array([], np.float64)
    all_docs = reduce(np.union1d, (postings[t][0] for t in present))
    scores = np.zeros(len(all_docs), dtype=np.float64)
    for t in present:
        d, tf, dl = postings[t]
        idx = np.searchsorted(all_docs, d)
        scores[idx] += idf[t] * bm25_tf_weight(tf, dl, _adl(avgdl, t))
    return all_docs, scores


def _score_intersection(
    postings: dict[str, tuple[np.ndarray, np.ndarray, np.ndarray]],
    terms_sorted: list[str],
    idf: dict[str, float],
    avgdl: float,
) -> tuple[np.ndarray, np.ndarray]:
    """Conjunctive (AND) scoring: every term must match."""
    if any(t not in postings for t in terms_sorted):
        return np.array([], np.int64), np.array([], np.float64)
    common = reduce(
        lambda a, b: np.intersect1d(a, b, assume_unique=True),
        (postings[t][0] for t in terms_sorted),
    )
    if common.size == 0:
        return common, np.array([], np.float64)
    scores = np.zeros(len(common), dtype=np.float64)
    for t in terms_sorted:
        d, tf, dl = postings[t]
        idx = np.searchsorted(d, common)
        scores += idf[t] * bm25_tf_weight(tf[idx], dl[idx], _adl(avgdl, t))
    return common, scores


def _flat_delete_files(deletes_path: str) -> list[str]:
    """Root-level (pre-sidecar, 'flat' layout) tombstone parquet files:
    files sitting directly in deletes/ with a ``segment`` DATA column,
    written by indexes older than the hive-sidecar layout."""
    if not os.path.isdir(deletes_path):
        return []
    return sorted(
        os.path.join(deletes_path, fn)
        for fn in os.listdir(deletes_path)
        if fn.endswith(".parquet")
        and os.path.isfile(os.path.join(deletes_path, fn))
    )


_EPOCH_FILE_RE = None  # compiled lazily (re import kept out of task hot path)


def _file_epoch(fn: str) -> int:
    """Publish epoch encoded in a sidecar file name (``e<N>-...``);
    0 for legacy/unprefixed files.  Lets a searcher pinned at epoch E
    ignore tombstones published AFTER its snapshot — an upsert landing
    mid-query must not make the old doc vanish before its replacement
    becomes visible at reload (MVCC on the delete axis)."""
    global _EPOCH_FILE_RE
    if _EPOCH_FILE_RE is None:
        import re

        _EPOCH_FILE_RE = re.compile(r"^e(\d+)-")
    m = _EPOCH_FILE_RE.match(fn)
    return int(m.group(1)) if m else 0


def load_deletes(
    index_dir: str, epoch: int | None = None, manifest: dict | None = None
) -> dict[int, np.ndarray]:
    """ALL segments' tombstoned doc ids, sorted — the Lucene live-docs
    bitmap analog (the reference gets this from ES delete/update ops,
    hail_scripts/v02/utils/elasticsearch_client.py:106-113).

    Full materialization is for single-process consumers only: the
    LocalSearcher (which holds the whole index hot by design).
    Distributed scoring (and compaction strip) tasks instead call
    read_segment_deletes for THEIR segment's sidecar — a driver-global
    dict would ride into every task closure and turn heavy upsert churn
    into a multi-GB broadcast.

    Handles all three on-disk layouts: hive sidecars
    (``deletes/segment=K/``), legacy flat root files (``segment`` as a
    data column), and a MIX of both (a legacy index whose first
    new-code upsert published sidecars next to flat files) — the two
    sources are unioned per segment, never treated as exclusive.

    ``epoch``: when given, only sidecar files published at or before
    that epoch are read (snapshot semantics for a searcher pinned at
    its manifest's deletes_epoch); None reads everything (latest).

    ``manifest``: the caller's ALREADY-LOADED manifest, so the deletes
    dir resolves through the same generation pointer as every other
    table in the caller's snapshot.  Without it a maintenance publish
    landing between the caller's manifest read and this one resolves
    deletes to a NEWER generation than the pinned postings — e.g. a
    concurrent compaction flips deletes to an empty dir and a pinned
    searcher would serve tombstoned docs until reload (ADVICE r4)."""
    from ..layout import table_path

    path = table_path(index_dir, "deletes", manifest)
    if not os.path.isdir(path):
        return {}
    import pyarrow.dataset as ds

    out: dict[int, list[np.ndarray]] = {}
    for e in sorted(os.listdir(path)):
        if not (e.startswith("segment=") and os.path.isdir(os.path.join(path, e))):
            continue
        seg = int(e.split("=", 1)[1])
        seg_dir = os.path.join(path, e)
        files = sorted(
            os.path.join(seg_dir, fn)
            for fn in os.listdir(seg_dir)
            if fn.endswith(".parquet")
            and (epoch is None or _file_epoch(fn) <= epoch)
        )
        if not files:
            continue
        tbl = ds.dataset(files, format="parquet").to_table(columns=["doc_id"])
        if tbl.num_rows:
            out.setdefault(seg, []).append(
                tbl.column("doc_id").to_numpy(zero_copy_only=False)
            )
    flat = _flat_delete_files(path)
    if flat:
        tbl = ds.dataset(flat, format="parquet").to_table(
            columns=["segment", "doc_id"]
        )
        if tbl.num_rows:
            segs = tbl.column("segment").to_numpy(zero_copy_only=False)
            ids = tbl.column("doc_id").to_numpy(zero_copy_only=False)
            for s in np.unique(segs):
                out.setdefault(int(s), []).append(ids[segs == s])
    return {s: np.unique(np.concatenate(v)) for s, v in out.items()}


# Executor-process cache of per-segment tombstone sidecars, keyed by
# (index_dir, deletes_epoch, segment).  The epoch rides in the manifest
# and is bumped by every tombstone publish / compaction, so reused
# executor processes never serve stale live-docs after maintenance.
_SEG_DELETES_CACHE: dict[tuple[str, int, int], np.ndarray | None] = {}
_SEG_DELETES_CACHE_MAX = 4096


def read_segment_deletes(
    deletes_dir: str, segment: int, epoch: int | None = 0
) -> np.ndarray | None:
    """Sorted tombstoned doc ids of ONE segment, read from that
    segment's sidecar (``<deletes_dir>/segment=K/``) inside the scoring
    task that owns the segment — no driver materialization, no closure
    shipping; each task reads only its own (small) sidecar.

    ``deletes_dir`` is the MANIFEST-RESOLVED deletes directory (the
    driver resolves the generation pointer once and ships the string),
    and only sidecar files published at or before ``epoch`` are read —
    together these pin the task to its searcher's snapshot even while
    an upsert publishes new tombstones or a compaction retires the
    directory.  ``epoch=None`` reads EVERY sidecar file regardless of
    publish epoch — compaction uses this so its strip, doclens
    anti-join, and n_stripped count all see one tombstone set even if a
    crashed upsert left files ahead of the manifest epoch (ADVICE r4).
    Legacy flat root-level delete files (``segment`` as a
    data column) are UNIONED with the sidecar, never treated as
    exclusive — a legacy index whose first new-code upsert published
    sidecars next to flat files must not resurrect flat-era
    tombstones."""
    segment = int(segment)
    key = (deletes_dir, None if epoch is None else int(epoch), segment)
    if key in _SEG_DELETES_CACHE:
        return _SEG_DELETES_CACHE[key]
    import pyarrow.dataset as ds

    seg_dir = os.path.join(deletes_dir, f"segment={segment}")
    parts: list[np.ndarray] = []
    if os.path.isdir(seg_dir):
        files = sorted(
            os.path.join(seg_dir, fn)
            for fn in os.listdir(seg_dir)
            if fn.endswith(".parquet")
            and (epoch is None or _file_epoch(fn) <= epoch)
        )
        if files:
            tbl = ds.dataset(files, format="parquet").to_table(
                columns=["doc_id"]
            )
            if tbl.num_rows:
                parts.append(tbl.column("doc_id").to_numpy(zero_copy_only=False))
    flat = _flat_delete_files(deletes_dir)
    if flat:
        dset = ds.dataset(flat, format="parquet")
        if "segment" in dset.schema.names:  # legacy flat layout
            tbl = dset.to_table(
                columns=["doc_id"], filter=ds.field("segment") == segment
            )
            if tbl.num_rows:
                parts.append(tbl.column("doc_id").to_numpy(zero_copy_only=False))
    out: np.ndarray | None = (
        np.unique(np.concatenate(parts)) if parts else None
    )
    if len(_SEG_DELETES_CACHE) >= _SEG_DELETES_CACHE_MAX:
        _SEG_DELETES_CACHE.clear()
    _SEG_DELETES_CACHE[key] = out
    return out


class ExpansionError(ValueError):
    """A multi-term expansion (prefix, wildcard, fuzzy) produced more
    terms than ``max_expansions`` — the ES ``too_many_clauses`` analog.
    Raise instead of silently truncating: a truncated expansion would
    return a plausible but wrong ranking."""


class PrefixExpansionError(ExpansionError):
    """Prefix/wildcard expansion over the cap."""


class FuzzyExpansionError(ExpansionError):
    """Fuzzy (edit-distance) expansion over the cap."""


class RegexpExpansionError(ExpansionError):
    """Regexp expansion over the cap."""


def py_levenshtein(a: str, b: str) -> int:
    """Classic unit-cost Levenshtein — the exact algorithm of Spark's
    ``levenshtein`` expression and DuckDB's ``levenshtein`` (no
    transposition primitive, unlike ES's default Damerau variant), so
    the serving path, the distributed path, and the SQL oracle agree
    term-for-term."""
    if a == b:
        return 0
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(
                min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
            )
        prev = cur
    return prev[-1]


def py_levenshtein_within(a: str, b: str, k: int) -> bool:
    """True iff ``py_levenshtein(a, b) <= k`` — same answer, without
    the full O(|a|·|b|) python DP on the hot path.  Fuzzy expansion
    runs this against every length-pruned termdict candidate (10^5
    calls per query on a web-scale vocabulary), where the DP's ~25 µs
    per pair dominated the whole suggest/fuzzy path.  k=1 (the ES
    default and by far the common case) reduces to C-level prefix scan
    + slice comparisons; k>=2 falls back to the DP."""
    la, lb = len(a), len(b)
    if abs(la - lb) > k:
        return False
    if a == b:
        return True
    if k <= 0:
        return False
    if k == 1:
        if la == lb:
            # exactly one substitution: skip the first mismatch, the
            # remainders must be equal
            i = 0
            while a[i] == b[i]:
                i += 1
            return a[i + 1:] == b[i + 1:]
        if la < lb:
            a, b, la, lb = b, a, lb, la
        # one insertion into b: skip a's extra char at first mismatch
        i = 0
        while i < lb and a[i] == b[i]:
            i += 1
        return a[i + 1:] == b[i:]
    return py_levenshtein(a, b) <= k


_PREFIX_RE = re.compile(r"^(?:[a-z0-9]+:)?[a-z0-9]+$")


def prefix_term_range(prefix: str) -> tuple[str, str]:
    """Half-open termdict range [lo, hi) covering exactly the terms
    that start with ``prefix`` — terms are ASCII ``[a-z0-9:]`` so
    bumping the last codepoint is exact.  The range scan rides the
    termdict's sorted ``term`` column (parquet row-group min/max
    pruning), the Lucene terms-enum ``seekCeil`` analog."""
    if not _PREFIX_RE.match(prefix):
        raise ValueError(
            f"bad prefix {prefix!r}: expected lowercase [a-z0-9]+ with an "
            "optional 'field:' prefix"
        )
    return prefix, prefix[:-1] + chr(ord(prefix[-1]) + 1)


# the regexp-query charset every engine in play interprets identically
# (Java java.util.regex via rlike, Python re on the serving twin, RE2
# via DuckDB regexp_matches in the oracle): literals, char classes,
# grouping, alternation, and the * + ? quantifiers.  No escapes, no
# braces, no anchors, no lookaround — ES regexp is likewise its own
# conservative dialect (and implicitly anchored, as here).
_REGEXP_SAFE = re.compile(r"^[a-z0-9.*+?()\[\]|\-]+$")

_REGEXP_META = ".*+?()[]|"


def check_regexp(pattern: str) -> None:
    """Reject patterns outside the cross-engine-safe dialect."""
    if not pattern or not _REGEXP_SAFE.match(pattern):
        raise ValueError(
            f"bad regexp {pattern!r}: allowed are lowercase [a-z0-9] "
            "literals plus . * + ? ( ) [ ] | - (implicitly anchored, "
            "ES-regexp style)"
        )
    try:
        re.compile(pattern)
    except re.error as e:
        raise ValueError(f"bad regexp {pattern!r}: {e}") from None


def _branch_literal_prefix(branch: str) -> str:
    """Longest literal prefix of one alternation-free pattern branch —
    a quantifier following the prefix drops the char it quantifies."""
    out: list[str] = []
    for ch in branch:
        if ch in _REGEXP_META or ch == "-":
            if ch in "*+?" and out:
                out.pop()
            break
        out.append(ch)
    return "".join(out)


def regexp_prefixes(pattern: str) -> list[str]:
    """Literal prefixes of the pattern's TOP-LEVEL alternation branches
    — every match of the (anchored) pattern must start with one of
    them, so the termdict scan prunes to the UNION of their sorted
    ranges (``term40[0-4].|the`` → two range scans instead of a full
    vocabulary scan).  Empty list = some branch has no literal prefix
    (full scan)."""
    branches, depth, cur = [], 0, []
    for ch in pattern:
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth = max(0, depth - 1)
        if ch == "|" and depth == 0:
            branches.append("".join(cur))
            cur = []
        else:
            cur.append(ch)
    branches.append("".join(cur))
    out = []
    for b in branches:
        lit = _branch_literal_prefix(b)
        if not lit:
            return []
        out.append(lit)
    return out


def regexp_literal_prefix(pattern: str) -> str:
    """Single literal prefix every match must start with ("" when the
    top-level alternation splits the range — see regexp_prefixes for
    the union-of-ranges form)."""
    ps = regexp_prefixes(pattern)
    return ps[0] if len(ps) == 1 else ""


def dv_filter_fields_of(manifest: dict) -> frozenset:
    """Stored, non-facet, non-analyzed field names — the doc-value-only
    columns a ``field:value`` query atom resolves against (the ES
    term-query-on-doc-value-field path; facet fields keep their indexed
    token, analyzed fields their scoring postings)."""
    params = manifest.get("params", {})
    analyzed = set(params.get("text_fields") or ())
    return frozenset(
        name
        for name, spec in (params.get("fields") or {}).items()
        if spec.get("stored") and not spec.get("facet") and name not in analyzed
    )


def nested_paths_of(manifest: dict) -> frozenset:
    """Dotted ``field.leaf`` paths of the index's nested
    (array-of-struct) columns — the atoms ``parse(nested_fields=)``
    accepts, resolved against the exploded nested sidecar (the ES
    ``nested`` mapping's queryable leaves)."""
    out = set()
    for name, spec in (manifest.get("params", {}).get("fields") or {}).items():
        for leaf in (spec.get("nested") or {}):
            out.add(f"{name}.{leaf}")
    return frozenset(out)


def analyzed_fields_of(manifest: dict) -> tuple[str, ...]:
    """Extra analyzed text fields of the index (build-time
    ``text_fields`` — the ES multi-field mapping analog,
    hail_scripts/v02/utils/elasticsearch_utils.py:38-77)."""
    return tuple(manifest.get("params", {}).get("text_fields", ()) or ())


def field_avgdl_map(
    manifest: dict, terms: list[str]
) -> "float | dict[str, float]":
    """avgdl for a term list that may mix body terms and field-prefixed
    terms: a plain float (body avgdl) when no fielded term is present,
    else a per-term map where ``field:tok`` terms get
    avgdl_field = field total tokens / n_docs (docs missing the field
    count as length 0 — same convention in the engine, the oracle SQL,
    and the maintenance-op incremental updates)."""
    body = float(manifest["globals"]["avgdl"])
    tf_fields = set(analyzed_fields_of(manifest))
    fielded = [
        t for t in terms if ":" in t and t.split(":", 1)[0] in tf_fields
    ]
    if not fielded:
        return body
    n_docs = int(manifest["globals"]["n_docs"]) or 1
    fstats = manifest["globals"].get("field_stats", {})
    out: dict[str, float] = {}
    for t in terms:
        f = t.split(":", 1)[0] if ":" in t else None
        if f in tf_fields:
            st = fstats.get(f)
            if st is None:
                raise ValueError(
                    f"index has analyzed field {f!r} but its globals "
                    "carry no field_stats — rebuild or repair the index"
                )
            out[t] = (int(st["total_tokens"]) / n_docs) or 1.0
        else:
            out[t] = body
    return out


def expand_fielded_terms(
    terms: list[str],
    fields: dict[str, float],
    text_fields: tuple[str, ...],
) -> tuple[list[str], dict[str, float]]:
    """Expand query tokens across fields → (sorted index terms, weight
    per index term).  ``fields`` maps field name → boost weight;
    ``"text"`` is the body (unprefixed terms), every other field must
    be one of the index's analyzed ``text_fields`` and expands to its
    prefixed terms (``title:foo``)."""
    weight: dict[str, float] = {}
    for f, w in fields.items():
        if f != "text" and f not in text_fields:
            raise ValueError(
                f"field {f!r} is not an analyzed field of this index "
                f"(text_fields={list(text_fields)!r}; body field is 'text')"
            )
        for t in dict.fromkeys(terms):
            it = t if f == "text" else f"{f}:{t}"
            weight[it] = float(w)
    return sorted(weight), weight


def _mask_deleted(
    postings: dict[str, tuple[np.ndarray, np.ndarray, np.ndarray]],
    dead: np.ndarray | None,
) -> dict[str, tuple[np.ndarray, np.ndarray, np.ndarray]]:
    """Drop tombstoned docs from decoded postings (terms left empty are
    removed — AND/OR semantics then fall out naturally)."""
    if dead is None or dead.size == 0:
        return postings
    out = {}
    for t, (d, tf, dl) in postings.items():
        keep = ~np.isin(d, dead, assume_unique=True)
        if keep.all():
            out[t] = (d, tf, dl)
        elif keep.any():
            out[t] = (d[keep], tf[keep], dl[keep] if dl is not None else None)
    return out


def _ragged_gather(
    vals: np.ndarray, offs: np.ndarray, rows: np.ndarray
) -> tuple[np.ndarray, np.ndarray]:
    """Concatenate vals[offs[r]:offs[r+1]] for each r in rows (one
    vectorized fancy-gather).  Returns (flat values, output offsets of
    len(rows)+1)."""
    lens = offs[rows + 1] - offs[rows]
    out_offs = np.concatenate(([0], np.cumsum(lens)))
    total = int(out_offs[-1])
    if total == 0:
        return np.zeros(0, dtype=vals.dtype), out_offs
    idx = np.repeat(offs[rows], lens) + (
        np.arange(total, dtype=np.int64) - np.repeat(out_offs[:-1], lens)
    )
    return vals[idx], out_offs


def _phrase_match_counts(
    post: dict[str, tuple],
    phrase_t: list[str],
    common: np.ndarray,
    slop: int = 0,
) -> np.ndarray:
    """Windowed-chain count (phrase tf) per candidate doc, fully
    vectorized: ONE ragged gather of candidate position slices and ONE
    sorted-key searchsorted per phrase term — replacing the
    per-candidate-doc Python walk, which at a 10^9-doc segment meant
    millions of interpreter iterations for a stopword-ish phrase.

    ``slop=0`` is the exact-adjacency phrase.  ``slop>0`` is the ES
    ``match_phrase`` slop with in-order matching (the span_near
    in_order=true shape): a start position p₀ of the first term
    matches when positions p₀ < p₁ < … < p_{n−1} exist with
    p_i ≤ p₀ + i + slop — total rightward stretch at most ``slop``.
    Greedy (smallest valid p_i) is optimal for existence: every
    constraint is an upper bound on a strictly increasing chain, so
    taking the earliest candidate never hurts later terms.  Starts
    count independently (two starts may share a continuation).

    ``post[t] = (doc_ids, dls, pos, offs)``; the chain step for term i
    finds the first position > prev via searchsorted on the combined
    key doc_rank*K + position (globally sorted: doc ranks ascend,
    positions ascend within each doc), then admits it iff it is still
    ≤ doc_rank*K + p₀ + i + slop — K is sized so a spill into the next
    doc's keys always fails that bound."""
    C = int(common.size)
    if C == 0:
        return np.zeros(0, dtype=np.int64)
    slop = int(slop)
    if slop < 0:
        raise ValueError("slop must be >= 0")
    uniq_terms = list(dict.fromkeys(phrase_t))
    rows: dict[str, np.ndarray] = {}
    maxpos = 0
    for t in uniq_terms:
        rows[t] = np.searchsorted(post[t][0], common)
        p = post[t][2]
        if p.size:
            maxpos = max(maxpos, int(p.max()))
    K = np.int64(maxpos + len(phrase_t) + slop + 2)

    t0 = phrase_t[0]
    starts, s_offs = _ragged_gather(post[t0][2], post[t0][3], rows[t0])
    doc_idx = np.repeat(np.arange(C, dtype=np.int64), np.diff(s_offs))
    starts = starts.astype(np.int64, copy=False)
    prev = starts
    for i in range(1, len(phrase_t)):
        if starts.size == 0:
            return np.zeros(C, dtype=np.int64)
        t = phrase_t[i]
        cp, c_offs = _ragged_gather(post[t][2], post[t][3], rows[t])
        cp_keys = (
            np.repeat(np.arange(C, dtype=np.int64), np.diff(c_offs)) * K
            + cp.astype(np.int64, copy=False)
        )
        loc = np.searchsorted(cp_keys, doc_idx * K + prev + 1)
        ok = loc < cp_keys.size
        found = cp_keys[loc[ok]]
        ok[ok] = found <= (doc_idx * K + starts + i + slop)[ok]
        starts, doc_idx = starts[ok], doc_idx[ok]
        prev = cp_keys[loc[ok]] - doc_idx * K
    return np.bincount(doc_idx, minlength=C).astype(np.int64)


def _merge_posting_variants(entries: list[tuple]) -> tuple:
    """Merge several terms' positional postings into ONE synthetic
    posting (docs = union, per-doc positions = sorted union across the
    variants, dl carried from any variant — same doc, same field, same
    length).  The multi-term-synonym primitive behind
    ``match_phrase_prefix``: the expanded prefix behaves as a single
    pseudo-term occupying the final phrase slot.  Distinct variants can
    never collide on a position (one token per position), so the union
    needs no dedup."""
    if len(entries) == 1:
        return entries[0]
    doc_rep, pos_all, docs_l, dls_l = [], [], [], []
    for d, dl, pos, offs in entries:
        doc_rep.append(np.repeat(d, np.diff(offs)))
        pos_all.append(pos)
        docs_l.append(d)
        dls_l.append(dl)
    all_doc = np.concatenate(doc_rep)
    all_pos = np.concatenate(pos_all)
    order = np.lexsort((all_pos, all_doc))
    all_doc, all_pos = all_doc[order], all_pos[order]
    docs_u, starts = np.unique(all_doc, return_index=True)
    offs_u = np.concatenate([starts, [all_pos.size]]).astype(np.int64)
    cat_d = np.concatenate(docs_l)
    cat_dl = np.concatenate(dls_l)
    o2 = np.argsort(cat_d, kind="stable")
    dl_u = cat_dl[o2][np.searchsorted(cat_d[o2], docs_u)]
    return docs_u, dl_u, all_pos, offs_u


# reserved pseudo-term key for the merged prefix slot ('\x00' sorts
# before any indexable character, so it can never collide with a term)
_PFX_SLOT = "\x00pfx"


def _check_unique_terms(pdf: pd.DataFrame) -> None:
    """Each (term, segment) must hold exactly ONE postings row — the
    invariant extend_index's segment alignment guarantees.  Raise loudly
    instead of letting dict construction silently drop docs."""
    if pdf["term"].duplicated().any():
        dup = pdf["term"][pdf["term"].duplicated()].iloc[0]
        raise ValueError(
            f"corrupt index: multiple postings rows for term {dup!r} in one "
            "segment (was the index extended with a misaligned id_base?)"
        )


def _per_segment_apply(rows: DataFrame, fn, schema) -> DataFrame:
    """Per-segment pandas kernel WITHOUT per-group Arrow machinery:
    hash-partition by segment, sort within partitions, and stream each
    partition's batches through ONE mapInPandas, flushing the kernel on
    segment boundaries (the same move `_merge_bucket` makes for the
    build-side merge).  ``groupBy("segment").applyInPandas`` costs
    ~2-3 ms of Arrow/pandas setup per GROUP — pure machinery that
    dominated the plain distributed path on many-segment indexes (a
    10^3-segment probe spent ~2.5 s in it with a no-op kernel).
    Memory stays O(largest segment's rows), exactly applyInPandas'
    envelope.  Output row SET is identical; every caller aggregates or
    sorts downstream, so ordering differences cannot surface."""

    def flush(buf):
        pdf = buf[0] if len(buf) == 1 else pd.concat(buf, ignore_index=True)
        return fn(pdf.reset_index(drop=True))

    def gen(batches):
        buf: list[pd.DataFrame] = []
        cur = None
        for pdf in batches:
            if pdf.empty:
                continue
            for seg, grp in pdf.groupby("segment", sort=True):
                if cur is not None and seg != cur:
                    out = flush(buf)
                    if len(out):
                        yield out
                    buf = []
                cur = seg
                buf.append(grp)
        if buf:
            out = flush(buf)
            if len(out):
                yield out

    return (
        rows.repartition("segment")
        .sortWithinPartitions("segment")
        .mapInPandas(gen, schema=schema)
    )


def _topk(docs: np.ndarray, scores: np.ndarray, k: int) -> tuple[np.ndarray, np.ndarray]:
    """k best by (score desc, doc_id asc)."""
    if docs.size == 0:
        return docs, scores
    order = np.lexsort((docs, -scores))[:k]
    return docs[order], scores[order]


class _BlockCache:
    """Lazy per-(term, block) decoder over ONE segment's posting rows.

    The skip-read primitive behind conjunctive/boolean/batch pruning
    (the Lucene block-skip analog the reference delegates to ES,
    hail_scripts/shared/elasticsearch_client_v7.py:84-99): a stopword's
    postings are decoded only in the blocks where a rarer term's
    candidates fall, never end-to-end.  Decoded blocks and full lists
    are cached so batch queries sharing a segment share the work."""

    def __init__(self, rows):
        """rows: iterable of objects with .term .df .blob .block_last
        .block_off (and, when available, .block_max_tf .block_min_dl
        for score bounds) — pandas itertuples / pyarrow rows."""
        self.blob: dict[str, bytes] = {}
        self.block_last: dict[str, np.ndarray] = {}
        self.block_off: dict[str, np.ndarray] = {}
        self.block_max_tf: dict[str, np.ndarray] = {}
        self.block_min_dl: dict[str, np.ndarray] = {}
        self.df: dict[str, int] = {}
        for r in rows:
            t = r.term
            if t in self.blob:
                raise ValueError(
                    f"corrupt index: multiple postings rows for term {t!r} "
                    "in one segment"
                )
            self.blob[t] = bytes(r.blob)
            self.block_last[t] = np.asarray(r.block_last, dtype=np.int64)
            self.block_off[t] = np.asarray(r.block_off, dtype=np.int32)
            bmt = getattr(r, "block_max_tf", None)
            if bmt is not None:
                self.block_max_tf[t] = np.asarray(bmt, dtype=np.int64)
                self.block_min_dl[t] = np.asarray(r.block_min_dl, dtype=np.int64)
            self.df[t] = int(r.df)
        self._full: dict[str, tuple] = {}
        self._blocks: dict[tuple[str, int], tuple] = {}

    def __contains__(self, t: str) -> bool:
        return t in self.blob

    def full(self, t: str) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
        if t not in self._full:
            self._full[t] = codecs.decode_postings(self.blob[t])
        return self._full[t]

    def _block(self, t: str, i: int) -> tuple:
        key = (t, i)
        if key not in self._blocks:
            self._blocks[key] = codecs.decode_block(
                self.blob[t], int(self.block_off[t][i])
            )[:3]
        return self._blocks[key]

    def gather(self, t: str, cand: np.ndarray) -> tuple:
        """(docs, tfs, dls) of term t restricted to the blocks that can
        contain any candidate id — a SUPERSET of t's postings ∩ cand,
        sorted ascending (callers membership-test against it).  Falls
        back to one full decode when candidates touch most blocks
        (per-block decode overhead would exceed the sequential decode)."""
        if t in self._full:
            return self._full[t]
        bl = self.block_last[t]
        bi = np.unique(np.searchsorted(bl, cand))
        bi = bi[bi < bl.size]
        if bi.size == 0:
            z = np.zeros(0, dtype=np.int64)
            return z, z, z
        if bi.size > 0.5 * bl.size:
            return self.full(t)
        parts = [self._block(t, int(i)) for i in bi]
        return (
            np.concatenate([p[0] for p in parts]),
            np.concatenate([p[1] for p in parts]),
            np.concatenate([p[2] for p in parts]),
        )


def _members(dt: np.ndarray, cand: np.ndarray) -> np.ndarray:
    """Boolean mask: which candidates appear in sorted array dt."""
    if dt.size == 0:
        return np.zeros(cand.size, dtype=bool)
    idx = np.clip(np.searchsorted(dt, cand), 0, dt.size - 1)
    return dt[idx] == cand


def _score_intersection_blockmax(
    cache: _BlockCache,
    terms_sorted: list[str],
    idf: dict[str, float],
    avgdl: float,
    dead: np.ndarray | None = None,
) -> tuple[np.ndarray, np.ndarray]:
    """Conjunctive scoring with block skipping: seed candidates from the
    rarest term's (live) postings, shrink through the others in
    ascending-df order decoding ONLY the blocks the surviving
    candidates touch.  Bit-identical to _score_intersection (same
    candidate set, same ascending-term float64 accumulation) — at a
    10^9-doc segment a `rare AND stopword` query decodes ~|rare|/128
    of the stopword's blocks instead of its full list."""
    empty = np.array([], np.int64), np.array([], np.float64)
    if any(t not in cache for t in terms_sorted):
        return empty
    order = sorted(terms_sorted, key=lambda t: cache.df[t])
    d0, _, _ = cache.full(order[0])
    cand = d0
    if dead is not None and dead.size:
        cand = cand[~np.isin(cand, dead, assume_unique=True)]
    gathered: dict[str, tuple] = {}
    for t in order[1:]:
        if cand.size == 0:
            return empty
        g = cache.gather(t, cand)
        gathered[t] = g
        cand = cand[_members(g[0], cand)]
    if cand.size == 0:
        return empty
    scores = np.zeros(cand.size, dtype=np.float64)
    for t in terms_sorted:  # accumulation order contract: ascending term
        dt, tft, dlt = gathered.get(t) or cache.full(t)
        idx = np.searchsorted(dt, cand)
        scores += idf[t] * bm25_tf_weight(tft[idx], dlt[idx], _adl(avgdl, t))
    return cand, scores


def _score_union_maxscore(
    cache: _BlockCache,
    terms_sorted: list[str],
    idf: dict[str, float],
    avgdl: float,
    k: int,
    dead: np.ndarray | None = None,
) -> tuple[np.ndarray, np.ndarray]:
    """MaxScore (Turtle & Flood) disjunctive top-k over the block
    cache: terms are split into ESSENTIAL (decoded fully, candidates
    come only from their postings) and NON-ESSENTIAL (decoded only in
    the blocks the candidates touch) by comparing the non-essential
    score-bound sum against the k-th best partial score.  A doc with no
    essential term scores ≤ the non-essential bound sum < that floor,
    so it can never enter the top k.

    Unlike the window-WAND variant, this stays effective when a rare
    term fits ONE block (whose block-max then poisons every window):
    `rare OR stopword` decodes the rare list plus ~df_rare stopword
    blocks instead of the stopword's millions.  Results are bit-
    identical to the exhaustive scorer (same ascending-term float64
    accumulation; exclusion is strict-inequality so exact ties are
    untouched)."""
    empty = np.array([], np.int64), np.array([], np.float64)
    present = [t for t in terms_sorted if t in cache]
    if not present:
        return empty
    if any(t not in cache.block_max_tf for t in present):
        # no score-bound metadata (legacy rows): plain exhaustive
        full = _mask_deleted({t: cache.full(t) for t in present}, dead)
        d, s = _score_union_exhaustive(full, terms_sorted, idf, avgdl)
        return _topk(d, s, k)
    ub = {
        t: float(
            (
                idf[t]
                * bm25_tf_weight(
                    cache.block_max_tf[t], cache.block_min_dl[t], _adl(avgdl, t)
                )
            ).max()
        )
        for t in present
    }
    order = sorted(present, key=lambda t: (-ub[t], t))

    def _partial(ess: list[str], cand: np.ndarray) -> np.ndarray:
        scores = np.zeros(cand.size, dtype=np.float64)
        for u in sorted(ess):
            du, tfu, dlu = cache.full(u)
            m = _members(du, cand)
            if m.any():
                idx = np.searchsorted(du, cand[m])
                scores[m] += idf[u] * bm25_tf_weight(
                    tfu[idx], dlu[idx], _adl(avgdl, u)
                )
        return scores

    cand = np.array([], np.int64)
    cut = len(order)
    for i, t in enumerate(order):
        cand = np.union1d(cand, cache.full(t)[0])
        rest = order[i + 1 :]
        if not rest:
            cut = len(order)
            break
        live = cand
        if dead is not None and dead.size:
            live = cand[~np.isin(cand, dead, assume_unique=True)]
        if live.size >= k:
            part = _partial(order[: i + 1], live)
            theta_lb = np.partition(part, live.size - k)[live.size - k]
            if sum(ub[u] for u in rest) < theta_lb:
                cut = i + 1
                break
    ess, weak = order[:cut], order[cut:]
    if dead is not None and dead.size:
        cand = cand[~np.isin(cand, dead, assume_unique=True)]
    if cand.size == 0:
        return empty
    gathered = {t: cache.gather(t, cand) for t in weak}
    scores = np.zeros(cand.size, dtype=np.float64)
    for t in terms_sorted:  # accumulation order contract: ascending term
        if t not in cache:
            continue
        dt, tft, dlt = gathered[t] if t in gathered else cache.full(t)
        m = _members(dt, cand)
        if m.any():
            idx = np.searchsorted(dt, cand[m])
            scores[m] += idf[t] * bm25_tf_weight(
                tft[idx], dlt[idx], _adl(avgdl, t)
            )
    return _topk(cand, scores, k)


def _eval_bool_blockmax(
    cache: _BlockCache,
    ast,
    req_sorted: list[str],
    pos_terms: list[str],
    idf: dict[str, float],
    avgdl: float,
    dead: np.ndarray | None = None,
) -> tuple[np.ndarray, np.ndarray]:
    """Boolean-query evaluation with block skipping (caller guarantees
    req_sorted is non-empty): candidates seed from the rarest REQUIRED
    conjunct and every other query term — OR branches and NOT terms
    included — is decoded only in the blocks those candidates touch.
    Sound because every match must lie in the required-term
    intersection, and each restricted set is a superset of that term's
    postings within the candidate range; results are identical to
    evaluating the AST over full decodes."""
    from ..functions import boolquery as bq

    empty = np.array([], np.int64), np.array([], np.float64)
    if any(t not in cache for t in req_sorted):
        return empty  # a required conjunct is absent → no match here
    order = sorted(req_sorted, key=lambda t: cache.df[t])
    seed = order[0]
    seed_docs = cache.full(seed)[0]
    if dead is not None and dead.size:
        seed_docs = seed_docs[~np.isin(seed_docs, dead, assume_unique=True)]
    cand = seed_docs
    restricted: dict[str, tuple] = {seed: cache.full(seed)}
    for t in order[1:]:
        if cand.size == 0:
            return empty
        g = cache.gather(t, cand)
        restricted[t] = g
        cand = cand[_members(g[0], cand)]
    if cand.size == 0:
        return empty
    for t in cache.blob:
        if t not in restricted:
            restricted[t] = cache.gather(t, cand)
    doc_sets = {t: g[0] for t, g in restricted.items()}
    doc_sets[seed] = seed_docs  # dead already removed from the seed
    final = bq.eval_docs(ast, doc_sets)
    if isinstance(final, tuple) or final.size == 0:
        return empty
    scores = bq.score_candidates(final, restricted, pos_terms, idf, avgdl)
    return final, scores


def _score_union_blockmax(
    blobs: dict[str, bytes],
    blocks: dict[str, tuple[np.ndarray, np.ndarray, np.ndarray]],  # last, ub, off
    terms_sorted: list[str],
    idf: dict[str, float],
    avgdl: float,
    k: int,
    deleted: np.ndarray | None = None,
    decoded: dict | None = None,
    full_decode=None,
) -> tuple[np.ndarray, np.ndarray]:
    """Block-max WAND, best-first over windows (vectorized bounds).

    ``decoded`` may be a caller-owned persistent dict keyed (term,
    block_idx) — a serving process passes its per-segment block cache
    so repeated queries stop re-decoding hot blocks.  ``full_decode``
    (term → (d, tf, dl)) likewise lets the caller route the adaptive
    exhaustive fallback through its decoded-postings cache.

    Windows = merged block boundaries across query terms.  Per-window
    upper bounds (sum of covering blocks' bounds) are computed for ALL
    windows in a few whole-array searchsorted/sum passes — the previous
    per-window Python walk would hit ~10^7 iterations per stopword at
    10^9-doc segments.  Windows are then processed in DESCENDING
    upper-bound order; once the top-k floor theta reaches the next
    window's bound the loop stops — every unprocessed window satisfies
    score <= ub < theta or (== theta, which IS still processed so that
    smaller doc ids win exact ties).  Decoded windows score with the
    standard sorted-term accumulation, so scores stay bit-identical to
    the exhaustive path.
    """
    present = [t for t in terms_sorted if t in blobs]
    if not present:
        return np.array([], np.int64), np.array([], np.float64)
    # window boundaries = union of block last-doc ids
    bounds = reduce(np.union1d, (blocks[t][0] for t in present))
    W = len(bounds)
    los = np.empty(W, dtype=np.int64)
    los[0] = 0
    los[1:] = bounds[:-1] + 1
    # per-term covering block of each window + activity mask; summed
    # upper bound per window — all vectorized
    ub_w = np.zeros(W, dtype=np.float64)
    cover: dict[str, tuple[np.ndarray, np.ndarray]] = {}
    for t in present:
        bl, b_ub, _ = blocks[t]
        idx = np.searchsorted(bl, bounds, side="left")
        valid = idx < len(bl)
        idx_c = np.minimum(idx, len(bl) - 1)
        prev_last = np.where(idx_c > 0, bl[np.maximum(idx_c - 1, 0)], -1)
        active = valid & (prev_last < bounds)
        ub_w += np.where(active, b_ub[idx_c], 0.0)
        cover[t] = (idx_c, active)

    order = np.argsort(-ub_w, kind="stable")
    ub_desc = ub_w[order]
    heap: list[tuple[float, int]] = []  # (score, -doc) min-heap of size k
    theta = -np.inf
    if decoded is None:
        decoded = {}
    for pos, w in enumerate(order.tolist()):
        if len(heap) == k and ub_w[w] < theta:
            break  # all remaining windows have ub <= this one < theta
        if pos and pos % 16 == 0 and len(heap) == k:
            # adaptive bail-out: when upper bounds are flat (stopword
            # queries), WAND cannot prune and the per-window walk costs
            # more than one vectorized full decode — if most remaining
            # windows still beat theta, finish exhaustively instead
            survivors = int(np.searchsorted(-ub_desc, -theta, side="right")) - pos
            if survivors > 0.5 * (W - pos):
                full = {}
                for t in present:
                    full[t] = (
                        full_decode(t)
                        if full_decode is not None
                        else codecs.decode_postings(blobs[t])
                    )
                full = _mask_deleted(full, deleted)
                docs_a, scores_a = _score_union_exhaustive(
                    full, terms_sorted, idf, avgdl
                )
                return _topk(docs_a, scores_a, k)
        lo_doc, w_hi = int(los[w]), int(bounds[w])
        win_post: dict[str, tuple[np.ndarray, np.ndarray, np.ndarray]] = {}
        for t in present:
            idx_c, active = cover[t]
            if not active[w]:
                continue
            ci = int(idx_c[w])
            key = (t, ci)
            if key not in decoded:
                _, _, b_off = blocks[t]
                decoded[key] = codecs.decode_block(blobs[t], int(b_off[ci]))[:3]
            d, tf, dl = decoded[key]
            m = (d >= lo_doc) & (d <= w_hi)
            if deleted is not None and deleted.size:
                # block upper bounds stay valid (they bound a
                # superset); only the decoded docs need masking
                m &= ~np.isin(d, deleted, assume_unique=True)
            if m.any():
                win_post[t] = (d[m], tf[m], dl[m])
        if not win_post:
            continue
        docs_w, scores_w = _score_union_exhaustive(win_post, terms_sorted, idf, avgdl)
        for doc, sc in zip(docs_w.tolist(), scores_w.tolist()):
            if len(heap) < k:
                heapq.heappush(heap, (sc, -doc))
                if len(heap) == k:
                    theta = heap[0][0]
            elif sc > theta or (sc == theta and -doc > heap[0][1]):
                heapq.heapreplace(heap, (sc, -doc))
                theta = heap[0][0]
    if not heap:
        return np.array([], np.int64), np.array([], np.float64)
    items = sorted(heap, key=lambda x: (-x[0], -x[1]))
    return (
        np.array([-d for _, d in items], dtype=np.int64),
        np.array([s for s, _ in items], dtype=np.float64),
    )


def _phrase_suggest_rows(
    searcher,
    text: str,
    size: int,
    max_edits: int,
    max_errors: int,
    per_term: int,
    collate: bool,
    count_fn,
) -> "list[tuple[str, float]]":
    """Shared phrase-suggester front half (both engines pass
    themselves — they expose the same expand_fuzzy/global_dfs/n_docs
    surface): tokenize, per-position fuzzy candidates df-ranked from
    the termdict, beam assembly (functions/suggest.py), optional
    collation dropping corrections with no conjunctive match."""
    from ..functions.suggest import assemble_phrase_suggestions
    from ..functions.tokenize import py_tokenize

    tokens = py_tokenize(text or "")
    if not tokens:
        return []
    cand_terms: dict[str, list[str]] = {}
    for t in dict.fromkeys(tokens):
        cand_terms[t] = sorted(set(searcher.expand_fuzzy(t, max_edits)) | {t})
    all_terms = sorted({c for cs in cand_terms.values() for c in cs})
    dfs = searcher.global_dfs(all_terms)
    per_pos = []
    for t in tokens:
        ranked = sorted(
            ((c, int(dfs.get(c, 0))) for c in cand_terms[t]),
            key=lambda r: (-r[1], r[0]),
        )[: max(1, int(per_term))]
        if all(c != t for c, _df in ranked):
            ranked.append((t, int(dfs.get(t, 0))))
        per_pos.append(ranked)
    out = assemble_phrase_suggestions(
        tokens, per_pos, searcher.n_docs, size=size, max_errors=max_errors
    )
    if collate:
        out = [(s, sc) for s, sc in out if count_fn(s.split(" ")) > 0]
    return out


class IndexSearcher:
    """Query-side entry point over a published index directory."""

    def __init__(self, spark: SparkSession, index_dir: str):
        self.spark = spark
        self.index_dir = index_dir
        self._load_snapshot()

    def _load_snapshot(self) -> None:
        """Pin this searcher to the CURRENT manifest generation: table
        paths are resolved through the manifest's generation pointers
        once, so a maintenance op publishing a new generation (atomic
        manifest flip) never changes what this searcher reads — old
        state until reload_manifest(), complete new state after, never
        a mix."""
        from ..layout import load_manifest, table_path

        self.manifest = load_manifest(self.index_dir)
        self.n_docs = self.manifest["globals"]["n_docs"]
        self.avgdl = self.manifest["globals"]["avgdl"]
        self.n_term_buckets = self.manifest["params"]["n_term_buckets"]
        self._postings = self.spark.read.parquet(
            table_path(self.index_dir, "postings", self.manifest)
        )
        td_path = table_path(self.index_dir, "termdict", self.manifest)
        self._termdict = (
            self.spark.read.parquet(td_path) if os.path.exists(td_path) else None
        )
        self._doclens_path = table_path(self.index_dir, "doclens", self.manifest)
        self._nested_path = table_path(self.index_dir, "nested", self.manifest)
        self._refresh_deletes_state()

    def _refresh_deletes_state(self) -> None:
        """Tombstone consultation is per-segment INSIDE scoring tasks
        (read_segment_deletes); the driver only captures the resolved
        deletes dir plus the manifest epoch for snapshot pinning and
        cache keying — two strings/ints in the closure instead of every
        tombstone."""
        from ..layout import table_path

        self._deletes_dir = table_path(self.index_dir, "deletes", self.manifest)
        self._has_deletes = os.path.isdir(self._deletes_dir)
        self._deletes_epoch = int(self.manifest.get("deletes_epoch", 0))

    def _segment_deletes_fn(self):
        """Closure-safe (deletes_dir, has, epoch) → per-task delete
        lookup, pinned to this searcher's snapshot."""
        deletes_dir = self._deletes_dir
        has, epoch = self._has_deletes, self._deletes_epoch
        if not has:
            return lambda seg: None
        return lambda seg: read_segment_deletes(deletes_dir, int(seg), epoch)

    def reload_manifest(self) -> None:
        """Advance to the latest published generation after
        extend_index/upsert_index/update_facet_field/compact_index."""
        self._load_snapshot()

    def _term_rows(self, terms: list[str]) -> DataFrame:
        buckets = sorted({term_bucket(t, self.n_term_buckets) for t in terms})
        return self._postings.filter(
            F.col("term_bucket").isin(buckets) & F.col("term").isin(terms)
        )

    def global_dfs(self, terms: list[str]) -> dict[str, int]:
        """Global document frequency per term.  Scans the term DICTIONARY
        (tiny, partition-pruned by term_bucket), never posting blobs."""
        if self._termdict is not None:
            buckets = sorted({term_bucket(t, self.n_term_buckets) for t in terms})
            rows = (
                self._termdict.filter(
                    F.col("term_bucket").isin(buckets) & F.col("term").isin(terms)
                )
                .select("term", "df")
                .collect()
            )
            return {r["term"]: int(r["df"]) for r in rows}
        rows = (
            self._term_rows(terms)
            .groupBy("term")
            .agg(F.sum("df").alias("df"))
            .collect()
        )
        return {r["term"]: int(r["df"]) for r in rows}

    # columns the term/bool scoring kernels need — pos_blob (the
    # positional stream, comparable in bytes to the postings themselves)
    # is deliberately ABSENT: applyInPandas ships every selected column
    # through the shuffle into the Arrow worker, and only phrase
    # queries read positions.
    SCORING_COLS = (
        "segment", "term", "df", "blob",
        "block_last", "block_max_tf", "block_min_dl", "block_off",
    )

    def _rows_with_global_df(self, terms_sorted: list[str]) -> DataFrame | None:
        """Pruned posting rows (scoring columns only) annotated with
        each term's GLOBAL df via a broadcast join against the (pruned)
        term dictionary — so scoring runs as ONE Spark job, no
        driver-side df-lookup job first.  Returns None when the index
        predates the termdict table."""
        if self._termdict is None:
            return None
        buckets = sorted({term_bucket(t, self.n_term_buckets) for t in terms_sorted})
        td = (
            self._termdict.filter(
                F.col("term_bucket").isin(buckets) & F.col("term").isin(terms_sorted)
            )
            .groupBy("term")
            .agg(F.sum("df").alias("df_global"))
        )
        return (
            self._term_rows(terms_sorted)
            .select(*self.SCORING_COLS)
            .join(F.broadcast(td), "term")
        )

    # Auto-gate threshold for two-phase distributed segment pruning:
    # measured crossover on the 200k-doc bench corpus, local[32] (see
    # BENCH/BASELINE.md "segment-prune crossover") — at 100 segments
    # pruning break-evens (job-floor overhead ≈ skipped-task savings),
    # at 400 it wins 1.4-1.7× on both localized and flat rare-term
    # queries; below the threshold the fixed metadata+probe job cost
    # dominates.  The bound-flatness bail-out inside
    # _two_phase_segment_prune caps the worst case above the threshold
    # at one tiny metadata job.
    SEGPRUNE_AUTO_MIN_SEGMENTS = 128

    def search(
        self,
        terms: list[str],
        mode: str = "OR",
        k: int = 10,
        algo: str = "auto",
        segment_prune: bool | None = None,
        min_should_match: int = 1,
    ) -> DataFrame:
        """Top-k BM25.  Returns DataFrame(doc_id, score) already sorted
        by (score desc, doc_id asc), exactly k rows or fewer.

        algo: "auto" (AND → block-skip intersection, OR → MaxScore),
        "bmw" (OR → window block-max WAND), "maxscore" (OR → MaxScore),
        "exhaustive" (always full decode).  All paths are rank- AND
        score-identical; algo only changes how much of each posting
        list is decoded.

        segment_prune=True adds CROSS-SEGMENT pruning (two-phase): a
        metadata-only collect computes per-segment score bounds (see
        LocalSearcher._segment_bounds), the best-bound segment is
        scored first as a probe, and segments whose bound is strictly
        below the probe's k-th score never get a scoring task at all —
        bit-identical (strict inequality forbids ties).  Costs one
        extra small job + one tiny collect: the win is proportional to
        segment count (at 10^12 docs a rare-but-widespread term's task
        fan-out collapses), while on a handful of segments the fixed
        job overhead dominates.  Default None AUTO-GATES on the
        manifest's segment count at the measured crossover
        (SEGPRUNE_AUTO_MIN_SEGMENTS); True/False force it.  The
        sequential LocalSearcher has it always-on for free.
        ``last_segments_skipped`` reports the count.

        ``min_should_match`` (ES analog, OR mode only): a doc must
        contain at least this many of the query terms; scoring stays
        the disjunctive sum over the terms it has.  m=1 is plain OR,
        m=len(terms) equals AND."""
        msm = int(min_should_match)
        if msm > 1 and mode.upper() != "OR":
            raise ValueError("min_should_match applies to OR queries only")
        auto_prune = segment_prune is None
        if auto_prune:
            n_segs = int(
                self.manifest.get("metrics", {}).get("n_segments", 0) or 0
            )
            segment_prune = n_segs >= self.SEGPRUNE_AUTO_MIN_SEGMENTS
        terms_sorted = sorted(set(terms))
        mode_u = mode.upper()
        # per-term when fielded terms are mixed in (prefix expansion
        # over an analyzed field), plain body float otherwise
        avgdl = field_avgdl_map(self.manifest, terms_sorted)
        n_docs = self.n_docs
        get_deletes = self._segment_deletes_fn()

        rows = self._rows_with_global_df(terms_sorted)
        if rows is None:
            # legacy two-job path: collect dfs, then score
            dfs = self.global_dfs(terms_sorted)
            if not dfs or (mode_u == "AND" and any(t not in dfs for t in terms_sorted)):
                return self.spark.createDataFrame([], RESULT_SCHEMA)
            rows = self._term_rows(terms_sorted).select(*self.SCORING_COLS).withColumn(
                "df_global",
                F.create_map(
                    *[x for t, d in dfs.items() for x in (F.lit(t), F.lit(d))]
                )[F.col("term")],
            )

        def score_segment(pdf: pd.DataFrame) -> pd.DataFrame:
            if pdf.empty:
                return pd.DataFrame({"doc_id": [], "score": []})
            _check_unique_terms(pdf)
            dead = get_deletes(pdf["segment"].iloc[0])
            idf = {
                t: bm25_idf(n_docs, int(d))
                for t, d in zip(pdf["term"], pdf["df_global"])
            }
            if msm > 1:
                # dedicated path: the pruned kernels' candidate sets
                # are not msm-safe (a doc matching only weak terms may
                # be excluded before its match count is known)
                postings = {
                    r.term: codecs.decode_postings(bytes(r.blob))
                    for r in pdf.itertuples()
                }
                postings = _mask_deleted(postings, dead)
                docs, scores = _msm_scores(
                    postings, terms_sorted, idf, avgdl, msm
                )
                docs, scores = _topk(docs, scores, k)
                return pd.DataFrame({"doc_id": docs, "score": scores})
            if mode_u == "OR" and algo == "bmw":
                blobs = {r.term: bytes(r.blob) for r in pdf.itertuples()}
                # block upper bound derived at query time from
                # (max_tf, min_dl) and the CURRENT avgdl: stays a valid
                # bound after incremental appends shift avgdl, unlike a
                # score baked at build time.
                blocks = {
                    r.term: (
                        np.asarray(r.block_last, dtype=np.int64),
                        idf[r.term]
                        * bm25_tf_weight(
                            np.asarray(r.block_max_tf, dtype=np.int64),
                            np.asarray(r.block_min_dl, dtype=np.int64),
                            avgdl,
                        ),
                        np.asarray(r.block_off, dtype=np.int32),
                    )
                    for r in pdf.itertuples()
                }
                docs, scores = _score_union_blockmax(
                    blobs, blocks, terms_sorted, idf, avgdl, k, deleted=dead
                )
                return pd.DataFrame({"doc_id": docs, "score": scores})
            if mode_u == "AND" and algo != "exhaustive":
                cache = _BlockCache(pdf.itertuples())
                docs, scores = _score_intersection_blockmax(
                    cache, terms_sorted, idf, avgdl, dead=dead
                )
                docs, scores = _topk(docs, scores, k)
                return pd.DataFrame({"doc_id": docs, "score": scores})
            if mode_u == "OR" and algo in ("auto", "maxscore"):
                cache = _BlockCache(pdf.itertuples())
                docs, scores = _score_union_maxscore(
                    cache, terms_sorted, idf, avgdl, k, dead=dead
                )
                return pd.DataFrame({"doc_id": docs, "score": scores})
            postings = {}
            for r in pdf.itertuples():
                d, tf, dl = codecs.decode_postings(bytes(r.blob))
                postings[r.term] = (d, tf, dl)
            postings = _mask_deleted(postings, dead)
            if mode_u == "AND":
                docs, scores = _score_intersection(postings, terms_sorted, idf, avgdl)
            else:
                docs, scores = _score_union_exhaustive(postings, terms_sorted, idf, avgdl)
            docs, scores = _topk(docs, scores, k)
            return pd.DataFrame({"doc_id": docs, "score": scores})

        self.last_segments_skipped = 0
        if segment_prune and msm == 1 and algo not in ("bmw", "exhaustive"):
            pruned = self._two_phase_segment_prune(
                rows, score_segment, terms_sorted, mode_u, k,
                auto=auto_prune, avgdl=avgdl,
            )
            if pruned is not None:
                return pruned
        per_segment = _per_segment_apply(rows, score_segment, RESULT_SCHEMA)
        return per_segment.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)

    # auto-mode bail-out: attempt the probe only when at least this
    # fraction of candidate segments has a bound under half the best
    # segment's bound.  On a bound-flat corpus (terms spread uniformly
    # over doc ids) the probe floor can't beat near-max bounds, so the
    # probe+survivor jobs are pure overhead — measured at 100 segments:
    # prune 1.61 s vs plain 1.14 s with only 23 skipped.  Segment-
    # correlated terms (time/site-ordered crawls — the web-scale norm)
    # pass this test and collapse the task fan-out.
    SEGPRUNE_MIN_DISCRIMINATION = 0.3

    def _two_phase_segment_prune(
        self, rows: DataFrame, score_segment, terms_sorted, mode_u, k,
        auto: bool = False,
        avgdl: "float | dict[str, float] | None" = None,
    ) -> DataFrame | None:
        """Probe-then-prune: bounds from a metadata-only collect (tiny —
        |terms| × |segments| scalars, no blobs cross the wire thanks to
        parquet column pruning), one scoring task for the best-bound
        segment, then scoring tasks ONLY for segments whose bound can
        still reach the probe's k-th score.  Returns None when pruning
        cannot pay: fewer than 3 candidate segments (pre-gated on the
        manifest's segment count so the metadata job isn't launched),
        or — in auto mode — a bound distribution too flat for the probe
        floor to skip anything (SEGPRUNE_MIN_DISCRIMINATION; the only
        cost of a bail-out is the metadata collect)."""
        if int(self.manifest.get("metrics", {}).get("n_segments", 999) or 999) < 3:
            return None
        if avgdl is None:
            avgdl = self.avgdl
        meta = rows.select(
            "segment",
            "term",
            "df",
            "df_global",
            F.array_max("block_max_tf").alias("mx"),
            F.array_min("block_min_dl").alias("mn"),
        ).collect()
        bounds: dict[int, float] = {}
        present: dict[int, int] = {}
        # per segment: df of its strongest term (highest single-row
        # bound) — the docs that can push the probe's k-th score above
        # other segments' bounds.  Sizing the probe by this count fixes
        # the dilution failure where a 3-segment probe holds too few
        # rare-term docs to establish a floor above stopword-only
        # segment bounds (measured: 0 skips at 400 segments, k=10).
        strong_df: dict[int, tuple[float, int]] = {}
        for r in meta:
            seg = int(r["segment"])
            if r["mx"] is None or r["mn"] is None:
                b = float("inf")  # legacy row without bounds: never skip
            else:
                idf_t = bm25_idf(self.n_docs, int(r["df_global"]))
                b = idf_t * float(
                    bm25_tf_weight(
                        np.array([r["mx"]], np.float64),
                        np.array([r["mn"]], np.float64),
                        _adl(avgdl, r["term"]),
                    )[0]
                )
            bounds[seg] = bounds.get(seg, 0.0) + b
            present[seg] = present.get(seg, 0) + 1
            if b >= strong_df.get(seg, (-1.0, 0))[0]:
                strong_df[seg] = (b, int(r["df"]))
        segs = [
            s
            for s in bounds
            if mode_u != "AND" or present[s] == len(terms_sorted)
        ]
        if len(segs) < 3:
            return None
        if auto:
            finite = [bounds[s] for s in segs if bounds[s] != float("inf")]
            if not finite:
                return None
            b_max = max(finite)
            frac = sum(1 for b in finite if b < 0.5 * b_max) / len(segs)
            if frac < self.SEGPRUNE_MIN_DISCRIMINATION:
                return None
        # probe the top-P bound segments TOGETHER: one segment's local
        # k-th is diluted by its own weak matches, so the probe grows
        # until it holds >= 2k strong-term docs (and at least the old
        # max(2, ceil(k/4)) segments) — enough that its union's k-th
        # approaches the global k-th, a stronger (still conservative)
        # floor.  Cap at half the candidates: past that, pruning the
        # remainder can't recoup the probe.
        order = sorted(segs, key=lambda s: (-bounds[s], s))
        n_min = max(2, -(-k // 4))
        cap = max(1, len(segs) // 2)
        n_probe, cum_strong = 0, 0
        for s in order:
            if n_probe >= cap:
                break
            n_probe += 1
            cum_strong += strong_df.get(s, (0.0, 0))[1]
            if n_probe >= n_min and cum_strong >= 2 * k:
                break
        n_probe = min(max(n_probe, min(n_min, cap)), cap)
        probe_segs = order[:n_probe]
        probe = (
            _per_segment_apply(
                rows.filter(F.col("segment").isin(probe_segs)),
                score_segment, RESULT_SCHEMA,
            )
            .orderBy(F.desc("score"), F.asc("doc_id"))
            .limit(k)
            .collect()
        )
        floor = float(probe[k - 1]["score"]) if len(probe) >= k else None
        survivors = [
            s
            for s in order[n_probe:]
            if floor is None or not bounds[s] < floor
        ]
        self.last_segments_skipped = len(segs) - n_probe - len(survivors)
        probe_df = self.spark.createDataFrame(probe, RESULT_SCHEMA)
        if survivors:
            rest = _per_segment_apply(
                rows.filter(F.col("segment").isin(survivors)),
                score_segment, RESULT_SCHEMA,
            )
            probe_df = probe_df.unionByName(rest)
        return probe_df.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)

    def search_bool(
        self, query: str, k: int = 10, synonyms: "dict | None" = None
    ) -> DataFrame:
        """Boolean query string (`a AND (b OR c) AND NOT d`) — the ES
        query-string analog.  The expression filters; BM25 scores sum
        over the positive terms each match contains (see
        functions/boolquery.py).  Segment-local evaluation is globally
        correct because a doc's full term set lives in one segment.

        Doc-value range atoms (``n_chars:[150 TO 400]``,
        ``warc_ts:[2025-02-01T00:00:00 TO *]`` — ES query_string range
        syntax, filter context) compose with any boolean structure: the
        per-atom predicates push into the doclens parquet scan and the
        allowed ids are cogrouped with the posting rows per segment, so
        range evaluation never materializes on the driver."""
        from ..functions import boolquery as bq

        ast = bq.parse(
            query,
            analyzed_fields=set(analyzed_fields_of(self.manifest)),
            dv_fields=dv_filter_fields_of(self.manifest),
            nested_fields=nested_paths_of(self.manifest),
        )
        if bq.has_wildcards(ast):
            ast = bq.expand_wildcards(ast, self.expand_prefix, self.expand_fuzzy)
        if synonyms:
            # ES synonym_graph at search time — a pure query rewrite,
            # so every downstream kernel (doc-set, block-skip, pruned)
            # sees a plain boolean AST
            ast = bq.expand_synonyms(ast, synonyms)
        terms = bq.all_terms(ast)
        pos_terms = bq.positive_terms(ast)
        req = bq.required_terms(ast)
        ranges = bq.range_atoms(ast)
        phrases = bq.phrase_atoms(ast)
        nested = bq.nested_atoms(ast)
        boosts = bq.term_boosts(ast)
        if not pos_terms:
            raise bq.QueryParseError("query has no positive terms")
        avgdl = field_avgdl_map(self.manifest, terms)
        n_docs = self.n_docs
        get_deletes = self._segment_deletes_fn()

        rows = self._rows_with_global_df(terms)
        if rows is None:
            dfs = self.global_dfs(terms)
            rows = self._term_rows(terms).select(*self.SCORING_COLS).withColumn(
                "df_global",
                F.create_map(
                    *[x for t, d in dfs.items() for x in (F.lit(t), F.lit(d))]
                )[F.col("term")],
            )

        if ranges or phrases or nested:
            # range/phrase/nested filters evaluate on the doc-set path
            # (block-skip can't see doc-value sets or positions);
            # allowed ids ride a per-segment cogroup, tagged by atom key
            from . import docvalues as dv
            from . import nested as nst

            dl = dv.doclens_df(self)
            dpp, seg_group = dv._seg_params(self.manifest)
            seg_of = dv.segment_expr(F.col("doc_id"), dpp, seg_group)
            parts = []
            for rt in ranges:
                dv.check_field(self, rt.field, dl.columns)
                parts.append(
                    dl.filter(
                        dv.range_pred(rt, dv.is_array_type(dl, rt.field))
                    ).select(
                        seg_of.alias("segment"),
                        "doc_id",
                        F.lit(rt.key()).alias("rkey"),
                    )
                )
            for pt in phrases:
                parts.append(
                    self._phrase_matches(list(pt.tokens), pt.slop).select(
                        seg_of.alias("segment"),
                        "doc_id",
                        F.lit(pt.key()).alias("rkey"),
                    )
                )
            for nt in nested:
                parts.append(
                    nst.atom_match_df(self, nt).select(
                        seg_of.alias("segment"),
                        "doc_id",
                        F.lit(nt.key()).alias("rkey"),
                    )
                )
            allowed = parts[0]
            for p in parts[1:]:
                allowed = allowed.unionByName(p)
            rkeys = (
                [rt.key() for rt in ranges]
                + [pt.key() for pt in phrases]
                + [nt.key() for nt in nested]
            )

            def score_segment_rng(
                key, left: pd.DataFrame, right: pd.DataFrame
            ) -> pd.DataFrame:
                dead = get_deletes(int(key[0]))
                postings, idf = {}, {}
                if not left.empty:
                    _check_unique_terms(left)
                    idf = {
                        t: bm25_idf(n_docs, int(d)) * boosts.get(t, 1.0)
                        for t, d in zip(left["term"], left["df_global"])
                    }
                    for r in left.itertuples():
                        postings[r.term] = codecs.decode_postings(bytes(r.blob))
                postings = _mask_deleted(postings, dead)
                doc_sets = {t: p[0] for t, p in postings.items()}
                empty_ids = np.array([], np.int64)
                for rk in rkeys:  # atoms with no match in this segment
                    doc_sets[rk] = empty_ids
                for rk, grp in right.groupby("rkey"):
                    ids = np.sort(grp["doc_id"].to_numpy(np.int64))
                    if dead is not None and dead.size and ids.size:
                        ids = ids[~np.isin(ids, dead, assume_unique=True)]
                    doc_sets[rk] = ids
                cand = bq.eval_docs(ast, doc_sets)
                if isinstance(cand, tuple) or cand.size == 0:
                    return pd.DataFrame({"doc_id": [], "score": []})
                scores = bq.score_candidates(cand, postings, pos_terms, idf, avgdl)
                d, s = _topk(cand, scores, k)
                return pd.DataFrame({"doc_id": d, "score": s})

            per_segment = (
                rows.groupBy("segment")
                .cogroup(allowed.groupBy("segment"))
                .applyInPandas(score_segment_rng, RESULT_SCHEMA)
            )
            return per_segment.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)

        def score_segment(pdf: pd.DataFrame) -> pd.DataFrame:
            if pdf.empty:
                return pd.DataFrame({"doc_id": [], "score": []})
            _check_unique_terms(pdf)
            dead = get_deletes(pdf["segment"].iloc[0])
            idf = {
                t: bm25_idf(n_docs, int(d)) * boosts.get(t, 1.0)
                for t, d in zip(pdf["term"], pdf["df_global"])
            }
            if req:
                # required conjuncts exist → block-skip evaluation
                cache = _BlockCache(pdf.itertuples())
                d, s = _topk(
                    *_eval_bool_blockmax(
                        cache, ast, req, pos_terms, idf, avgdl, dead=dead
                    ),
                    k,
                )
                return pd.DataFrame({"doc_id": d, "score": s})
            postings = {}
            for r in pdf.itertuples():
                d, tf, dl = codecs.decode_postings(bytes(r.blob))
                postings[r.term] = (d, tf, dl)
            postings = _mask_deleted(postings, dead)
            doc_sets = {t: p[0] for t, p in postings.items()}
            cand = bq.eval_docs(ast, doc_sets)
            if isinstance(cand, tuple) or cand.size == 0:
                return pd.DataFrame({"doc_id": [], "score": []})
            scores = bq.score_candidates(cand, postings, pos_terms, idf, avgdl)
            d, s = _topk(cand, scores, k)
            return pd.DataFrame({"doc_id": d, "score": s})

        per_segment = _per_segment_apply(rows, score_segment, RESULT_SCHEMA)
        return per_segment.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)

    def search_fielded(
        self,
        terms: list[str],
        fields: dict[str, float] | None = None,
        k: int = 10,
        mode: str = "OR",
        tie_breaker: float = 0.0,
    ) -> DataFrame:
        """Multi-field BM25F-lite top-k — the ES ``multi_match``
        ``most_fields`` analog over the per-field postings the build
        wrote for ``text_fields`` (field-prefixed terms whose blobs
        bake the FIELD's length as dl).

        score(d) = Σ over (field f, token t): w_f · idf(df_{f,t}) ·
        tf/(tf + k1·(1-b+b·dl_f/avgdl_f)) · (k1+1) — each field gets
        its own length norm and document frequency; weights fold into
        idf so the standard MaxScore kernel runs unchanged (bounds
        scale linearly).  ``fields`` maps field → boost, default: body
        + every analyzed field at weight 1.  The reference exposes this
        via ES multi-field search on its exported mapping
        (hail_scripts/v02/utils/elasticsearch_utils.py:38-77).

        mode="AND" is the ES ``operator: and`` variant: every query
        TOKEN must match in at least one of the fields (per-token
        cross-field OR, conjunction across tokens); matching docs still
        score as the weighted most_fields sum.

        mode="BEST" is the ES ``dis_max`` / ``multi_match best_fields``
        variant: each field accumulates its own BM25 sum and the doc
        scores max(field sums) + ``tie_breaker`` × (the other field
        sums) — the "one field should dominate" ranking for fields that
        compete rather than complement (_fielded_best_scores)."""
        mode_u = mode.upper()
        text_fields = analyzed_fields_of(self.manifest)
        if fields is None:
            fields = {"text": 1.0, **{f: 1.0 for f in text_fields}}
        expanded, weight = expand_fielded_terms(terms, fields, text_fields)
        avgdl = field_avgdl_map(self.manifest, expanded)
        variants = {
            t: sorted(
                t if f == "text" else f"{f}:{t}" for f in fields
            )
            for t in dict.fromkeys(terms)
        }
        n_docs = self.n_docs
        get_deletes = self._segment_deletes_fn()
        rows = self._rows_with_global_df(expanded)
        if rows is None:
            dfs = self.global_dfs(expanded)
            if not dfs:
                return self.spark.createDataFrame([], RESULT_SCHEMA)
            rows = self._term_rows(expanded).select(*self.SCORING_COLS).withColumn(
                "df_global",
                F.create_map(
                    *[x for t, d in dfs.items() for x in (F.lit(t), F.lit(d))]
                )[F.col("term")],
            )

        def score_segment(pdf: pd.DataFrame) -> pd.DataFrame:
            if pdf.empty:
                return pd.DataFrame({"doc_id": [], "score": []})
            _check_unique_terms(pdf)
            dead = get_deletes(pdf["segment"].iloc[0])
            idf = {
                t: weight[t] * bm25_idf(n_docs, int(d))
                for t, d in zip(pdf["term"], pdf["df_global"])
            }
            if mode_u in ("AND", "BEST"):
                postings = {}
                for r in pdf.itertuples():
                    postings[r.term] = codecs.decode_postings(bytes(r.blob))
                postings = _mask_deleted(postings, dead)
                if mode_u == "AND":
                    docs, scores = _fielded_and_scores(
                        postings, variants, expanded, idf, avgdl
                    )
                else:
                    docs, scores = _fielded_best_scores(
                        postings,
                        {t: fielded_term_field(t) for t in expanded},
                        expanded,
                        idf,
                        avgdl,
                        tie_breaker,
                    )
                docs, scores = _topk(docs, scores, k)
                return pd.DataFrame({"doc_id": docs, "score": scores})
            cache = _BlockCache(pdf.itertuples())
            docs, scores = _score_union_maxscore(
                cache, expanded, idf, avgdl, k, dead=dead
            )
            return pd.DataFrame({"doc_id": docs, "score": scores})

        per_segment = _per_segment_apply(rows, score_segment, RESULT_SCHEMA)
        return per_segment.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)

    DEFAULT_MAX_EXPANSIONS = 128

    def expand_prefix(
        self, prefix: str, max_expansions: int = DEFAULT_MAX_EXPANSIONS
    ) -> list[str]:
        """Indexed terms starting with ``prefix``, sorted — a termdict
        RANGE scan ([prefix, prefix+1) on the sorted term column, the
        Lucene terms-enum seekCeil analog; the reference gets this from
        ES regex/wildcard field matching, elasticsearch_client.py:166-
        177).  A body prefix never expands into field-prefixed or facet
        terms; ``title:fo`` expands within the title field.  More than
        ``max_expansions`` matches raises PrefixExpansionError (the ES
        too_many_clauses analog) — silently truncating would return a
        plausible but wrong ranking."""
        lo, hi = prefix_term_range(prefix)
        src = self._termdict if self._termdict is not None else self._postings
        cond = (F.col("term") >= lo) & (F.col("term") < hi)
        if ":" not in prefix:
            # exclude analyzed-field terms (title:foo sorts inside
            # [t, u)) — facet tokens (__f_v__) sort before 'a' and can
            # only enter via a '_' prefix, which the validator rejects
            cond &= ~F.col("term").contains(":")
        rows = (
            src.filter(cond)
            .select("term")
            .distinct()
            .limit(max_expansions + 1)
            .collect()
        )
        if len(rows) > max_expansions:
            raise PrefixExpansionError(
                f"prefix {prefix!r} expands to more than {max_expansions} "
                "terms; narrow the prefix or raise max_expansions"
            )
        return sorted(r["term"] for r in rows)

    def search_prefix(
        self,
        prefix: str,
        k: int = 10,
        max_expansions: int = DEFAULT_MAX_EXPANSIONS,
    ) -> DataFrame:
        """Prefix query ``foo*``: termdict range expansion → bounded
        disjunctive BM25 (the ES ``rewrite: scoring_boolean`` wildcard
        semantics — every expanded term scores with its own idf)."""
        terms = self.expand_prefix(prefix, max_expansions)
        if not terms:
            return self.spark.createDataFrame([], RESULT_SCHEMA)
        return self.search(terms, mode="OR", k=k)

    DEFAULT_FUZZY_EXPANSIONS = 50  # the ES fuzzy-query default

    def expand_fuzzy(
        self,
        term: str,
        max_edits: int = 1,
        prefix_length: int = 0,
        max_expansions: int = DEFAULT_FUZZY_EXPANSIONS,
    ) -> list[str]:
        """Indexed terms within ``max_edits`` Levenshtein edits of
        ``term``, sorted — the ES ``fuzzy`` query's expansion (Lucene
        walks a Levenshtein automaton over its terms index; the analog
        here is a termdict scan with LENGTH pushdown ±max_edits and,
        with ``prefix_length`` > 0, the same sorted-term range pruning
        as prefixes).  Distance is classic unit-cost Levenshtein —
        Spark's ``levenshtein`` expression, computed JVM-side on the
        pruned termdict, identical to the serving twin's pure-python DP
        and DuckDB's ``levenshtein``.  ``term`` may be field-prefixed
        (``title:foo``) to fuzz within an analyzed field.  Over
        ``max_expansions`` matches raises FuzzyExpansionError."""
        if not _PREFIX_RE.match(term):
            raise ValueError(
                f"bad fuzzy term {term!r}: expected lowercase [a-z0-9]+ "
                "with an optional 'field:' prefix"
            )
        field, body = (
            term.split(":", 1) if ":" in term else (None, term)
        )
        src = self._termdict if self._termdict is not None else self._postings
        cand = F.col("term")
        if field is not None:
            cand_body = F.substring_index(cand, ":", -1)
            cond = cand.startswith(field + ":")
        else:
            cand_body = cand
            cond = ~cand.contains(":") & ~cand.startswith("__")
        if prefix_length > 0:
            lo, hi = prefix_term_range(term[: len(term) - len(body) + prefix_length])
            cond &= (cand >= lo) & (cand < hi)
        cond &= F.length(cand_body).between(
            len(body) - max_edits, len(body) + max_edits
        )
        cond &= F.levenshtein(cand_body, F.lit(body)) <= max_edits
        rows = (
            src.filter(cond)
            .select("term")
            .distinct()
            .limit(max_expansions + 1)
            .collect()
        )
        if len(rows) > max_expansions:
            raise FuzzyExpansionError(
                f"fuzzy term {term!r} (edits≤{max_edits}) expands to more "
                f"than {max_expansions} terms; raise max_expansions or "
                "prefix_length"
            )
        return sorted(r["term"] for r in rows)

    def search_fuzzy(
        self,
        term: str,
        k: int = 10,
        max_edits: int = 1,
        prefix_length: int = 0,
        max_expansions: int = DEFAULT_FUZZY_EXPANSIONS,
    ) -> DataFrame:
        """Fuzzy query ``foo~N``: edit-distance expansion → bounded
        disjunctive BM25 (``rewrite: scoring_boolean`` — each matched
        term keeps its own idf, so exact matches naturally outrank
        rare typo variants when their df differs)."""
        terms = self.expand_fuzzy(term, max_edits, prefix_length, max_expansions)
        if not terms:
            return self.spark.createDataFrame([], RESULT_SCHEMA)
        return self.search(terms, mode="OR", k=k)

    def expand_regexp(
        self,
        pattern: str,
        max_expansions: int = DEFAULT_MAX_EXPANSIONS,
        field: "str | None" = None,
    ) -> list[str]:
        """Indexed terms fully matching ``pattern`` (implicitly
        anchored, conservative cross-engine dialect — see
        check_regexp), sorted — the ES ``regexp`` query's expansion.
        The reference's ES client matches fields by regex the same way
        (elasticsearch_client.py:166-177).  The pattern's literal
        prefix prunes the termdict scan to a sorted range when it has
        one; the match itself runs JVM-side via ``rlike``.  ``field``
        scopes the match to an analyzed field's terms.  Over
        ``max_expansions`` matches raises RegexpExpansionError."""
        check_regexp(pattern)
        src = self._termdict if self._termdict is not None else self._postings
        cand = F.col("term")
        if field is not None:
            if not re.fullmatch(r"[a-z0-9]+", field):
                raise ValueError(f"bad field name {field!r}")
            body = F.substring_index(cand, ":", -1)
            cond = cand.startswith(field + ":")
        else:
            body = cand
            cond = ~cand.contains(":") & ~cand.startswith("__")
        prefixes = regexp_prefixes(pattern)
        if prefixes:
            rng = None
            for lit in prefixes:
                pfx = f"{field}:{lit}" if field is not None else lit
                lo, hi = prefix_term_range(pfx)
                r = (cand >= lo) & (cand < hi)
                rng = r if rng is None else (rng | r)
            cond &= rng
        cond &= body.rlike("^(?:" + pattern + ")$")
        rows = (
            src.filter(cond)
            .select("term")
            .distinct()
            .limit(max_expansions + 1)
            .collect()
        )
        if len(rows) > max_expansions:
            raise RegexpExpansionError(
                f"regexp {pattern!r} expands to more than {max_expansions} "
                "terms; narrow the pattern or raise max_expansions"
            )
        return sorted(r["term"] for r in rows)

    def search_regexp(
        self,
        pattern: str,
        k: int = 10,
        max_expansions: int = DEFAULT_MAX_EXPANSIONS,
        field: "str | None" = None,
    ) -> DataFrame:
        """Regexp query: anchored-pattern term expansion → bounded
        disjunctive BM25 (``rewrite: scoring_boolean`` — each matched
        term keeps its own idf)."""
        terms = self.expand_regexp(pattern, max_expansions, field)
        if not terms:
            return self.spark.createDataFrame([], RESULT_SCHEMA)
        return self.search(terms, mode="OR", k=k)

    def _facet_terms_of(self, fields: list[str]) -> dict[str, list[str]]:
        """field → its indexed facet tokens, from the term dictionary
        (vocabulary-bounded — never the postings).  Pseudo-field
        ``dlen`` covers the power-of-two doc-length bucket tokens."""
        src = self._termdict if self._termdict is not None else self._postings
        out: dict[str, list[str]] = {f: [] for f in fields}
        conds = None
        for f in fields:
            c = F.col("term").startswith(f"__{f}_") & F.col("term").endswith("__")
            conds = c if conds is None else (conds | c)
        rows = src.filter(conds).select("term").distinct().collect()
        for r in rows:
            t = r["term"]
            for f in fields:
                if t.startswith(f"__{f}_"):
                    out[f].append(t)
                    break
        return out

    def search_facets(
        self,
        query: list[str] | str,
        fields: list[str],
        mode: str = "OR",
    ) -> DataFrame:
        """ES ``terms`` aggregation: per-facet-value counts of ALL docs
        matching the query — DataFrame(field, value, doc_count), sorted
        by (field, doc_count desc, value).  ``query`` is a term list
        with mode "OR"/"AND", or a boolean query string with
        mode="BOOL".  The reference's seqr UI gets faceted search from
        ES aggregations on the exported index
        (hail_scripts/shared/elasticsearch_utils.py:38-77 facet-typed
        mapping); here the facet tokens' postings ARE the agg input.

        Scale posture: one scoring-shaped job — each segment task
        decodes the query terms' postings once, forms the full match
        set (facet counting is inherently match-set-complete; no top-k
        shortcut exists, same as ES), intersects each facet token's
        postings (sorted-array searchsorted), and emits (field, value,
        partial count); a tiny groupBy-sum merges segments.  Facet
        vocabulary rides an isin filter so the postings scan stays
        term_bucket-pruned."""
        from ..functions import boolquery as bq

        mode_u = mode.upper()
        if mode_u == "BOOL":
            ast = bq.parse(query)  # type: ignore[arg-type]
            qterms = sorted(set(bq.all_terms(ast)))
        else:
            ast = None
            qterms = sorted(set(query))
        facet_terms = self._facet_terms_of(fields)
        fterms = sorted({t for ts in facet_terms.values() for t in ts})
        all_terms = sorted(set(qterms) | set(fterms))
        if not all_terms or not qterms:
            return self.spark.createDataFrame([], FACET_RESULT_SCHEMA)
        rows = self._term_rows(all_terms).select("segment", "term", "blob")
        qset = set(qterms)
        field_of = {
            t: f for f, ts in facet_terms.items() for t in ts
        }
        get_deletes = self._segment_deletes_fn()
        bool_ast = ast

        def facet_segment(pdf: pd.DataFrame) -> pd.DataFrame:
            if pdf.empty:
                return pd.DataFrame(
                    {"field": [], "value": [], "doc_count": []}
                )
            _check_unique_terms(pdf)
            dead = get_deletes(pdf["segment"].iloc[0])
            qdocs: dict[str, np.ndarray] = {}
            facet_rows: list[tuple[str, bytes]] = []
            for r in pdf.itertuples():
                if r.term in qset:
                    d, _tf, _dl = codecs.decode_postings(bytes(r.blob))
                    qdocs[r.term] = d
                if r.term in field_of:
                    facet_rows.append((r.term, bytes(r.blob)))
            if bool_ast is not None:
                cand = bq.eval_docs(bool_ast, qdocs)
                matches = (
                    np.array([], np.int64)
                    if isinstance(cand, tuple)
                    else cand
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
            if dead is not None and dead.size and matches.size:
                matches = matches[~np.isin(matches, dead, assume_unique=True)]
            out = []
            if matches.size:
                for t, blob in facet_rows:
                    fd, _tf, _dl = codecs.decode_postings(blob)
                    n = int(
                        np.isin(fd, matches, assume_unique=True).sum()
                    )
                    if n:
                        f = field_of[t]
                        value = t[len(f"__{f}_") : -2]
                        out.append((f, value, n))
            return pd.DataFrame(
                out, columns=["field", "value", "doc_count"]
            )

        per_segment = _per_segment_apply(rows, facet_segment, FACET_RESULT_SCHEMA)
        return (
            per_segment.groupBy("field", "value")
            .agg(F.sum("doc_count").alias("doc_count"))
            .orderBy("field", F.desc("doc_count"), "value")
        )

    def _query_ast_terms(self, query, mode_u):
        """(ast | None, sorted query terms) for a term-list or BOOL
        string query — shared by the aggregation APIs."""
        from ..functions import boolquery as bq

        if mode_u == "BOOL":
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
            return ast, sorted(set(bq.all_terms(ast)))
        return None, sorted(set(query))

    def search_stats(
        self, query: list[str] | str, mode: str = "OR"
    ) -> DataFrame:
        """ES ``stats`` aggregation over the matching docs' length
        field: one row (n_hits, min_dl, max_dl, sum_dl, avg_dl).
        Needs NO doclens read — dl rides every posting, so each segment
        task derives its partial (count, sum, min, max) from the query
        terms' decoded streams alone; the merge is a 4-scalar combine
        per segment (all associative).  The reference gets this from ES
        aggregations on its exported index
        (hail_scripts/shared/elasticsearch_utils.py metadata fields)."""
        mode_u = mode.upper()
        ast, qterms = self._query_ast_terms(query, mode_u)
        if not qterms:
            return self.spark.createDataFrame([], STATS_PARTIAL_SCHEMA)
        rows = self._term_rows(qterms).select("segment", "term", "blob")
        get_deletes = self._segment_deletes_fn()

        def stats_segment(pdf: pd.DataFrame) -> pd.DataFrame:
            cols = ["n", "sum_dl", "min_dl", "max_dl"]
            if pdf.empty:
                return pd.DataFrame(columns=cols)
            _check_unique_terms(pdf)
            dead = get_deletes(pdf["segment"].iloc[0])
            qdocs, decoded = {}, []
            for r in pdf.itertuples():
                d, _tf, dl = codecs.decode_postings(bytes(r.blob))
                qdocs[r.term] = d
                decoded.append((d, dl))
            matches = _match_docs(qdocs, qterms, mode_u, ast)
            if dead is not None and dead.size and matches.size:
                matches = matches[~np.isin(matches, dead, assume_unique=True)]
            if not matches.size:
                return pd.DataFrame(columns=cols)
            dls = _match_dls(decoded, matches)
            return pd.DataFrame(
                [
                    (
                        int(matches.size),
                        int(dls.sum()),
                        int(dls.min()),
                        int(dls.max()),
                    )
                ],
                columns=cols,
            )

        partials = _per_segment_apply(rows, stats_segment, STATS_PARTIAL_SCHEMA)
        return partials.agg(
            F.sum("n").alias("n_hits"),
            F.min("min_dl").alias("min_dl"),
            F.max("max_dl").alias("max_dl"),
            F.sum("sum_dl").alias("sum_dl"),
            (F.sum("sum_dl") / F.sum("n")).alias("avg_dl"),
        )

    def search_histogram(
        self,
        query: list[str] | str,
        interval: int,
        mode: str = "OR",
    ) -> DataFrame:
        """ES ``histogram`` aggregation on doc length: per fixed-width
        bucket (``floor(dl / interval) * interval``), the count of
        matching live docs — DataFrame(bucket, doc_count) sorted by
        bucket.  Same postings-only plan as search_stats; each segment
        emits its local bucket counts and a tiny groupBy-sum merges."""
        if interval <= 0:
            raise ValueError("interval must be positive")
        mode_u = mode.upper()
        ast, qterms = self._query_ast_terms(query, mode_u)
        if not qterms:
            return self.spark.createDataFrame([], HISTOGRAM_SCHEMA)
        rows = self._term_rows(qterms).select("segment", "term", "blob")
        get_deletes = self._segment_deletes_fn()

        def hist_segment(pdf: pd.DataFrame) -> pd.DataFrame:
            if pdf.empty:
                return pd.DataFrame({"bucket": [], "doc_count": []})
            _check_unique_terms(pdf)
            dead = get_deletes(pdf["segment"].iloc[0])
            qdocs, decoded = {}, []
            for r in pdf.itertuples():
                d, _tf, dl = codecs.decode_postings(bytes(r.blob))
                qdocs[r.term] = d
                decoded.append((d, dl))
            matches = _match_docs(qdocs, qterms, mode_u, ast)
            if dead is not None and dead.size and matches.size:
                matches = matches[~np.isin(matches, dead, assume_unique=True)]
            if not matches.size:
                return pd.DataFrame({"bucket": [], "doc_count": []})
            dls = _match_dls(decoded, matches)
            b, c = np.unique(dls // interval * interval, return_counts=True)
            return pd.DataFrame({"bucket": b, "doc_count": c})

        partials = _per_segment_apply(rows, hist_segment, HISTOGRAM_SCHEMA)
        return (
            partials.groupBy("bucket")
            .agg(F.sum("doc_count").alias("doc_count"))
            .orderBy("bucket")
        )

    def suggest_terms(
        self,
        prefix: str,
        size: int = 10,
        max_edits: int = 0,
        max_expansions: int = 10_000,
    ) -> DataFrame:
        """ES term-suggester analog: candidate index terms for a prefix
        (or, with ``max_edits`` > 0, within edit distance — the
        did-you-mean path), ranked by global document frequency —
        DataFrame(term, df) by (df desc, term asc), ``size`` rows.
        Termdict-only: never touches posting blobs."""
        terms = (
            self.expand_fuzzy(prefix, max_edits, max_expansions=max_expansions)
            if max_edits > 0
            else self.expand_prefix(prefix, max_expansions)
        )
        if not terms:
            return self.spark.createDataFrame(
                [], "term string, df long"
            )
        src = self._termdict if self._termdict is not None else self._postings
        buckets = sorted({term_bucket(t, self.n_term_buckets) for t in terms})
        return (
            src.filter(
                F.col("term_bucket").isin(buckets)
                & F.col("term").isin(terms)
            )
            .groupBy("term")
            .agg(F.sum("df").alias("df"))
            .orderBy(F.desc("df"), F.asc("term"))
            .limit(size)
        )

    def suggest_phrase(
        self,
        text: str,
        size: int = 5,
        max_edits: int = 1,
        max_errors: int = 1,
        per_term: int = 5,
        collate: bool = False,
    ) -> DataFrame:
        """ES phrase suggester (multi-term did-you-mean): corrections
        of ``text`` changing ≤ ``max_errors`` tokens, candidates from
        the termdict fuzzy expansion (≤ ``max_edits``, top
        ``per_term`` by df per position), ranked by a smoothed unigram
        LM; only corrections scoring above the input survive
        (functions/suggest.py).  ``collate=True`` additionally drops
        corrections with no conjunctive match — ES's collate query.
        DataFrame(suggestion, score) by (score desc, suggestion asc).
        Termdict-only (+ one count job per surviving correction when
        collating); never reads posting blobs otherwise."""
        rows = _phrase_suggest_rows(
            self, text, size, max_edits, max_errors, per_term, collate,
            lambda ts: int(
                self.search_count(sorted(set(ts)), "AND").collect()[0][0]
            ),
        )
        return self.spark.createDataFrame(
            rows, "suggestion string, score double"
        )

    MLT_MAX_QUERY_TERMS = 25  # the ES more_like_this default

    def _mlt_terms(
        self,
        like_text: str,
        max_query_terms: int,
        min_term_freq: int,
        min_doc_freq: int,
    ) -> list[str]:
        """ES more_like_this term selection: tokenize the ``like``
        text, keep terms with tf ≥ min_term_freq and corpus df ≥
        min_doc_freq, rank by tf·idf (interestingness — rare terms
        that the text repeats), take the top ``max_query_terms``
        (ties → term asc, deterministic).  One termdict lookup, no
        postings read."""
        from collections import Counter

        from ..functions.tokenize import py_tokenize

        tf = Counter(py_tokenize(like_text))
        cand = sorted(t for t, c in tf.items() if c >= min_term_freq)
        if not cand:
            return []
        dfs = self.global_dfs(cand)
        scored = [
            (tf[t] * bm25_idf(self.n_docs, dfs[t]), t)
            for t in cand
            # unindexed terms never qualify (df 0 < the >=1 floor)
            if dfs.get(t, 0) >= max(min_doc_freq, 1)
        ]
        return [
            t
            for _s, t in sorted(scored, key=lambda x: (-x[0], x[1]))[
                :max_query_terms
            ]
        ]

    def more_like_this(
        self,
        like_text: str,
        k: int = 10,
        max_query_terms: int = MLT_MAX_QUERY_TERMS,
        min_term_freq: int = 1,
        min_doc_freq: int = 2,
    ) -> DataFrame:
        """ES ``more_like_this`` with ``like: <text>``: select the
        text's most interesting terms (tf·idf ranked, df-floored so
        one-off typos can't dominate) and run them as a disjunctive
        BM25 query — similar docs rank by how much of the interesting
        vocabulary they share."""
        top = self._mlt_terms(
            like_text, max_query_terms, min_term_freq, min_doc_freq
        )
        if not top:
            return self.spark.createDataFrame([], RESULT_SCHEMA)
        return self.search(top, mode="OR", k=k)

    def search_page(
        self,
        terms: list[str],
        mode: str = "OR",
        k: int = 10,
        after: tuple[float, int] | None = None,
    ) -> DataFrame:
        """Keyset pagination — the ES ``search_after`` cursor: top-k
        matches strictly AFTER cursor position ``(score, doc_id)`` in
        the global (score desc, doc_id asc) order.  Stateless and
        O(k)-per-page like ES's search_after (vs from+size's O(from+k)
        deep-page blowup): each segment task scores exhaustively, drops
        docs at-or-before the cursor, and keeps its local top-k; the
        global merge is k rows per segment.  Page 1 = after=None."""
        terms_sorted = sorted(set(terms))
        mode_u = mode.upper()
        avgdl, n_docs = self.avgdl, self.n_docs
        get_deletes = self._segment_deletes_fn()
        rows = self._rows_with_global_df(terms_sorted)
        if rows is None:
            dfs = self.global_dfs(terms_sorted)
            if not dfs:
                return self.spark.createDataFrame([], RESULT_SCHEMA)
            rows = self._term_rows(terms_sorted).select(
                *self.SCORING_COLS
            ).withColumn(
                "df_global",
                F.create_map(
                    *[x for t, d in dfs.items() for x in (F.lit(t), F.lit(d))]
                )[F.col("term")],
            )
        cursor = after

        def page_segment(pdf: pd.DataFrame) -> pd.DataFrame:
            if pdf.empty:
                return pd.DataFrame({"doc_id": [], "score": []})
            _check_unique_terms(pdf)
            dead = get_deletes(pdf["segment"].iloc[0])
            idf = {
                t: bm25_idf(n_docs, int(d))
                for t, d in zip(pdf["term"], pdf["df_global"])
            }
            postings = {}
            for r in pdf.itertuples():
                d, tf, dl = codecs.decode_postings(bytes(r.blob))
                postings[r.term] = (d, tf, dl)
            postings = _mask_deleted(postings, dead)
            if mode_u == "AND":
                docs, scores = _score_intersection(
                    postings, terms_sorted, idf, avgdl
                )
            else:
                docs, scores = _score_union_exhaustive(
                    postings, terms_sorted, idf, avgdl
                )
            if cursor is not None and docs.size:
                s_a, d_a = float(cursor[0]), int(cursor[1])
                keep = (scores < s_a) | ((scores == s_a) & (docs > d_a))
                docs, scores = docs[keep], scores[keep]
            docs, scores = _topk(docs, scores, k)
            return pd.DataFrame({"doc_id": docs, "score": scores})

        per_segment = _per_segment_apply(rows, page_segment, RESULT_SCHEMA)
        return per_segment.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)

    def search_count(
        self, query: list[str] | str, mode: str = "OR"
    ) -> DataFrame:
        """ES ``_count`` API: total number of live docs matching the
        query (term list with OR/AND, or a boolean string with
        mode="BOOL") — DataFrame with one row ``n_hits``.  Counting
        needs the match SET, not scores: each segment task decodes only
        doc-id streams (tf/dl/positions never materialize into the
        result), emits one partial count, and a scalar sum merges —
        the cheapest possible full-match job shape."""
        from ..functions import boolquery as bq

        mode_u = mode.upper()
        ast, qterms = self._query_ast_terms(query, mode_u)
        if ast is not None and (
            bq.range_atoms(ast) or bq.phrase_atoms(ast) or bq.nested_atoms(ast)
        ):
            # range/_exists_/phrase/nested atoms need the doc-value
            # store, positions, or the nested sidecar — count through
            # the aggregation front half
            # (same job shape, plus the per-atom sides)
            from . import docvalues as dv

            return dv.matched_ids(self, query, mode_u).agg(
                F.count(F.lit(1)).alias("n_hits")
            )
        if not qterms:
            return self.spark.createDataFrame(
                [(0,)], "n_hits long"
            )
        rows = self._term_rows(qterms).select("segment", "term", "blob")
        get_deletes = self._segment_deletes_fn()
        qset = set(qterms)

        count_schema = T.StructType([T.StructField("n", T.LongType(), False)])

        def count_segment(pdf: pd.DataFrame) -> pd.DataFrame:
            if pdf.empty:
                return pd.DataFrame({"n": []})
            _check_unique_terms(pdf)
            dead = get_deletes(pdf["segment"].iloc[0])
            qdocs = {
                r.term: codecs.decode_postings(bytes(r.blob))[0]
                for r in pdf.itertuples()
                if r.term in qset
            }
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
                present = list(qdocs.values())
                matches = (
                    reduce(np.union1d, present)
                    if present
                    else np.array([], np.int64)
                )
            if dead is not None and dead.size and matches.size:
                matches = matches[~np.isin(matches, dead, assume_unique=True)]
            return pd.DataFrame({"n": [int(matches.size)]})

        per_segment = _per_segment_apply(rows, count_segment, count_schema)
        return per_segment.agg(
            F.coalesce(F.sum("n"), F.lit(0)).cast("long").alias("n_hits")
        )

    # ---- doc-value queries (operators/docvalues.py): range filters,
    # sort-by-field, and field aggregations over the doclens sidecar ----

    def matched_ids(self, query, mode: str = "OR") -> DataFrame:
        """DataFrame(doc_id) of live matching docs; query=None =
        match_all."""
        from . import docvalues as dv

        return dv.matched_ids(self, query, mode)

    def search_sorted(
        self, query, by: str, ascending: bool = False, k: int = 10,
        mode: str = "OR", after=None,
    ) -> DataFrame:
        """ES sort-by-field, with optional search_after pagination
        (see docvalues.search_sorted)."""
        from . import docvalues as dv

        return dv.search_sorted(self, query, by, ascending, k, mode, after)

    def search_range(
        self, query, field: str, lo=None, hi=None, mode: str = "OR",
        k: int = 10,
    ) -> DataFrame:
        """BM25 top-k with a range filter clause (see
        docvalues.search_range)."""
        from . import docvalues as dv

        return dv.search_range(self, query, field, lo, hi, mode, k)

    def search_nested(
        self, query, field: str, conditions: dict, mode: str = "OR",
        k: int = 10,
    ) -> DataFrame:
        """BM25 top-k with an ES ``nested`` filter clause: docs having
        ≥1 object of the array-of-struct ``field`` satisfying ALL
        ``conditions`` (leaf → value) within the SAME object (see
        operators/nested.search_nested)."""
        from . import nested as nst

        return nst.search_nested(self, query, field, conditions, mode, k)

    def nested_match_ids(self, field: str, conditions: dict) -> DataFrame:
        """Distinct live doc ids with ≥1 nested object satisfying ALL
        conditions (see operators/nested.nested_match_ids)."""
        from . import nested as nst

        return nst.nested_match_ids(self, field, conditions)

    def search_nested_terms(
        self, query, field: str, leaf: str, size: int = 10,
        mode: str = "OR", count: str = "docs",
    ) -> DataFrame:
        """ES nested terms aggregation (see
        operators/nested.search_nested_terms)."""
        from . import nested as nst

        return nst.search_nested_terms(
            self, query, field, leaf, size, mode, count
        )

    def nested_inner_hits(self, field: str, conditions: dict) -> DataFrame:
        """ES inner_hits: the matching (doc_id, obj) object identities
        themselves (see operators/nested.nested_inner_hits)."""
        from . import nested as nst

        return nst.nested_inner_hits(self, field, conditions)

    def search_value_histogram(
        self, query, field: str, interval, mode: str = "OR",
        cumulative: bool = False,
    ) -> DataFrame:
        """ES histogram / date_histogram on a doc-value field, with
        optional cumulative_sum pipeline agg (see
        docvalues.search_value_histogram)."""
        from . import docvalues as dv

        return dv.search_value_histogram(
            self, query, field, interval, mode, cumulative
        )

    def search_percentiles(
        self, query, field: str, percents=(0.25, 0.5, 0.75, 0.95),
        mode: str = "OR",
    ) -> DataFrame:
        """ES percentiles aggregation (see
        docvalues.search_percentiles)."""
        from . import docvalues as dv

        return dv.search_percentiles(self, query, field, percents, mode)

    def search_range_buckets(
        self, query, field: str, ranges, mode: str = "OR"
    ) -> DataFrame:
        """ES range aggregation with explicit buckets (see
        docvalues.search_range_buckets)."""
        from . import docvalues as dv

        return dv.search_range_buckets(self, query, field, ranges, mode)

    def search_collapse(
        self, query, field: str, k: int = 10, mode: str = "OR"
    ) -> DataFrame:
        """ES field collapsing: best hit per doc-value field value
        (see docvalues.search_collapse)."""
        from . import docvalues as dv

        return dv.search_collapse(self, query, field, k, mode)

    def search_grouped_tophits(
        self, query, field: str, n_buckets: int = 5, per_bucket: int = 3,
        mode: str = "OR",
    ) -> DataFrame:
        """ES terms agg + top_hits sub-agg (see
        docvalues.search_grouped_tophits)."""
        from . import docvalues as dv

        return dv.search_grouped_tophits(
            self, query, field, n_buckets, per_bucket, mode
        )

    def search_field_stats(
        self, query, field: str, mode: str = "OR", extended: bool = False
    ) -> DataFrame:
        """ES stats / extended_stats on a numeric doc-value field (see
        docvalues.search_field_stats)."""
        from . import docvalues as dv

        return dv.search_field_stats(self, query, field, mode, extended)

    def search_cardinality(
        self, query, field: str, mode: str = "OR", exact: bool = True,
        rsd: float = 0.05,
    ) -> DataFrame:
        """ES cardinality aggregation (see
        docvalues.search_cardinality)."""
        from . import docvalues as dv

        return dv.search_cardinality(self, query, field, mode, exact, rsd)

    def significant_terms(
        self, query, field: str, size: int = 10, mode: str = "OR"
    ) -> DataFrame:
        """ES significant_terms on a doc-value field (see
        docvalues.significant_terms)."""
        from . import docvalues as dv

        return dv.significant_terms(self, query, field, size, mode)

    def search_decay(
        self, query, field: str, origin, scale: float, decay: float = 0.5,
        offset: float = 0.0, fn: str = "gauss", mode: str = "OR",
        k: int = 10,
    ) -> DataFrame:
        """ES function_score decay on a doc-value field (see
        docvalues.search_decay)."""
        from . import docvalues as dv

        return dv.search_decay(
            self, query, field, origin, scale, decay, offset, fn, mode, k
        )

    def search_missing(
        self, query, field: str, mode: str = "OR"
    ) -> DataFrame:
        """ES missing aggregation (see docvalues.search_missing)."""
        from . import docvalues as dv

        return dv.search_missing(self, query, field, mode)

    def search_value_terms(
        self, query, field: str, size: int = 10, after=None,
        mode: str = "OR",
    ) -> DataFrame:
        """ES composite aggregation, one terms source with after-key
        paging (see docvalues.search_value_terms)."""
        from . import docvalues as dv

        return dv.search_value_terms(self, query, field, size, after, mode)

    def search_bucket_metrics(
        self, query, bucket_field: str, interval, metric_field: str,
        mode: str = "OR",
    ) -> DataFrame:
        """ES bucket + metric sub-aggregation — date_histogram/histogram
        with a stats sub-agg (see docvalues.search_bucket_metrics)."""
        from . import docvalues as dv

        return dv.search_bucket_metrics(
            self, query, bucket_field, interval, metric_field, mode
        )

    FILTERS_SCHEMA = T.StructType(
        [
            T.StructField("name", T.StringType(), False),
            T.StructField("doc_count", T.LongType(), False),
        ]
    )

    def search_filters(self, filters: "dict[str, str]") -> DataFrame:
        """ES ``filters`` aggregation — named boolean filters, each
        with its live match count; DataFrame(name, doc_count) in name
        order.  All range-free filters share ONE counting job (each
        segment task decodes the union of their terms' doc-id streams
        once and evaluates every filter against it — the ES
        one-pass-per-shard shape); filters with range/_exists_/dv
        atoms fall back to one doc-value-cogroup count job each."""
        from ..functions import boolquery as bq

        af = set(analyzed_fields_of(self.manifest))
        dvf = dv_filter_fields_of(self.manifest)
        compiled, ranged = [], []
        for name, q in sorted(filters.items()):
            ast = bq.parse(q, analyzed_fields=af, dv_fields=dvf)
            if bq.has_wildcards(ast):
                ast = bq.expand_wildcards(
                    ast, self.expand_prefix, self.expand_fuzzy
                )
            if bq.is_pure_negation(ast):
                raise bq.QueryParseError(
                    f"filter {name!r} is pure negation (unbounded match "
                    "set) — rewrite as '<positive> AND NOT ...'"
                )
            if bq.range_atoms(ast) or bq.phrase_atoms(ast) or bq.nested_atoms(ast):
                ranged.append((name, q))
            else:
                compiled.append((name, ast, bq.all_terms(ast)))
        out_rows: list[tuple[str, int]] = []
        if compiled:
            all_terms = sorted({t for _n, _a, ts in compiled for t in ts})
            rows = self._term_rows(all_terms).select("segment", "term", "blob")
            get_deletes = self._segment_deletes_fn()
            shared = [(n, a) for n, a, _ts in compiled]

            def count_segment(pdf: pd.DataFrame) -> pd.DataFrame:
                if pdf.empty:
                    return pd.DataFrame({"name": [], "n": []})
                _check_unique_terms(pdf)
                dead = get_deletes(pdf["segment"].iloc[0])
                qdocs = {
                    r.term: codecs.decode_postings(bytes(r.blob))[0]
                    for r in pdf.itertuples()
                }
                names, ns = [], []
                for name, ast in shared:
                    cand = bq.eval_docs(ast, qdocs)
                    if isinstance(cand, tuple):
                        n = 0
                    else:
                        if dead is not None and dead.size and cand.size:
                            cand = cand[
                                ~np.isin(cand, dead, assume_unique=True)
                            ]
                        n = int(cand.size)
                    names.append(name)
                    ns.append(n)
                return pd.DataFrame({"name": names, "n": ns})

            agg = (
                _per_segment_apply(rows, count_segment, "name string, n long")
                .groupBy("name")
                .agg(F.sum("n").alias("doc_count"))
            )
            out_rows = [
                (r["name"], int(r["doc_count"])) for r in agg.collect()
            ]
            got = {n for n, _c in out_rows}
            out_rows += [
                (name, 0) for name, _a, _ts in compiled if name not in got
            ]
        for name, q in ranged:
            out_rows.append(
                (name, int(self.search_count(q, "BOOL").collect()[0][0]))
            )
        return self.spark.createDataFrame(
            sorted(out_rows), IndexSearcher.FILTERS_SCHEMA
        )

    EXPLAIN_SCHEMA = T.StructType(
        [
            T.StructField("term", T.StringType(), False),
            T.StructField("tf", T.LongType(), False),
            T.StructField("df", T.LongType(), False),
            T.StructField("doc_len", T.LongType(), False),
            T.StructField("idf", T.DoubleType(), False),
            T.StructField("contrib", T.DoubleType(), False),
        ]
    )

    def explain(self, doc_id: int, terms: list[str]) -> DataFrame:
        """ES ``_explain`` API: the BM25 score breakdown of ONE doc —
        one row per query term present in the doc with its tf, df,
        doc_len, idf and contribution (sum of contrib = the doc's score
        in an OR query, bit-identically).  Touches only the doc's own
        segment (a doc's postings for every term live in exactly one
        segment by construction), so the job reads a single segment's
        rows for the query terms."""
        terms_sorted = sorted(set(terms))
        dfs = self.global_dfs(terms_sorted)
        g = self.manifest["globals"]
        dpp = int(g["docs_per_part"])
        seg_group = int(self.manifest["params"]["seg_group"])
        seg = (int(doc_id) // dpp) // seg_group
        avgdl, n_docs = self.avgdl, self.n_docs
        target = int(doc_id)
        rows = self._term_rows(terms_sorted).filter(
            F.col("segment") == seg
        ).select("term", "blob")
        dfs_b = dict(dfs)
        out_cols = [f.name for f in self.EXPLAIN_SCHEMA.fields]

        def explain_rows(pdf: pd.DataFrame) -> pd.DataFrame:
            out = []
            for r in pdf.itertuples():
                d, tf, dl = codecs.decode_postings(bytes(r.blob))
                i = int(np.searchsorted(d, target))
                if i >= len(d) or d[i] != target:
                    continue
                idf = bm25_idf(n_docs, dfs_b[r.term])
                w = float(
                    bm25_tf_weight(
                        np.array([tf[i]], np.float64),
                        np.array([dl[i]], np.float64),
                        avgdl,
                    )[0]
                )
                out.append(
                    (r.term, int(tf[i]), int(dfs_b[r.term]), int(dl[i]),
                     idf, idf * w)
                )
            return pd.DataFrame(out, columns=out_cols)

        return (
            rows.mapInPandas(
                lambda it: (explain_rows(pdf) for pdf in it),
                schema=self.EXPLAIN_SCHEMA,
            )
            .orderBy("term")
        )

    POSITIONS_SCHEMA = T.StructType(
        [
            T.StructField("doc_id", T.LongType(), False),
            T.StructField("term", T.StringType(), False),
            T.StructField("pos", T.LongType(), False),
        ]
    )

    def match_positions(
        self, doc_ids: list[int], terms: list[str]
    ) -> DataFrame:
        """Highlighting primitive (the ES highlighter's input): every
        token position of each query term within the given docs —
        DataFrame(doc_id, term, pos), one row per occurrence, from the
        positional postings (no document text is re-tokenized).  The
        doc set is the caller's top-k hits (bounded), broadcast as a
        literal filter; each segment task gathers only its own docs'
        position slices."""
        if not self.manifest["params"].get("with_positions", True):
            raise ValueError(
                "match_positions needs positional postings, but this index "
                "was built with with_positions=False"
            )
        terms_sorted = sorted(set(terms))
        targets = np.unique(np.asarray(sorted(doc_ids), dtype=np.int64))
        g = self.manifest["globals"]
        dpp = int(g["docs_per_part"])
        seg_group = int(self.manifest["params"]["seg_group"])
        segs = sorted({int((d // dpp) // seg_group) for d in targets})
        rows = self._term_rows(terms_sorted).filter(
            F.col("segment").isin(segs)
        ).select("term", "blob", "pos_blob")
        targets_b = targets

        def gather_positions(pdf: pd.DataFrame) -> pd.DataFrame:
            out_d, out_t, out_p = [], [], []
            for r in pdf.itertuples():
                d, tf, _dl = codecs.decode_postings(bytes(r.blob))
                hit_idx = np.flatnonzero(
                    np.isin(d, targets_b, assume_unique=True)
                )
                if not hit_idx.size:
                    continue
                pos, offs = codecs.decode_position_lists(bytes(r.pos_blob), tf)
                for i in hit_idx:
                    sl = pos[offs[i] : offs[i + 1]]
                    out_d.extend([int(d[i])] * len(sl))
                    out_t.extend([r.term] * len(sl))
                    out_p.extend(int(x) for x in sl)
            return pd.DataFrame(
                {"doc_id": out_d, "term": out_t, "pos": out_p}
            )

        return (
            rows.mapInPandas(
                lambda it: (gather_positions(pdf) for pdf in it),
                schema=self.POSITIONS_SCHEMA,
            )
            .orderBy("doc_id", "term", "pos")
        )

    SPANS_SCHEMA = T.StructType(
        [
            T.StructField("doc_id", T.LongType(), False),
            T.StructField("term", T.StringType(), False),
            T.StructField("token_pos", T.LongType(), False),
            T.StructField("start", T.LongType(), False),
            T.StructField("end", T.LongType(), False),
        ]
    )

    @staticmethod
    def match_char_spans(
        docs: DataFrame, doc_ids: list[int], terms: list[str]
    ) -> DataFrame:
        """Snippet extraction — the character-offset half of
        highlighting: for the given docs (the caller's top-k hits) and
        query terms, every occurrence's (token_pos, start, end) where
        start/end index into ``NFC(text).lower()`` (the tokenizer's
        input; slicing it yields exactly the matched token).  Reads the
        DOC STORE (a docs DataFrame with doc_id + text), not the index
        — offsets are a presentation concern and the index stores token
        positions only; ``token_pos`` lines up 1:1 with
        ``match_positions`` output (tested), tying the two views
        together.  Bounded work: the doc_ids filter prunes the scan to
        k rows before any Python runs."""
        import re as _re
        import unicodedata as _ud

        terms_set = set(terms)
        ids = [int(i) for i in doc_ids]

        def spans(batches):
            tok_re = _re.compile(r"[a-z0-9]+")
            for pdf in batches:
                out = []
                for mid, text in zip(pdf["doc_id"], pdf["text"]):
                    if text is None:
                        continue
                    ltext = _ud.normalize("NFC", text).lower()
                    for k, m in enumerate(tok_re.finditer(ltext)):
                        if m.group(0) in terms_set:
                            out.append(
                                (int(mid), m.group(0), k, m.start(), m.end())
                            )
                yield pd.DataFrame(
                    out,
                    columns=["doc_id", "term", "token_pos", "start", "end"],
                )

        return (
            docs.filter(F.col("doc_id").isin(ids))
            .select("doc_id", "text")
            .mapInPandas(spans, schema=IndexSearcher.SPANS_SCHEMA)
            .orderBy("doc_id", "term", "token_pos")
        )

    HIGHLIGHT_SCHEMA = T.StructType(
        [
            T.StructField("doc_id", T.LongType(), False),
            T.StructField("snippet", T.StringType(), True),
            T.StructField("n_matches", T.LongType(), False),
        ]
    )

    def termvectors(
        self, docs: DataFrame, doc_id: int, with_df: bool = True
    ) -> DataFrame:
        """ES ``_termvectors`` (on-the-fly mode — the index stores no
        per-doc term vectors, so the doc's STORED text re-analyzes,
        exactly ES's fallback): per-term stats of ONE document —
        DataFrame(term, tf, df, positions) by term asc.  ``docs`` is
        the doc store / corpus table with (doc_id, text) — the doc_id
        filter prunes the scan to one row before any Python runs; df
        joins from the termdict (one pruned lookup).  Positions are
        0-based analyzed-token positions, 1:1 with the positional
        index (match_positions)."""
        from ..functions.tokenize import py_termvector

        row = (
            docs.filter(F.col("doc_id") == int(doc_id))
            .select("text")
            .head()
        )
        schema = "term string, tf long, df long, positions array<int>"
        if row is None or row["text"] is None:
            return self.spark.createDataFrame([], schema)
        tv = py_termvector(row["text"])
        dfs = (
            self.global_dfs(sorted(t for t, _tf, _p in tv))
            if with_df
            else {}
        )
        return self.spark.createDataFrame(
            [
                (t, tf, int(dfs.get(t, 0)), pos)
                for t, tf, pos in tv
            ],
            schema,
        )

    @staticmethod
    def highlight(
        docs: DataFrame,
        doc_ids: list[int],
        terms: list[str],
        window_chars: int = 120,
        pre_tag: str = "<em>",
        post_tag: str = "</em>",
        ellipsis: str = "…",
    ) -> DataFrame:
        """Highlighted snippets — the user-facing ES ``highlight`` API
        over the doc store: per hit, the best ``window_chars`` window
        (most whole match spans; ties earliest), matched terms wrapped
        in the tags, ellipses marking truncation.  Composes the
        match_char_spans scan with functions/snippets.py — the serving
        tier calls the same kernel on raw strings, so fragments are
        byte-identical.  DataFrame(doc_id, snippet, n_matches), one row
        per requested doc that matched; bounded: the doc_ids filter
        prunes the scan to k rows before any Python runs."""
        from ..functions.snippets import py_highlight

        terms_set = set(terms)
        ids = [int(i) for i in doc_ids]

        def gen(batches):
            for pdf in batches:
                rows = []
                for mid, text in zip(pdf["doc_id"], pdf["text"]):
                    snippet, n = py_highlight(
                        text, terms_set, window_chars,
                        pre_tag, post_tag, ellipsis,
                    )
                    if n:
                        rows.append((int(mid), snippet, n))
                yield pd.DataFrame(
                    rows, columns=["doc_id", "snippet", "n_matches"]
                )

        return (
            docs.filter(F.col("doc_id").isin(ids))
            .select("doc_id", "text")
            .mapInPandas(gen, schema=IndexSearcher.HIGHLIGHT_SCHEMA)
            .orderBy("doc_id")
        )

    def live_doc_ids(self, ids: "list[int]") -> set:
        """Subset of ``ids`` that are LIVE documents at this searcher's
        pinned generation/epoch: present in doclens (isin pushes into
        the scan) and not tombstoned.  Bounded by |ids| — the existence
        primitive behind the pinned query and get-by-id shapes."""
        from .docvalues import _seg_params

        want = sorted({int(i) for i in ids})
        if not want:
            return set()
        present = {
            int(r["doc_id"])
            for r in self.spark.read.parquet(self._doclens_path)
            .select("doc_id")
            .where(F.col("doc_id").isin(want))
            .collect()
        }
        if not present:
            return present
        dpp, seg_group = _seg_params(self.manifest)
        get_deletes = self._segment_deletes_fn()
        live = set()
        for d in present:
            dead = get_deletes((d // dpp) // seg_group)
            if dead is None or not dead.size or d not in dead:
                live.add(d)
        return live

    def validate_query(self, query: str, expand: bool = True) -> dict:
        """ES ``_validate/query`` analog: parse (and optionally expand)
        a boolean query string against THIS index's field manifest
        without executing it — {"valid": bool, "error": str | None,
        "explanation": str | None} where the explanation is the parsed
        AST repr (the ES rewrite string analog).  Catches unknown
        fields, malformed syntax, pure-negation shapes, and expansion
        overflows the same way the search paths would, but driver-side
        and job-free."""
        from ..functions import boolquery as bq

        from ..functions.boolquery import QueryParseError

        try:
            ast = bq.parse(
                query,
                analyzed_fields=set(analyzed_fields_of(self.manifest)),
                dv_fields=dv_filter_fields_of(self.manifest),
            )
            # facet atoms parse open-vocabulary; check their FIELDS
            # against the manifest (ES rejects queries on unmapped
            # fields in strict mappings — and an unknown facet here is
            # always a typo, the build never indexed it)
            known = {
                f
                for f, spec in (self.manifest["params"].get("fields") or {}).items()
                if isinstance(spec, dict) and spec.get("facet")
            } | {"dlen"}
            for tok in bq.facet_atom_tokens(ast):
                if not any(tok.startswith(f"__{f}_") for f in known):
                    raise QueryParseError(
                        f"facet atom {tok!r} names no indexed facet field "
                        f"(known: {sorted(known)})"
                    )
            if expand and bq.has_wildcards(ast):
                ast = bq.expand_wildcards(
                    ast, self.expand_prefix, self.expand_fuzzy
                )
            return {"valid": True, "error": None, "explanation": repr(ast)}
        except Exception as e:  # noqa: BLE001 — the API reports, never raises
            return {"valid": False, "error": str(e), "explanation": None}

    @staticmethod
    def analyze(text: str) -> list[dict]:
        """ES ``_analyze`` analog: run the index analyzer over a string
        and return the token stream — [{"token", "position"}], the
        exact normalization every indexed document went through (shared
        pure function, so what you see is what got indexed)."""
        from ..functions.tokenize import py_tokenize

        return [
            {"token": t, "position": i}
            for i, t in enumerate(py_tokenize(text))
        ]

    def index_stats(self) -> dict:
        """ES ``_stats``/``_cat/indices`` analog: the pinned snapshot's
        health/size facts, straight from the manifest (no jobs) —
        docs, tokens, avgdl, tombstones, postings metrics, generation,
        deletes epoch, and the field roles."""
        m = self.manifest
        return {
            "n_docs": int(m["globals"]["n_docs"]),
            "total_tokens": int(m["globals"]["total_tokens"]),
            "avgdl": float(m["globals"]["avgdl"]),
            "generation": int(m.get("generation", 0)),
            "deletes_epoch": int(m.get("deletes_epoch", 0)),
            "format_version": m.get("format_version"),
            # fresh builds don't record n_tombstones; normalize so the
            # API shape is stable across build/maintenance provenance
            "metrics": {"n_tombstones": 0, **m.get("metrics", {})},
            "fields": dict(m.get("params", {}).get("fields", {})),
            "text_fields": list(m.get("params", {}).get("text_fields") or ()),
            "n_extensions": len(m.get("extensions", [])),
        }

    def segment_stats(self) -> DataFrame:
        """ES ``_cat/segments`` analog: per-segment size facts from ONE
        postings metadata scan (term/df/n_bytes columns only — blobs
        never read): DataFrame(segment, n_terms, postings, bytes,
        tombstones), segment asc.  The tombstone counts come from the
        pinned epoch's sidecars (driver-side, bounded — the deleted-
        docs-bitmap analog)."""
        from . import docvalues as dv

        post = self._postings.select("segment", "df", "n_bytes")
        agg = (
            post.groupBy("segment")
            .agg(
                F.count(F.lit(1)).alias("n_terms"),
                F.sum("df").alias("postings"),
                F.sum("n_bytes").alias("bytes"),
            )
        )
        dead = load_deletes(
            self.index_dir, epoch=self._deletes_epoch, manifest=self.manifest
        )
        tomb = [(int(s), int(len(ids))) for s, ids in sorted((dead or {}).items())]
        if tomb:
            tomb_df = self.spark.createDataFrame(
                tomb, "segment int, tombstones long"
            )
            agg = agg.join(F.broadcast(tomb_df), "segment", "left").withColumn(
                "tombstones", F.coalesce(F.col("tombstones"), F.lit(0))
            )
        else:
            agg = agg.withColumn("tombstones", F.lit(0).cast("long"))
        return agg.orderBy("segment")

    def significant_text(
        self,
        docs: DataFrame,
        query,
        size: int = 10,
        sample_size: int = 200,
        mode: str = "OR",
        min_doc_count: int = 3,
    ) -> DataFrame:
        """ES ``significant_text``: free-text terms over-represented in
        a SAMPLE of top hits vs the whole index — the trending-terms
        aggregation.  ES re-analyzes the ``_source`` of sampled docs
        under a sampler agg; same shape here: the top-``sample_size``
        hits' texts re-tokenize (bounded work — never the corpus), fg =
        docs-containing counts in the sample (distinct per doc), bg =
        the termdict's global df, lift = (fg/sample_n)/(df/n_docs) (the
        same percentage heuristic as significant_terms).

        ``docs`` is the doc store / corpus table with (doc_id, text);
        ``query`` is a term list (with ``mode``) or a boolean string.
        DataFrame(term, fg_count, bg_count, lift) by (lift desc, term
        asc); ``min_doc_count`` is the ES noise floor.  Query terms
        themselves naturally rank high (they are in every sampled doc)
        — callers skip them, as in ES."""
        from ..functions.tokenize import tokenize_col

        if isinstance(query, str):
            hits = self.search_bool(query, k=sample_size)
        else:
            hits = self.search(sorted(set(query)), mode=mode, k=sample_size)
        ids = [int(r["doc_id"]) for r in hits.collect()]
        out_schema = T.StructType(
            [
                T.StructField("term", T.StringType(), False),
                T.StructField("fg_count", T.LongType(), False),
                T.StructField("bg_count", T.LongType(), False),
                T.StructField("lift", T.DoubleType(), False),
            ]
        )
        if not ids:
            return self.spark.createDataFrame([], out_schema)
        sample_n = len(ids)
        fg = (
            docs.filter(F.col("doc_id").isin(ids))
            .select(
                "doc_id",
                F.explode(
                    F.array_distinct(tokenize_col(F.col("text")))
                ).alias("term"),
            )
            .groupBy("term")
            .agg(F.count(F.lit(1)).alias("fg_count"))
            .where(F.col("fg_count") >= int(min_doc_count))
        )
        if self._termdict is not None:
            joined = self._termdict.select("term", "df").join(
                F.broadcast(fg), "term"
            )
        else:  # legacy index without a termdict: sample vocab is bounded
            fg_rows = {r["term"]: int(r["fg_count"]) for r in fg.collect()}
            dfs = self.global_dfs(sorted(fg_rows))
            rows = [
                (t, c, dfs[t]) for t, c in fg_rows.items() if t in dfs
            ]
            joined = self.spark.createDataFrame(
                rows, "term string, fg_count long, df long"
            )
        n_docs = self.n_docs
        return (
            joined.select(
                "term",
                "fg_count",
                F.col("df").alias("bg_count"),
                (
                    (F.col("fg_count") / F.lit(float(sample_n)))
                    / (F.col("df") / F.lit(float(n_docs)))
                ).alias("lift"),
            )
            .orderBy(F.col("lift").desc(), F.col("term").asc())
            .limit(int(size))
        )

    def mget(self, ids: "list[int]") -> DataFrame:
        """ES ``_mget`` / get-by-id: one row per REQUESTED id —
        (doc_id, found, url, <stored fields...>), request order, dead
        or unknown ids report found=false with NULL fields (the ES
        docs-array contract).  The isin predicate pushes into the
        doc_id-ordered doclens scan, so row-group stats prune the doc
        store to the files holding the hits."""
        want = list(dict.fromkeys(int(i) for i in ids))
        if not want:
            raise ValueError("mget needs at least one id")
        live = self.live_doc_ids(want)
        doclens = self.spark.read.parquet(self._doclens_path)
        fetched = [
            c for c in doclens.columns if c not in ("doc_id", "doc_len")
        ]
        found = (
            F.col("doc_id").isin(sorted(live)) if live else F.lit(False)
        )
        req = self.spark.createDataFrame([(i,) for i in want], "doc_id long")
        if live:
            rows = doclens.where(
                F.col("doc_id").isin(sorted(live))
            ).select("doc_id", *fetched)
            req = req.join(rows, "doc_id", "left")
        else:
            for c in fetched:
                req = req.withColumn(c, F.lit(None))
        order = F.array(*[F.lit(i) for i in want])
        return req.select("doc_id", found.alias("found"), *fetched).orderBy(
            F.array_position(order, F.col("doc_id"))
        )

    def with_source(
        self, results: DataFrame, max_collect: int = 10_000
    ) -> DataFrame:
        """Join hit doc_ids back to their url (the ES ``_source`` fetch:
        the index stores postings, the doc store serves the documents).

        Small hit sets (≤ max_collect, the top-k norm) are collected
        once so (a) the search job never re-runs inside the join and
        (b) the doc_id isin predicate is PUSHED into the doclens
        parquet scan — doclens is written in doc_id order, so row-group
        min/max stats prune the doc store to the handful of files
        holding the hits.  Larger sets (search_many output, big k)
        fall back to a broadcast join: no driver-side row
        materialization, no mega-IN-list expression."""
        doclens = self.spark.read.parquet(self._doclens_path)
        # url + any stored metadata fields the field manifest kept
        fetched = [
            c for c in doclens.columns if c not in ("doc_id", "doc_len")
        ]
        order_cols = (
            [F.desc("score"), F.asc("doc_id")]
            if "score" in results.columns
            else [F.asc("doc_id")]
        )
        # persist before the probe collect so the large-set fallback
        # reuses the already-computed search results instead of
        # re-executing the whole search lineage a second time (ADVICE
        # r3).  The small path unpersists immediately (its returned plan
        # references only the collected rows); the large path returns a
        # plan that READS the persisted results, so the cache is left in
        # place for the caller's execution — Spark evicts it LRU-style
        # under memory pressure, and the next with_source call on a new
        # results frame does not grow it unboundedly (top-k frames are
        # tiny; search_many output is bounded by k × batch size).
        results = results.persist()
        rows = results.limit(max_collect + 1).collect()
        if len(rows) <= max_collect:
            hits = self.spark.createDataFrame(rows, results.schema)
            ids = [r["doc_id"] for r in rows]
            results.unpersist()
            return (
                doclens.filter(F.col("doc_id").isin(ids))
                .join(F.broadcast(hits), "doc_id")
                .select(*results.columns, *fetched)
                .orderBy(*order_cols)
            )
        return (
            doclens.join(F.broadcast(results), "doc_id")
            .select(*results.columns, *fetched)
            .orderBy(*order_cols)
        )

    def search_phrase(
        self, phrase: list[str], k: int = 10, slop: int = 0
    ) -> DataFrame:
        """Phrase BM25 top-k: docs containing the terms at consecutive
        positions (``slop=0``), or within an in-order window stretched
        by at most ``slop`` positions (the ES ``match_phrase`` slop /
        span_near in_order=true shape — see _phrase_match_counts),
        scored as one pseudo-term (tf = chain-start count, df =
        matching docs).

        Two jobs by necessity: the phrase's global df isn't known until
        matches are found, so matches (doc_id, tf, dl — tiny relative to
        postings) are materialized once, counted, then scored JVM-side
        with the exact float64 expression the oracle uses."""
        if not self.manifest["params"].get("with_positions", True):
            raise ValueError(
                "phrase queries need positional postings, but this index was "
                "built with with_positions=False — rebuild with positions"
            )
        matches = self._phrase_matches(phrase, slop)
        return self._score_phrase_matches(matches, k)

    def _score_phrase_matches(self, matches: DataFrame, k: int) -> DataFrame:
        """Back half of search_phrase / search_phrase_prefix: count the
        materialized matches for the pseudo-term's global df, then score
        JVM-side with the exact float64 oracle expression."""
        matches.persist()
        try:
            df_count = matches.count()
            if df_count == 0:
                return self.spark.createDataFrame([], RESULT_SCHEMA)
            idf = bm25_idf(self.n_docs, df_count)
            w = (F.lit(BM25_K1 + 1.0) * F.col("tf")) / (
                F.col("tf")
                + F.lit(BM25_K1)
                * (F.lit(1.0 - BM25_B) + F.lit(BM25_B) * F.col("dl") / F.lit(self.avgdl))
            )
            return (
                matches.select("doc_id", (F.lit(idf) * w).alias("score"))
                .orderBy(F.desc("score"), F.asc("doc_id"))
                .limit(k)
                .localCheckpoint()  # cut lineage before unpersist
            )
        finally:
            matches.unpersist()

    def search_span_first(
        self, term: str, end: int, k: int = 10
    ) -> DataFrame:
        """ES ``span_first`` query: the term must occur within the
        first ``end`` token positions (positions are 0-based, so
        ``end=3`` admits positions 0-2) — the "title-ish lead matters"
        query for schemaless corpora.  Scored as one pseudo-term whose
        tf is the count of qualifying positions and whose df is the
        number of matching live docs (the search_phrase scoring
        contract; reuses its back half)."""
        if int(end) <= 0:
            raise ValueError("span_first end must be a positive int")
        if not self.manifest["params"].get("with_positions", True):
            raise ValueError(
                "span_first needs positional postings, but this index was "
                "built with with_positions=False — rebuild with positions"
            )
        end_i = int(end)
        get_deletes = self._segment_deletes_fn()

        def match_segment(pdf: pd.DataFrame) -> pd.DataFrame:
            out = {"doc_id": [], "tf": [], "dl": []}
            if pdf.empty:
                return pd.DataFrame(out)
            _check_unique_terms(pdf)
            dead = get_deletes(pdf["segment"].iloc[0])
            r = next(pdf.itertuples())
            d, tf, dl = codecs.decode_postings(bytes(r.blob))
            if d.size == 0:
                return pd.DataFrame(out)
            pos, offs = codecs.decode_position_lists(bytes(r.pos_blob), tf)
            # per-doc qualifying count: positions ascend within each
            # slice, and every posted doc has >= 1 position, so a
            # reduceat over the <end mask counts per slice exactly
            counts = np.add.reduceat(
                (pos < end_i).astype(np.int64), offs[:-1]
            )
            hit = counts > 0
            docs, tfs, dls = d[hit], counts[hit], dl[hit]
            if dead is not None and dead.size and docs.size:
                keep = ~np.isin(docs, dead, assume_unique=True)
                docs, tfs, dls = docs[keep], tfs[keep], dls[keep]
            return pd.DataFrame({"doc_id": docs, "tf": tfs, "dl": dls})

        rows = self._term_rows([term]).select("segment", "term", "blob", "pos_blob")
        matches = _per_segment_apply(
            rows,
            match_segment,
            T.StructType(
                [
                    T.StructField("doc_id", T.LongType(), False),
                    T.StructField("tf", T.LongType(), False),
                    T.StructField("dl", T.LongType(), False),
                ]
            ),
        )
        return self._score_phrase_matches(matches, k)

    def search_phrase_prefix(
        self,
        phrase: list[str],
        k: int = 10,
        slop: int = 0,
        max_expansions: int = DEFAULT_MAX_EXPANSIONS,
    ) -> DataFrame:
        """ES ``match_phrase_prefix`` — autocomplete-as-you-type: the
        LAST token is a prefix; a doc matches when the leading tokens
        form a phrase chain (same slop semantics as search_phrase)
        whose final slot holds ANY indexed expansion of the prefix.
        Expansion is the termdict range scan (expand_prefix, typed cap);
        the expansions merge into one synthetic pseudo-term posting per
        segment (_merge_posting_variants — the Lucene multi-term-synonym
        span), so the chain kernel and the one-pseudo-term scoring
        contract (tf = chain starts, df = matching docs) run unchanged
        and bit-identically to search_phrase when the prefix expands to
        exactly one term."""
        if not phrase:
            raise ValueError("match_phrase_prefix needs at least one token")
        if not self.manifest["params"].get("with_positions", True):
            raise ValueError(
                "phrase queries need positional postings, but this index was "
                "built with with_positions=False — rebuild with positions"
            )
        lead, prefix = list(phrase[:-1]), str(phrase[-1])
        expansions = self.expand_prefix(prefix, max_expansions)
        if not expansions:
            return self.spark.createDataFrame([], RESULT_SCHEMA)
        matches = self._phrase_matches(lead, slop, expansions=expansions)
        return self._score_phrase_matches(matches, k)

    def _phrase_matches(
        self,
        phrase: list[str],
        slop: int = 0,
        expansions: "list[str] | None" = None,
    ) -> DataFrame:
        """DataFrame(doc_id, tf, dl) of phrase-chain matches.  With
        ``expansions``, the phrase gains a FINAL slot that any of the
        expanded terms may fill (the match_phrase_prefix shape): the
        expansions present in a segment merge into one synthetic
        posting via _merge_posting_variants."""
        exp = sorted(set(expansions)) if expansions is not None else None
        terms_sorted = sorted(set(phrase) | set(exp or ()))
        phrase_t = list(phrase) + ([_PFX_SLOT] if exp is not None else [])
        slop_i = int(slop)
        get_deletes = self._segment_deletes_fn()

        def match_segment(pdf: pd.DataFrame) -> pd.DataFrame:
            out = {"doc_id": [], "tf": [], "dl": []}
            if pdf.empty:
                return pd.DataFrame(out)
            _check_unique_terms(pdf)
            dead = get_deletes(pdf["segment"].iloc[0])
            post = {}
            for r in pdf.itertuples():
                d, tf, dl = codecs.decode_postings(bytes(r.blob))
                pos, offs = codecs.decode_position_lists(bytes(r.pos_blob), tf)
                post[r.term] = (d, dl, pos, offs)
            if exp is not None:
                present = [post[v] for v in exp if v in post]
                if not present:
                    return pd.DataFrame(out)
                post[_PFX_SLOT] = _merge_posting_variants(present)
            if not all(t in post for t in phrase_t):
                return pd.DataFrame(out)
            common = reduce(
                lambda a, b: np.intersect1d(a, b, assume_unique=True),
                (post[t][0] for t in dict.fromkeys(phrase_t)),
            )
            if dead is not None and dead.size:
                common = common[~np.isin(common, dead, assume_unique=True)]
            d0, dl0, _, _ = post[phrase_t[0]]
            dl_idx = np.searchsorted(d0, common)
            tfs = _phrase_match_counts(post, phrase_t, common, slop_i)
            hit = tfs > 0
            return pd.DataFrame(
                {
                    "doc_id": common[hit],
                    "tf": tfs[hit],
                    "dl": dl0[dl_idx[hit]],
                }
            )

        rows = self._term_rows(terms_sorted).select(
            "segment", "term", "blob", "pos_blob"
        )
        return _per_segment_apply(
            rows,
            match_segment,
            T.StructType(
                [
                    T.StructField("doc_id", T.LongType(), False),
                    T.StructField("tf", T.LongType(), False),
                    T.StructField("dl", T.LongType(), False),
                ]
            ),
        )

    def search_adjacency(self, filters: "dict[str, str]") -> DataFrame:
        """ES ``adjacency_matrix`` aggregation: live match counts for
        every named filter AND every pairwise intersection — the
        co-occurrence matrix behind "which watches fire together".
        One counting job: each segment task evaluates all filters
        against one decoded-term union and emits singles + non-empty
        pair counts (keys ``a`` and ``a&b``, names sorted — the ES key
        convention); empty pairs are omitted, as in ES.  Filters with
        range/_exists_/dv/phrase atoms are rejected (use
        search_filters for those shapes)."""
        from itertools import combinations

        from ..functions import boolquery as bq

        af = set(analyzed_fields_of(self.manifest))
        dvf = dv_filter_fields_of(self.manifest)
        compiled = []
        for name, q in sorted(filters.items()):
            if "&" in name:
                raise ValueError(f"filter name {name!r} may not contain '&'")
            ast = bq.parse(q, analyzed_fields=af, dv_fields=dvf)
            if bq.has_wildcards(ast):
                ast = bq.expand_wildcards(
                    ast, self.expand_prefix, self.expand_fuzzy
                )
            if bq.is_pure_negation(ast):
                raise bq.QueryParseError(
                    f"filter {name!r} is pure negation (unbounded match "
                    "set) — rewrite as '<positive> AND NOT ...'"
                )
            if bq.range_atoms(ast) or bq.phrase_atoms(ast) or bq.nested_atoms(ast):
                raise ValueError(
                    f"adjacency filter {name!r} uses doc-value/phrase/nested "
                    "atoms — not supported here (use search_filters)"
                )
            compiled.append((name, ast, bq.all_terms(ast)))
        all_terms = sorted({t for _n, _a, ts in compiled for t in ts})
        rows = self._term_rows(all_terms).select("segment", "term", "blob")
        get_deletes = self._segment_deletes_fn()

        def count_segment(pdf: pd.DataFrame) -> pd.DataFrame:
            if pdf.empty:
                return pd.DataFrame({"key": [], "n": []})
            _check_unique_terms(pdf)
            dead = get_deletes(pdf["segment"].iloc[0])
            qdocs = {
                r.term: codecs.decode_postings(bytes(r.blob))[0]
                for r in pdf.itertuples()
            }
            sets = {}
            for name, ast, _ts in compiled:
                cand = bq.eval_docs(ast, qdocs)
                if isinstance(cand, tuple):
                    cand = np.array([], np.int64)
                elif dead is not None and dead.size and cand.size:
                    cand = cand[~np.isin(cand, dead, assume_unique=True)]
                sets[name] = cand
            keys, ns = [], []
            for name, ids in sets.items():
                keys.append(name)
                ns.append(int(ids.size))
            for a, b in combinations(sorted(sets), 2):
                inter = np.intersect1d(sets[a], sets[b], assume_unique=True)
                if inter.size:
                    keys.append(f"{a}&{b}")
                    ns.append(int(inter.size))
            return pd.DataFrame({"key": keys, "n": ns})

        agg = (
            _per_segment_apply(rows, count_segment, "key string, n long")
            .groupBy("key")
            .agg(F.sum("n").alias("doc_count"))
        )
        out = [(r["key"], int(r["doc_count"])) for r in agg.collect()]
        got = {k for k, _n in out}
        out += [(name, 0) for name, _a, _t in compiled if name not in got]
        return self.spark.createDataFrame(
            sorted(out),
            T.StructType(
                [
                    T.StructField("key", T.StringType(), False),
                    T.StructField("doc_count", T.LongType(), False),
                ]
            ),
        )

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
    ) -> DataFrame:
        """ES ``rescore`` API (score_mode: total): run the cheap term
        query, take its top ``window_size`` hits, and re-rank just that
        window with a proximity (phrase) query —

            final = query_weight·bm25 + rescore_weight·phrase_score

        where phrase_score uses the phrase's GLOBAL df (Lucene rescore
        evaluates the rescore query with full index stats, only
        restricted to the window's docs).  Window docs without the
        phrase contribute 0 from the rescore side.

        The window (≤ window_size rows) is the only driver-side
        materialization — the phrase match job and the base query job
        stay fully distributed; the window rides back in as a broadcast
        join against the phrase matches."""
        if window_size < k:
            raise ValueError("window_size must be >= k")
        base = [
            (int(r["doc_id"]), float(r["score"]))
            for r in self.search(terms, mode=mode, k=window_size).collect()
        ]
        if not base:
            return self.spark.createDataFrame([], RESULT_SCHEMA)
        window = self.spark.createDataFrame(
            [(d,) for d, _s in base],
            T.StructType([T.StructField("doc_id", T.LongType(), False)]),
        )
        matches = self._phrase_matches(rescore_phrase, slop)
        matches.persist()
        try:
            df_count = matches.count()
            # phrase stats of the WINDOW docs only — the window side
            # broadcasts into an inner join, so at most window_size
            # rows ever reach the driver
            ph_rows = (
                matches.join(F.broadcast(window), "doc_id").collect()
                if df_count
                else []
            )
        finally:
            matches.unpersist()
        ph_score: dict[int, float] = {}
        if ph_rows:
            idf = bm25_idf(self.n_docs, df_count)
            for r in ph_rows:
                tf, dl = float(r["tf"]), float(r["dl"])
                w = ((BM25_K1 + 1.0) * tf) / (
                    tf + BM25_K1 * ((1.0 - BM25_B) + BM25_B * dl / self.avgdl)
                )
                ph_score[int(r["doc_id"])] = idf * w
        qw, rw = float(query_weight), float(rescore_weight)
        rescored = sorted(
            (
                (d, qw * s + rw * ph_score.get(d, 0.0))
                for d, s in base
            ),
            key=lambda t: (-t[1], t[0]),
        )[: int(k)]
        return self.spark.createDataFrame(rescored, RESULT_SCHEMA)

    def search_many(self, specs: list[dict]) -> DataFrame:
        """Batch query execution (the ES ``msearch`` analog).  Specs are
        dicts with ``query_id``, ``k`` and ONE OF:
          * ``terms`` + ``mode`` "OR"/"AND" — BM25 term query
          * ``mode`` "BOOL" + ``query`` — boolean query string
          * ``mode`` "PHRASE" + ``phrase`` — exact-phrase query

        Job count is CONSTANT in the batch size: term+bool queries share
        one scoring job (each segment's block cache decodes every blob
        at most once across all queries); phrase queries add two (one
        match job for ALL phrases — phrase df isn't known until matches
        exist — plus the count); BOOL queries containing range/
        ``_exists_``/doc-value atoms add one job each (they route
        through search_bool's doc-value cogroup — the shared block
        cache can't see doc values).  Returns DataFrame(query_id, rank,
        doc_id, score), rank 1..k by (score desc, doc_id asc), results
        bit-identical per query to search/search_bool/search_phrase."""
        from ..functions import boolquery as bq

        n_docs, avgdl = self.n_docs, self.avgdl
        term_specs, bool_specs, phrase_specs = [], [], []
        ranged_specs = []  # BOOL queries with range/_exists_/dv atoms
        for s in specs:
            mode = s.get("mode", "OR").upper()
            if mode in ("OR", "AND"):
                term_specs.append(
                    (s["query_id"], sorted(set(s["terms"])), mode, int(s.get("k", 10)))
                )
            elif mode == "BOOL":
                ast = bq.parse(
                    s["query"],
                    analyzed_fields=set(analyzed_fields_of(self.manifest)),
                    dv_fields=dv_filter_fields_of(self.manifest),
                    nested_fields=nested_paths_of(self.manifest),
                )
                pos_terms = bq.positive_terms(ast)
                if not pos_terms:
                    raise bq.QueryParseError(
                        f"query {s['query_id']} has no positive terms"
                    )
                if bq.range_atoms(ast) or bq.phrase_atoms(ast) or bq.nested_atoms(ast):
                    # doc-value/phrase/nested atoms need the per-atom cogroup
                    # — route through search_bool (one extra job per
                    # such query; the shared block cache can't see doc
                    # values or positions), results identical to a lone
                    # search_bool
                    ranged_specs.append(
                        (s["query_id"], s["query"], int(s.get("k", 10)))
                    )
                    continue
                bool_specs.append(
                    (
                        s["query_id"], ast, bq.all_terms(ast),
                        bq.required_terms(ast), pos_terms, int(s.get("k", 10)),
                        bq.term_boosts(ast),
                    )
                )
            elif mode == "PHRASE":
                phrase_specs.append(
                    (s["query_id"], list(s["phrase"]), int(s.get("k", 10)))
                )
            else:
                raise ValueError(f"unknown search_many mode {mode!r}")

        parts: list[DataFrame] = []
        result_schema = T.StructType(
            [T.StructField("query_id", T.StringType(), False)]
            + RESULT_SCHEMA.fields
        )
        get_deletes = self._segment_deletes_fn()

        all_terms = sorted(
            {t for _, ts, _, _ in term_specs for t in ts}
            | {t for _, _, ts, _, _, _, _ in bool_specs for t in ts}
        )
        if all_terms:
            # single-job path: global dfs ride in on a broadcast termdict
            # join (same as `search`) instead of a driver-side lookup job
            rows = self._rows_with_global_df(all_terms)
            if rows is None:
                dfs = self.global_dfs(all_terms)
                rows = self._term_rows(all_terms).select(*self.SCORING_COLS).withColumn(
                    "df_global",
                    F.create_map(
                        *[x for t, d in dfs.items() for x in (F.lit(t), F.lit(d))]
                    )[F.col("term")],
                )
            compiled_t, compiled_b = term_specs, bool_specs

            def score_segment(pdf: pd.DataFrame) -> pd.DataFrame:
                out_q, out_d, out_s = [], [], []
                if not pdf.empty:
                    _check_unique_terms(pdf)
                    dead = get_deletes(pdf["segment"].iloc[0])
                    idf = {
                        t: bm25_idf(n_docs, int(d))
                        for t, d in zip(pdf["term"], pdf["df_global"])
                    }
                    # ONE lazy block cache per segment: conjunctive and
                    # required-seeded queries skip-read through it;
                    # essential full decodes are SHARED by every later
                    # query touching the same term.
                    cache = _BlockCache(pdf.itertuples())
                    for qid, terms_sorted, mode, k in compiled_t:
                        if mode == "AND":
                            docs, scores = _score_intersection_blockmax(
                                cache, terms_sorted, idf, avgdl, dead=dead
                            )
                            docs, scores = _topk(docs, scores, k)
                        else:
                            docs, scores = _score_union_maxscore(
                                cache, terms_sorted, idf, avgdl, k, dead=dead
                            )
                        out_q.extend([qid] * len(docs))
                        out_d.extend(docs.tolist())
                        out_s.extend(scores.tolist())
                    for qid, ast, q_terms, req, pos_terms, k, qb in compiled_b:
                        # per-query boosted idf view (the shared idf
                        # dict serves every query in the batch)
                        q_idf = (
                            {t: v * qb.get(t, 1.0) for t, v in idf.items()}
                            if qb
                            else idf
                        )
                        if req:
                            docs, scores = _eval_bool_blockmax(
                                cache, ast, req, pos_terms, q_idf, avgdl, dead=dead
                            )
                        else:
                            postings = _mask_deleted(
                                {t: cache.full(t) for t in q_terms if t in cache},
                                dead,
                            )
                            cand = bq.eval_docs(
                                ast, {t: p[0] for t, p in postings.items()}
                            )
                            if isinstance(cand, tuple) or cand.size == 0:
                                continue
                            scores = bq.score_candidates(
                                cand, postings, pos_terms, q_idf, avgdl
                            )
                            docs = cand
                        docs, scores = _topk(docs, scores, k)
                        out_q.extend([qid] * len(docs))
                        out_d.extend(docs.tolist())
                        out_s.extend(scores.tolist())
                return pd.DataFrame(
                    {"query_id": out_q, "doc_id": out_d, "score": out_s}
                )

            parts.append(
                _per_segment_apply(rows, score_segment, result_schema)
            )

        if phrase_specs:
            parts.append(self._phrase_scores_many(phrase_specs))

        for qid, q, k in ranged_specs:
            parts.append(
                self.search_bool(q, k=k)
                .withColumn("query_id", F.lit(qid))
                .select("query_id", "doc_id", "score")
            )

        if not parts:
            return self.spark.createDataFrame([], MULTI_RESULT_SCHEMA)
        per_segment = parts[0]
        for p in parts[1:]:
            per_segment = per_segment.unionByName(p)
        k_pairs = (
            [(qid, k) for qid, _, _, k in term_specs]
            + [(qid, k) for qid, _, _, _, _, k, _ in bool_specs]
            + [(qid, k) for qid, _, k in phrase_specs]
            + [(qid, k) for qid, _, k in ranged_specs]
        )
        w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("doc_id"))
        k_map = F.create_map(
            *[x for qid, k in k_pairs for x in (F.lit(qid), F.lit(k))]
        )
        return (
            per_segment.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k_map[F.col("query_id")])
            .select("query_id", "rank", "doc_id", "score")
        )

    def _phrase_scores_many(self, phrase_specs: list[tuple]) -> DataFrame:
        """(query_id, doc_id, score) for a BATCH of phrase queries in
        two jobs total: one segment-parallel match job for every phrase
        (position blobs decoded once per (term, segment) across the
        batch), one tiny count job for the per-query global df (the
        phrase idf needs it), then JVM-side scoring — job count is
        independent of the number of phrase queries."""
        if not self.manifest["params"].get("with_positions", True):
            raise ValueError(
                "phrase queries need positional postings, but this index was "
                "built with with_positions=False — rebuild with positions"
            )
        compiled = [(qid, list(ph)) for qid, ph, _ in phrase_specs]
        all_terms = sorted({t for _, ph in compiled for t in ph})
        get_deletes = self._segment_deletes_fn()

        def match_segment(pdf: pd.DataFrame) -> pd.DataFrame:
            out = {"query_id": [], "doc_id": [], "tf": [], "dl": []}
            if pdf.empty:
                return pd.DataFrame(out)
            _check_unique_terms(pdf)
            dead = get_deletes(pdf["segment"].iloc[0])
            post = {}
            for r in pdf.itertuples():
                d, tf, dl = codecs.decode_postings(bytes(r.blob))
                pos, offs = codecs.decode_position_lists(bytes(r.pos_blob), tf)
                post[r.term] = (d, dl, pos, offs)
            for qid, phrase_t in compiled:
                if not all(t in post for t in phrase_t):
                    continue
                common = reduce(
                    lambda a, b: np.intersect1d(a, b, assume_unique=True),
                    (post[t][0] for t in dict.fromkeys(phrase_t)),
                )
                if dead is not None and dead.size:
                    common = common[~np.isin(common, dead, assume_unique=True)]
                if common.size == 0:
                    continue
                d0, dl0, _, _ = post[phrase_t[0]]
                dl_idx = np.searchsorted(d0, common)
                tfs = _phrase_match_counts(post, phrase_t, common)
                hit = tfs > 0
                out["query_id"].extend([qid] * int(hit.sum()))
                out["doc_id"].extend(common[hit].tolist())
                out["tf"].extend(tfs[hit].tolist())
                out["dl"].extend(dl0[dl_idx[hit]].tolist())
            return pd.DataFrame(out)

        rows = self._term_rows(all_terms).select(
            "segment", "term", "blob", "pos_blob"
        )
        matches = _per_segment_apply(
            rows,
            match_segment,
            T.StructType(
                [
                    T.StructField("query_id", T.StringType(), False),
                    T.StructField("doc_id", T.LongType(), False),
                    T.StructField("tf", T.LongType(), False),
                    T.StructField("dl", T.LongType(), False),
                ]
            ),
        )
        matches.persist()
        try:
            counts = {
                r["query_id"]: int(r["n"])
                for r in matches.groupBy("query_id")
                .agg(F.count("*").alias("n"))
                .collect()
            }
            if not counts:
                return self.spark.createDataFrame(
                    [],
                    T.StructType(
                        [T.StructField("query_id", T.StringType(), False)]
                        + RESULT_SCHEMA.fields
                    ),
                )
            idf_map = F.create_map(
                *[
                    x
                    for qid, n in counts.items()
                    for x in (F.lit(qid), F.lit(bm25_idf(self.n_docs, n)))
                ]
            )
            w = (F.lit(BM25_K1 + 1.0) * F.col("tf")) / (
                F.col("tf")
                + F.lit(BM25_K1)
                * (
                    F.lit(1.0 - BM25_B)
                    + F.lit(BM25_B) * F.col("dl") / F.lit(self.avgdl)
                )
            )
            return matches.select(
                "query_id",
                "doc_id",
                (idf_map[F.col("query_id")] * w).alias("score"),
            ).localCheckpoint()  # cut lineage before unpersist
        finally:
            matches.unpersist()


def bm25_exhaustive_df(
    docs: DataFrame,
    terms: list[str],
    mode: str = "OR",
    k: int = 10,
    id_col: str = "doc_id",
    tokens_col: str = "tokens",
) -> DataFrame:
    """Pure-DataFrame BM25 (no index): the Catalyst-only baseline used
    as correctness anchor and for ad-hoc scoring of un-indexed tables.

    `docs` must have (id_col, tokens_col: array<string>).  Shuffle
    profile: per-term tf is counted IN-ROW (size of a filtered token
    array — query term lists are tiny), so there is no token explode
    and no (doc, term) groupBy shuffle; the narrow (id, dl, tf…)
    projection (~tens of bytes/row) is persisted for the call so the
    stats aggregation and the TakeOrdered scoring pass tokenize the
    corpus exactly once.  Executes eagerly (returns a materialized
    top-k frame) — fine at any scale, but reads the whole corpus per
    query (that is exactly the cost the inverted index removes)."""
    terms_sorted = sorted(set(terms))
    spark = docs.sparkSession
    def _count_eq(t):
        # NB: single-arg lambda — a second parameter would be bound to
        # the element INDEX by the higher-order-function protocol
        return lambda x: x == F.lit(t)

    tf_cols = [
        F.size(F.filter(F.col(tokens_col), _count_eq(t))).alias(f"__tf_{i}")
        for i, t in enumerate(terms_sorted)
    ]
    base = docs.select(
        F.col(id_col).alias("doc_id"),
        F.size(tokens_col).alias("dl"),
        *tf_cols,
    )
    # the tokenize feeding `base` is the dominant cost and would run
    # once for the stats job and again for the scoring job — persist
    # the narrow (id, dl, per-term tf) projection for the call's
    # duration so the corpus text is tokenized exactly once.  This is
    # an intra-call intermediate (computed fresh every invocation),
    # released before returning.
    base = base.persist()
    try:
        stats = base.agg(
            F.count("*").alias("n_docs"),
            F.avg("dl").alias("avgdl"),
            *[
                F.sum((F.col(f"__tf_{i}") > 0).cast("long")).alias(f"__df_{i}")
                for i in range(len(terms_sorted))
            ],
        ).collect()[0]
        n_docs, avgdl = int(stats["n_docs"]), float(stats["avgdl"] or 0.0)
        dfs = [int(stats[f"__df_{i}"] or 0) for i in range(len(terms_sorted))]
        if not any(dfs):
            return spark.createDataFrame([], RESULT_SCHEMA)
        # idf stays Python-side math.log (bm25_idf) exactly as before —
        # the per-term weight expression is unchanged, only its tf/df
        # inputs come from the in-row counts instead of an explode+groupBy
        idf = [bm25_idf(n_docs, d) for d in dfs]

        def w(tf_col):
            return (F.lit(BM25_K1 + 1.0) * tf_col) / (
                tf_col
                + F.lit(BM25_K1)
                * (F.lit(1.0 - BM25_B) + F.lit(BM25_B) * F.col("dl") / F.lit(avgdl))
            )

        contrib = [
            F.when(F.col(f"__tf_{i}") > 0, F.lit(idf[i]) * w(F.col(f"__tf_{i}")))
            for i in range(len(terms_sorted))
        ]
        score = contrib[0]
        for c in contrib[1:]:
            # ascending term order, float64 — the determinism contract;
            # terms the doc lacks contribute nothing (when() -> NULL,
            # skipped by the coalesced sum below)
            score = F.coalesce(score + c, score, c)
        n_hit = sum(
            ((F.col(f"__tf_{i}") > 0).cast("int") for i in range(len(terms_sorted))),
            F.lit(0),
        )
        agg = base.select("doc_id", score.alias("score"), n_hit.alias("n_terms_hit"))
        if mode.upper() == "AND":
            agg = agg.filter(F.col("n_terms_hit") == len(terms_sorted))
        else:
            agg = agg.filter(F.col("n_terms_hit") > 0)
        rows = (
            agg.select("doc_id", "score")
            .orderBy(F.desc("score"), F.asc("doc_id"))
            .limit(k)
            .collect()
        )
    finally:
        base.unpersist()
    return spark.createDataFrame(rows, RESULT_SCHEMA)
