"""Index maintenance: incremental append + segment compaction.

Reference analogs:
  * ES write ops ``update`` / ``upsert`` for re-export into an existing
    index (hail_scripts/shared/elasticsearch_utils.py:11-17,
    elasticsearch_client.py:106-113) → ``extend_index``: append a new
    crawl batch to a published index without rebuilding.  Safe because
    posting blobs store exact (doc_id, tf, dl) — only the corpus-level
    avgdl shifts, which enters scoring at QUERY time from the manifest,
    and block upper bounds are derived from (max_tf, min_dl) at query
    time too (operators/index_build.py PARTIAL_SCHEMA note).
  * ES ``forcemerge`` after load (elasticsearch_client.py:214) →
    ``compact_index``: coarsen the segment axis by an integer factor,
    concat-merging each term's per-segment rows (fewer, larger rows →
    fewer query tasks and less per-row overhead).
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import index_build as ib
from .pipeline import _swap_dir, _write_termdict


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


def extend_index(
    spark: SparkSession, index_dir: str, new_pages: DataFrame
) -> dict:
    """Append a new crawl batch to a published index.

    Only urls NOT already indexed are added (left_anti against doclens —
    the reference's ``create``-op semantics; in-place re-crawl of an
    existing url is handled by ``upsert_index``).  New doc ids start at
    the next SEGMENT boundary after the current max id, so no (term,
    segment) key ever holds more than one postings row and every
    existing blob stays byte-identical.
    """
    manifest = _load_manifest(index_dir)
    params = manifest["params"]
    g = manifest["globals"]
    dpp = int(g["docs_per_part"])
    seg_group = int(params["seg_group"])
    n_term_buckets = int(params["n_term_buckets"])

    doclens_path = os.path.join(index_dir, "doclens")
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

    normalized = ib.normalize_pages(new_pages, params.get("lang_filter"))
    fresh = normalized.join(existing.select("url"), "url", "left_anti")
    docs = ib.docs_with_ids(fresh).withColumn(
        "doc_id", F.col("doc_id") + F.lit(id_base)
    )
    docs_path = os.path.join(index_dir, "stages", f"docs_ext_{id_base}")
    docs.write.mode("overwrite").parquet(docs_path)
    spark.catalog.clearCache()  # free assign_dense_ids' persist
    docs = spark.read.parquet(docs_path)
    new_stats = ib.corpus_stats(docs)
    if new_stats["n_docs"] == 0:
        return manifest

    partials = ib.build_partials(
        docs, dpp, seg_group, with_positions=params.get("with_positions", True)
    )
    merged = ib.merge_partials(partials).withColumn(
        "term_bucket",
        F.crc32(F.col("term").cast("binary")) % F.lit(n_term_buckets),
    )
    # new segments append as extra files per bucket (ES: more segments;
    # compact_index is the forcemerge that folds them in)
    merged.write.mode("append").partitionBy("term_bucket").parquet(
        os.path.join(index_dir, "postings")
    )
    docs.select("doc_id", "url", "doc_len").write.mode("append").parquet(doclens_path)
    _write_termdict(spark, index_dir)

    g["n_docs"] += new_stats["n_docs"]
    g["total_tokens"] += new_stats["total_tokens"]
    g["avgdl"] = g["total_tokens"] / g["n_docs"]
    manifest["globals"] = g
    manifest["metrics"] = {
        "docs_indexed": g["n_docs"],
        **_postings_metrics(spark.read.parquet(os.path.join(index_dir, "postings"))),
    }
    manifest.setdefault("extensions", []).append(
        {"id_base": id_base, "docs_added": new_stats["n_docs"]}
    )
    _save_manifest(index_dir, manifest)
    return manifest


def compact_index(spark: SparkSession, index_dir: str, factor: int = 2) -> dict:
    """Coarsen segments by ``factor`` (forcemerge analog): segment' =
    segment // factor remains a pure function of doc_id, so a doc's
    postings for every term still land in exactly ONE query task and
    per-term rows stay disjoint ascending → concat-merge applies."""
    manifest = _load_manifest(index_dir)
    postings_path = os.path.join(index_dir, "postings")
    postings = spark.read.parquet(postings_path)
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
    _write_termdict(spark, index_dir)
    manifest["metrics"] = {
        "docs_indexed": manifest["globals"]["n_docs"],
        **_postings_metrics(spark.read.parquet(postings_path)),
    }
    manifest.setdefault("compactions", []).append({"factor": factor})
    _save_manifest(index_dir, manifest)
    return manifest
