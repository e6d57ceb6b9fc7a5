"""Structured Streaming ingestion → incremental index maintenance.

The reference is batch-only (SURVEY §2.8); its incremental story is
stage-level resumability plus ES ``update``/``upsert`` re-exports
(hail_scripts/shared/elasticsearch_utils.py:11-17).  The Spark-first
equivalent: a file-source stream of new crawl batches feeding
``extend_index`` through ``foreachBatch``.

Exactly-once posture: the streaming checkpoint dedupes micro-batches
across restarts, and ``extend_index`` itself anti-joins already-indexed
urls — so a replayed batch is a no-op (idempotent appends, the
``create``-op semantics).
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from ..plans.maintenance import extend_index
from ..sources.corpus import PAGES_SCHEMA


def stream_extend_index(
    spark: SparkSession,
    index_dir: str,
    source_path: str,
    checkpoint_dir: str,
    available_now: bool = True,
    max_files_per_trigger: int | None = None,
    mode: str = "create",
    schema=None,
):
    """Watch ``source_path`` for new page parquet files and fold each
    micro-batch into the published index at ``index_dir``.

    ``mode="create"`` skips already-indexed urls (idempotent under
    replays).  ``mode="upsert"`` REPLACES re-crawled urls per
    micro-batch (tombstone + re-index — the streaming re-crawl
    pipeline); a replayed upsert batch re-tombstones and re-adds the
    same content, so query results stay correct (exactly one live copy
    with the latest text), at the cost of one wasted segment until the
    next compaction.

    ``available_now=True`` drains everything currently present and stops
    (the backfill/catch-up mode); ``False`` runs continuously.  Returns
    the StreamingQuery — caller owns awaitTermination/stop.

    ``schema``: source schema override — pass the page schema plus any
    extra analyzed/stored columns (e.g. ``title``) when streaming into
    a fielded index; defaults to the core PAGES_SCHEMA (a fielded
    index tolerates the missing column: appended docs simply lack the
    field).
    """
    reader = spark.readStream.schema(schema or PAGES_SCHEMA)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(source_path)

    def _fold(batch_df, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        extend_index(spark, index_dir, batch_df, mode=mode)

    writer = (
        stream.writeStream.foreachBatch(_fold)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
