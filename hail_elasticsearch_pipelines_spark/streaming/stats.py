"""Structured Streaming analytics over the crawl stream.

The reference is batch-only (SURVEY §2.8) — these are the graft-side
streaming counterparts of its monitoring/QC aggregations
(load-time stats the reference computes batch-wise in
hail_scripts/v02/utils/computed_fields and the Luigi task metrics):

* ``stream_crawl_stats`` — event-time windowed per-language page
  counts / text-length stats with a WATERMARK, so hours-late crawl
  records (WARC re-deliveries) are folded in while state stays
  bounded: Spark drops state for windows older than the watermark
  instead of keeping every window forever.
* ``stream_first_seen_urls`` — custom stateful operator via
  ``applyInPandasWithState``: emits each url exactly once, on first
  sight across micro-batches (streaming URL-frontier dedupe).  The
  keyed state is one boolean per url; at crawl scale state is
  hash-partitioned by url across executors and checkpointed, exactly
  how a frontier would shard.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..sources.corpus import PAGES_SCHEMA


def stream_crawl_stats(
    spark: SparkSession,
    source_path: str,
    window_duration: str = "1 hour",
    watermark: str = "2 hours",
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Event-time windowed crawl statistics (streaming DataFrame).

    Caller attaches a sink: append mode emits a window only after the
    watermark passes its end (late-and-final semantics); complete mode
    keeps updating (for dashboards).  Late rows inside the watermark
    still update their window; rows later than the watermark are
    dropped — tested in tests/test_streaming.py."""
    reader = spark.readStream.schema(PAGES_SCHEMA)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    pages = reader.parquet(source_path)
    return (
        pages.withWatermark("warc_ts", watermark)
        .groupBy(F.window("warc_ts", window_duration).alias("win"), "lang")
        .agg(
            F.count("*").alias("n_pages"),
            F.avg(F.length("text")).alias("avg_text_len"),
            F.sum(F.when(F.col("text").isNull(), 1).otherwise(0)).alias(
                "n_null_text"
            ),
        )
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            "lang",
            "n_pages",
            "avg_text_len",
            "n_null_text",
        )
    )


_FIRST_SEEN_OUT = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("first_ts", T.TimestampType(), True),
    ]
)
_FIRST_SEEN_STATE = T.StructType([T.StructField("seen", T.BooleanType())])


def stream_first_seen_urls(
    spark: SparkSession,
    source_path: str,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Exactly-once URL discovery: (url, first_ts) emitted the FIRST
    time a url appears across the whole stream, never again — the
    custom-stateful-operator shape (applyInPandasWithState) the
    engine's frontier/dedupe layers build on.

    State per url is one boolean; re-crawls of a seen url touch only
    that url's state partition.  Returns the streaming DataFrame."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    reader = spark.readStream.schema(PAGES_SCHEMA)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    pages = reader.parquet(source_path).select("url", "warc_ts")

    def first_seen(key, pdfs, state):
        url = key[0]
        first_ts = None
        for pdf in pdfs:
            if len(pdf):
                ts = pdf["warc_ts"].min()
                first_ts = ts if first_ts is None else min(first_ts, ts)
        if state.exists:
            return  # already emitted in an earlier micro-batch
        state.update((True,))
        yield pd.DataFrame({"url": [url], "first_ts": [first_ts]})

    return pages.groupBy("url").applyInPandasWithState(
        first_seen,
        outputStructType=_FIRST_SEEN_OUT,
        stateStructType=_FIRST_SEEN_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
