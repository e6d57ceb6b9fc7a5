"""Streaming percolation — standing-query alerts over the crawl
stream (the ES percolator run continuously: watch queries fire the
moment a matching document arrives).

The reference is batch-only (SURVEY §2.8); this is the streaming
counterpart of operators/percolate.py.  The percolator kernel is
STATELESS per document (compiled registry broadcast, extracted-terms
prefilter, one narrow mapInPandas pass), so the exact batch operator
lifts onto a Structured Streaming frame unchanged: any source,
micro-batch or continuous, exactly-once under sink checkpointing, and
the matched (doc, query) set is identical to running the batch
percolator over the same rows — asserted in tests/test_streaming.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from ..operators.percolate import percolate


def stream_percolate(
    pages_stream: DataFrame,
    queries: "dict[str, str]",
    text_col: str = "text",
    id_col: str = "doc_id",
    analyzed_fields=frozenset(),
) -> DataFrame:
    """Streaming DataFrame(doc_id, query_id) of percolator hits — one
    row per (arriving document, matching stored query).  Caller
    attaches the sink (kafka/parquet/foreachBatch for notification
    fan-out).  ``ordered`` is deliberately unavailable: a global sort
    is meaningless on an unbounded stream."""
    if not pages_stream.isStreaming:
        raise ValueError(
            "stream_percolate takes a streaming DataFrame — use "
            "operators.percolate.percolate for batch frames"
        )
    return percolate(
        pages_stream,
        queries,
        text_col=text_col,
        id_col=id_col,
        analyzed_fields=analyzed_fields,
        ordered=False,
    )
