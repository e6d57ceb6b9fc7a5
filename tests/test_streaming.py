"""Streaming ingestion: new crawl batches folded into a published index
via foreachBatch + extend_index, rank-identical to a batch rebuild."""

from __future__ import annotations

import numpy as np

from hail_elasticsearch_pipelines_spark.operators.index_build import build_index
from hail_elasticsearch_pipelines_spark.operators.serve import LocalSearcher
from hail_elasticsearch_pipelines_spark.sources.corpus import gen_pages_pdf
from hail_elasticsearch_pipelines_spark.streaming.ingest import stream_extend_index


def test_stream_extend_index(spark, tmp_path):
    out = str(tmp_path / "idx")
    src = tmp_path / "incoming"
    ckpt = str(tmp_path / "ckpt")
    src.mkdir()

    base = spark.createDataFrame(gen_pages_pdf(np.arange(150)))
    build_index(spark, base, out, docs_per_part=37, seg_group=2, n_term_buckets=8)
    n0 = LocalSearcher(out).n_docs

    spark.createDataFrame(gen_pages_pdf(np.arange(150, 220))).write.mode(
        "overwrite"
    ).parquet(str(src))

    q = stream_extend_index(spark, out, str(src), ckpt, available_now=True)
    q.awaitTermination(240)

    s = LocalSearcher(out)
    assert s.n_docs > n0
    hits = s.search(["the", "term0042"], "OR", 10)
    assert len(hits) == 10 and hits[0][1] >= hits[-1][1]

    # replaying the same source is a no-op (checkpoint + url anti-join)
    q2 = stream_extend_index(spark, out, str(src), ckpt, available_now=True)
    q2.awaitTermination(240)
    assert LocalSearcher(out).n_docs == s.n_docs


def test_stream_upsert_replaces_recrawls(spark, tmp_path):
    """mode='upsert': a streamed re-crawl batch replaces the old docs —
    old content stops matching, new content matches."""
    import datetime as dt

    import pandas as pd

    out = str(tmp_path / "idx")
    src = tmp_path / "incoming"
    ckpt = str(tmp_path / "ckpt")
    src.mkdir()

    ts = dt.datetime(2025, 1, 1)
    base_rows = [
        (f"http://s/{i:03d}", ts, None, f"oldtoken{i} shared corpus text", "en")
        for i in range(40)
    ]
    schema = "url string, warc_ts timestamp, html binary, text string, lang string"
    build_index(
        spark, spark.createDataFrame(base_rows, schema), out,
        docs_per_part=16, seg_group=2, n_term_buckets=4,
    )
    recrawl = [
        (f"http://s/{i:03d}", ts + dt.timedelta(days=30), None,
         f"newtoken{i} shared corpus text", "en")
        for i in range(40)
    ]
    spark.createDataFrame(recrawl, schema).write.mode("overwrite").parquet(str(src))

    q = stream_extend_index(spark, out, str(src), ckpt, available_now=True, mode="upsert")
    q.awaitTermination(240)

    s = LocalSearcher(out)
    assert s.n_docs == 40  # replaced, not duplicated
    assert s.search(["oldtoken0"], "OR", 5) == []
    assert len(s.search(["newtoken0"], "OR", 5)) == 1
    assert len(s.search(["shared"], "OR", 50)) == 40
