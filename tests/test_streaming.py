"""Streaming ingestion: new crawl batches folded into a published index
via foreachBatch + extend_index, rank-identical to a batch rebuild."""

from __future__ import annotations

import numpy as np
import pytest

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


def _mini_pages(rows):
    """rows: list of (url, ts, text) → PAGES_SCHEMA pandas frame."""
    import pandas as pd

    return pd.DataFrame(
        [(u, ts, b"<html><body>x</body></html>", tx, "en") for u, ts, tx in rows],
        columns=["url", "warc_ts", "html", "text", "lang"],
    )


def test_stream_crawl_stats_watermark_drops_late_rows(spark, tmp_path):
    """Windowed agg with watermark (append mode): windows finalize once
    the watermark passes their end, and a row arriving LATER than the
    watermark is dropped — bounded state at crawl scale."""
    import datetime as dt
    import os
    import time

    from hail_elasticsearch_pipelines_spark.streaming.stats import stream_crawl_stats

    src = tmp_path / "stream_src"
    src.mkdir()
    t0 = dt.datetime(2025, 3, 1, 0, 0, 0)
    h = dt.timedelta(hours=1)
    # batch 1: two rows in [00,01), one in [01,02), one at 05:00
    # (advances the 2h watermark to 03:00 AFTER the batch)
    b1 = _mini_pages(
        [
            ("u1", t0 + 0.5 * h, "alpha"),
            ("u2", t0 + 0.75 * h, "beta"),
            ("u3", t0 + 1.5 * h, "gamma"),
            ("u4", t0 + 5 * h, "delta"),
        ]
    )
    # batch 2: nothing late — lets the engine EVICT+EMIT the windows
    # below watermark 03:00 ([00,01) and [01,02))
    b2 = _mini_pages([("u6", t0 + 6 * h, "new")])
    # batch 3: a row in the already-finalized [00,01) window, older
    # than the standing watermark → dropped at input (no state left,
    # no duplicate append emission)
    b3 = _mini_pages([("u5", t0 + 0.75 * h, "late")])
    paths = [str(src / f"b{i}.parquet") for i in (1, 2, 3)]
    for pdf, p in zip((b1, b2, b3), paths):
        spark.createDataFrame(pdf).coalesce(1).write.mode("overwrite").parquet(p)
    now = time.time()
    for i, p in enumerate(paths):  # force file-source batch order
        for f in os.listdir(p):
            os.utime(os.path.join(p, f), (now + i * 10, now + i * 10))

    stats = stream_crawl_stats(
        spark, str(src) + "/*", window_duration="1 hour",
        watermark="2 hours", max_files_per_trigger=1,
    )
    q = (
        stats.writeStream.format("memory")
        .queryName("crawl_stats_test")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_stats"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    out = {
        (r["window_start"].hour, r["lang"]): r["n_pages"]
        for r in spark.sql("select * from crawl_stats_test").collect()
    }
    # finalized windows only, late row NOT counted
    assert out == {(0, "en"): 2, (1, "en"): 1}


def test_stream_first_seen_urls_stateful(spark, tmp_path):
    """applyInPandasWithState custom stateful op: each url emitted
    exactly once across micro-batches, with its first-batch min ts."""
    import datetime as dt
    import os
    import time

    from hail_elasticsearch_pipelines_spark.streaming.stats import (
        stream_first_seen_urls,
    )

    src = tmp_path / "frontier_src"
    src.mkdir()
    t0 = dt.datetime(2025, 3, 1, 12, 0, 0)
    m = dt.timedelta(minutes=1)
    b1 = _mini_pages([("a", t0 + 2 * m, "x"), ("b", t0, "y"), ("b", t0 + 5 * m, "y2")])
    b2 = _mini_pages([("b", t0 + 9 * m, "y3"), ("c", t0 + 7 * m, "z")])
    p1, p2 = str(src / "b1.parquet"), str(src / "b2.parquet")
    spark.createDataFrame(b1).coalesce(1).write.mode("overwrite").parquet(p1)
    spark.createDataFrame(b2).coalesce(1).write.mode("overwrite").parquet(p2)
    now = time.time()
    for i, p in enumerate((p1, p2)):
        for f in os.listdir(p):
            os.utime(os.path.join(p, f), (now + i * 10, now + i * 10))

    firsts = stream_first_seen_urls(spark, str(src) + "/*", max_files_per_trigger=1)
    q = (
        firsts.writeStream.format("memory")
        .queryName("first_seen_test")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_first"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("select * from first_seen_test").collect()
    got = {r["url"]: r["first_ts"] for r in rows}
    assert len(rows) == 3  # each url exactly once
    assert got == {"a": t0 + 2 * m, "b": t0, "c": t0 + 7 * m}


def test_stream_percolate_matches_batch(spark, tmp_path):
    """Streaming percolation over a file stream must produce EXACTLY
    the batch percolator's (doc_id, query_id) set, and new files fire
    new alerts on the next micro-batch."""
    import os
    import pandas as pd

    from pyspark.sql import types as T

    from hail_elasticsearch_pipelines_spark.operators.percolate import (
        percolate,
    )
    from hail_elasticsearch_pipelines_spark.streaming.alerts import (
        stream_percolate,
    )

    watches = {
        "cats": "cat AND dog",
        "exact": '"red panda"',
        "big": "n_chars:[40 TO *] AND news",
    }
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
            T.StructField("n_chars", T.LongType()),
        ]
    )
    src = str(tmp_path / "docs")
    os.makedirs(src)
    batch1 = pd.DataFrame(
        {
            "doc_id": [0, 1, 2],
            "text": [
                "cat meets dog in the park",
                "the red panda sleeps",
                "news " + "x" * 60,
            ],
            "n_chars": [25, 20, 65],
        }
    )
    spark.createDataFrame(batch1, schema).coalesce(1).write.parquet(
        src + "/b1"
    )
    stream = spark.readStream.schema(schema).option(
        "maxFilesPerTrigger", 1
    ).parquet(src + "/*")
    with pytest.raises(ValueError):
        stream_percolate(spark.createDataFrame(batch1, schema), watches)
    hits = stream_percolate(stream, watches)
    q = (
        hits.writeStream.format("memory")
        .queryName("alerts")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        got1 = {
            (r.doc_id, r.query_id)
            for r in spark.sql("SELECT * FROM alerts").collect()
        }
        exp1 = {
            (r.doc_id, r.query_id)
            for r in percolate(
                spark.createDataFrame(batch1, schema), watches
            ).collect()
        }
        assert got1 == exp1 == {(0, "cats"), (1, "exact"), (2, "big")}
        # a late-arriving file fires its alerts on the next micro-batch
        batch2 = pd.DataFrame(
            {
                "doc_id": [3],
                "text": ["another red panda with a dog and a cat"],
                "n_chars": [40],
            }
        )
        spark.createDataFrame(batch2, schema).coalesce(1).write.parquet(
            src + "/b2"
        )
        q.processAllAvailable()
        got2 = {
            (r.doc_id, r.query_id)
            for r in spark.sql("SELECT * FROM alerts").collect()
        }
        assert got2 == exp1 | {(3, "cats"), (3, "exact")}
    finally:
        q.stop()
