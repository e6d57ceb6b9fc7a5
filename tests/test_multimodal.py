"""Multimodal plumbing: metadata, frame sampling, resize — the decode
step is a declared stub (libs absent); the Spark machinery (schemas,
Arrow batch shapes, fan-out arithmetic) is real and tested."""

from __future__ import annotations

import hashlib

import pytest

from hail_elasticsearch_pipelines_spark.operators import multimodal as mm


def test_image_resize_stub_aspect_fit(spark):
    import pandas as pd
    from pyspark.sql import functions as F

    pdf = pd.DataFrame(
        {"media_id": [1, 2, 3], "payload": [b"abc", b"hello world", b"x" * 500]}
    )
    df = spark.createDataFrame(pdf)
    out = {r["media_id"]: r for r in mm.image_resize_stub(df, target=224).collect()}
    assert set(out) == {1, 2, 3}
    for mid, payload in ((1, b"abc"), (2, b"hello world"), (3, b"x" * 500)):
        r = out[mid]
        w, h = mm.fake_decode_dims(payload)
        assert (r["src_w"], r["src_h"]) == (w, h)
        m = max(w, h)
        assert r["out_w"] == max(1, (w * 224) // m)
        assert r["out_h"] == max(1, (h * 224) // m)
        # aspect fit: the long side hits the target, nothing exceeds it
        assert max(r["out_w"], r["out_h"]) == 224
        hhex = hashlib.sha256(payload).hexdigest()
        expect = hashlib.sha256(
            f"{hhex}:{r['out_w']}x{r['out_h']}".encode()
        ).hexdigest()
        assert r["resized_sha"] == expect
