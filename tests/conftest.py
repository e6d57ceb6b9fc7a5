from __future__ import annotations

import numpy as np
import pytest

from hail_elasticsearch_pipelines_spark.session import get_spark
from hail_elasticsearch_pipelines_spark.sources.corpus import gen_pages_pdf


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="pytest", master="local[4]", shuffle_partitions=4)
    yield s


@pytest.fixture(scope="session")
def tiny_pages_pdf():
    """30-doc golden corpus (the 1kg_30variants.vcf.bgz analog)."""
    return gen_pages_pdf(np.arange(30))


@pytest.fixture(scope="session")
def small_pages_pdf():
    """~300-doc pytest corpus incl. re-crawled dups and null texts."""
    return gen_pages_pdf(np.arange(300))


@pytest.fixture(scope="session")
def small_pages_df(spark, small_pages_pdf):
    return spark.createDataFrame(small_pages_pdf)


@pytest.fixture(scope="session")
def small_index(spark, small_pages_df, tmp_path_factory):
    """Published index over the small corpus, shared across query tests."""
    from hail_elasticsearch_pipelines_spark.operators.index_build import build_index

    out = str(tmp_path_factory.mktemp("index") / "idx")
    manifest = build_index(
        spark, small_pages_df, out, docs_per_part=37, seg_group=2, n_term_buckets=8
    )
    return out, manifest


@pytest.fixture(scope="session")
def small_oracle(small_pages_pdf):
    """OracleIndex over the deduped small corpus (latest warc_ts wins,
    text extracted from html when null) with doc ids in url order."""
    from hail_elasticsearch_pipelines_spark.functions.extract import py_extract_text
    from hail_elasticsearch_pipelines_spark.functions.tokenize import py_tokenize
    from hail_elasticsearch_pipelines_spark.operators.index_build import py_dlen_bucket
    from hail_elasticsearch_pipelines_spark.oracle import OracleIndex

    pdf = small_pages_pdf.sort_values("warc_ts").drop_duplicates("url", keep="last")
    pdf = pdf.sort_values("url").reset_index(drop=True)
    docs, facets = {}, {}
    for i, row in pdf.iterrows():
        text = row["text"] if row["text"] is not None else py_extract_text(row["html"])
        docs[i] = text
        facets[i] = {
            "lang": row["lang"],
            "dlen": str(py_dlen_bucket(len(py_tokenize(text)))),
        }
    return OracleIndex(docs, facets=facets), pdf
