"""Derived-field registry semantics (reference:
luigi_pipeline/tests/model/test_base_model.py:33-176)."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from hail_elasticsearch_pipelines_spark.functions.fields import (
    FieldOmit,
    FieldRegistry,
    UnsatisfiableField,
)


@pytest.fixture()
def base_df(spark):
    return spark.createDataFrame(pd.DataFrame({"x": [1, 2, 3]}))


def test_dependency_ordering(base_df):
    reg = FieldRegistry()
    reg.add("c", lambda df: F.col("b") + 1, requires=("b",))
    reg.add("b", lambda df: F.col("a") + 1, requires=("a",))
    reg.add("a", lambda df: F.col("x") + 1)
    out = reg.apply_all(base_df).orderBy("x").collect()
    assert [r["c"] for r in out] == [4, 5, 6]


def test_at_most_once_unless_overwrite(base_df):
    reg = FieldRegistry()
    reg.add("x", lambda df: F.lit(99))
    same = reg.apply_all(base_df).orderBy("x").collect()
    assert [r["x"] for r in same] == [1, 2, 3]  # skipped: already present
    over = reg.apply_all(base_df, overwrite=True).collect()
    assert all(r["x"] == 99 for r in over)


def test_omit(base_df):
    reg = FieldRegistry()

    def maybe(df):
        raise FieldOmit()

    reg.add("skipped", maybe)
    reg.add("kept", lambda df: F.lit(1))
    out = reg.apply_all(base_df)
    assert "kept" in out.columns and "skipped" not in out.columns


def test_unsatisfiable(base_df):
    reg = FieldRegistry()
    reg.add("needs_ghost", lambda df: F.col("ghost"), requires=("ghost",))
    with pytest.raises(UnsatisfiableField):
        reg.apply_all(base_df)


def test_decorator_form(base_df):
    reg = FieldRegistry()

    @reg.register("doubled")
    def _doubled(df):
        return F.col("x") * 2

    out = reg.apply_all(base_df).orderBy("x").collect()
    assert [r["doubled"] for r in out] == [2, 4, 6]
