"""Nested-struct utilities.

Reference analog: `flatten()` before export — recursively expands
nested structs to dotted top-level fields and unkeys the table
(luigi_pipeline/lib/model/seqr_mt_schema.py:345-354).  Spark has no
builtin recursive flatten; this is the ~20-line helper SURVEY §2.2 P6
calls for, with the sink-safe name separator configurable (the
reference uses '.', ES re-nests on '.' — our parquet sink uses '_')."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def flatten_structs(df: DataFrame, sep: str = "_") -> DataFrame:
    """Recursively flatten all StructType columns into top-level columns
    named parent<sep>child; non-struct columns pass through unchanged."""

    def expand(prefix: str, col: Column, dtype: T.DataType) -> list[Column]:
        if isinstance(dtype, T.StructType):
            out: list[Column] = []
            for f in dtype.fields:
                out.extend(expand(f"{prefix}{sep}{f.name}", col.getField(f.name), f.dataType))
            return out
        return [col.alias(prefix)]

    cols: list[Column] = []
    for f in df.schema.fields:
        if isinstance(f.dataType, T.StructType):
            cols.extend(expand(f.name, F.col(f.name), f.dataType))
        else:
            cols.append(F.col(f.name))
    return df.select(*cols)
