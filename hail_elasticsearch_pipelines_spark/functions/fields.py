"""Dependency-ordered derived-field registry over Spark Columns.

Reference analog: the ``@row_annotation(name=, fn_require=)`` framework
(luigi_pipeline/lib/model/base_mt_schema.py:21-73 decorator,
:135-219 round scheduler, :221-241 final select) — N derived fields
declared as methods, topologically batched into rounds, each round
applied as ONE wide annotate call, at-most-once semantics with
``overwrite``, conditional skip (``RowAnnotationOmit``), and a hard
error on unsatisfiable dependencies.

Spark re-expression: fields are ``(name, fn(df) -> Column, requires)``;
rounds become batched ``withColumns`` (one projection per round —
Catalyst collapses adjacent projections anyway, but batching keeps the
lineage readable and mirrors the reference's semantics tests,
tests/model/test_base_model.py:33-176).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable

from pyspark.sql import Column, DataFrame


class FieldOmit(Exception):
    """Raised by a field fn to skip this field (reference:
    RowAnnotationOmit, base_mt_schema.py:16-19)."""


class UnsatisfiableField(Exception):
    """Dependency can never be satisfied (reference raises ValueError at
    base_mt_schema.py:205-215)."""


@dataclass
class FieldDef:
    name: str
    fn: Callable[[DataFrame], Column]
    requires: tuple[str, ...] = ()


@dataclass
class FieldRegistry:
    fields: dict[str, FieldDef] = field(default_factory=dict)

    def register(self, name: str, requires: tuple[str, ...] = ()):  # decorator
        def deco(fn: Callable[[DataFrame], Column]):
            self.fields[name] = FieldDef(name, fn, tuple(requires))
            return fn

        return deco

    def add(self, name: str, fn: Callable[[DataFrame], Column], requires: tuple[str, ...] = ()) -> None:
        self.fields[name] = FieldDef(name, fn, tuple(requires))

    def apply_all(self, df: DataFrame, overwrite: bool = False) -> DataFrame:
        """Apply every registered field in dependency-ordered rounds.

        At-most-once: a field whose column already exists is skipped
        unless ``overwrite`` (reference base_mt_schema.py:160-171).
        """
        present = set(df.columns)
        pending = {
            n: d
            for n, d in self.fields.items()
            if overwrite or n not in present
        }
        applied = set(df.columns)
        while pending:
            round_fields: dict[str, Column] = {}
            omitted: list[str] = []
            for name, fdef in list(pending.items()):
                if all(r in applied for r in fdef.requires):
                    try:
                        round_fields[name] = fdef.fn(df)
                    except FieldOmit:
                        omitted.append(name)
            for name in omitted:
                del pending[name]
            if not round_fields:
                if not omitted:
                    unmet = {
                        n: [r for r in d.requires if r not in applied]
                        for n, d in pending.items()
                    }
                    raise UnsatisfiableField(f"unsatisfiable field dependencies: {unmet}")
                continue
            df = df.withColumns(round_fields)
            for name in round_fields:
                applied.add(name)
                del pending[name]
        return df
