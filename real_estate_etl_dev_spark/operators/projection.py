"""Field-projection DSL — SURVEY §2.2 P1-P3, the ItemLoader analog.

The reference assembles every record through per-field
(selector, MapCompose chain, output processor) triples
(``reid/spiders/ubudproperty.py:96-137``, repeated in all 22 spiders;
processors wired in ``reid/items.py:18-87``).  Here a ``Field`` is a
declarative spec compiled into ONE ``select`` — candidates are
expressions, the processor chain is function composition over
Columns, and the output processor defaults to C1 TakeFirst.  The
whole record assembly stays a single projection inside whole-stage
codegen: no loader objects, no per-row Python.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field as dc_field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.combinators import take_first
from ..functions.core import col_of


@dataclass(frozen=True)
class Field:
    """One output column: candidate inputs → per-candidate processor
    chain → output combinator (P1).

    ``inputs`` mirror add_css/add_value calls; ``processors`` mirror
    MapCompose (NULL propagates through builtin expressions exactly
    like MapCompose drops None); ``output`` mirrors the output
    processor (TakeFirst / Join / AnySoldDelisted / ...)."""

    name: str
    inputs: tuple = ()
    processors: tuple = ()
    output: Callable[..., Column] | None = None
    metadata: dict = dc_field(default_factory=dict)

    def compile(self) -> Column:
        cands = []
        for src in self.inputs:
            c = col_of(src)
            for proc in self.processors:
                c = proc(c)
            cands.append(c)
        if self.output is not None:
            out = self.output(*cands)
        elif len(cands) == 1:
            out = cands[0]
        else:
            out = take_first(*cands)
        return out.alias(self.name)


def project_fields(
    df: DataFrame,
    fields: list[Field],
    keep: tuple[str, ...] = (),
    drop_helpers: tuple[str, ...] = (),
) -> DataFrame:
    """P1: compile the spec into one select.  ``keep`` passes columns
    through; ``drop_helpers`` documents the P2 contract (helper raw
    columns like html/json simply aren't selected —
    ref reid/pipelines/property.py:30-32)."""
    cols = [F.col(k) for k in keep] + [f.compile() for f in fields]
    return df.select(*cols)


def split_skip(df: DataFrame, skip_col: str = "skip") -> tuple[DataFrame, DataFrame]:
    """P14: conditional skip/short-circuit — rows flagged ``skip``
    bypass the pipeline untouched (ref reid/pipelines/property.py:24-25,
    96-98).  Returns (active, skipped); as a filter split both sides
    stay lazy and share the scan."""
    if skip_col not in df.columns:
        return df, df.limit(0)
    flag = F.coalesce(F.col(skip_col), F.lit(False))
    return df.filter(~flag), df.filter(flag)


def rename_and_derive(
    df: DataFrame, renames: dict[str, str], derived: dict[str, Column]
) -> DataFrame:
    """P3: column rename + derived flags in one pass
    (ref pipelines/property.py:34-36: availability_label→availability,
    is_available = availability == 'Available')."""
    out = df
    for old, new in renames.items():
        out = out.withColumnRenamed(old, new)
    return out.withColumns(derived)
