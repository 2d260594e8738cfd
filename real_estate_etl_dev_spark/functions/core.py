"""Shared helpers for the scalar function library.

Every extractor in this package is a *Column builder*: it takes
``Column``s (or column names) and returns a ``Column`` made only of
built-in Spark expressions, so the whole library stays inside
whole-stage codegen — no Python in the hot path.  The handful of
genuinely heuristic functions live in ``udfs.py`` as Arrow-batched
pandas UDFs.

Spark 4 runs with ANSI mode on by default, so every cast of
user-shaped text goes through ``try_cast`` (null on failure — the
engine-level analog of the reference's try/except-return-None).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def col_of(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def rex(c: Column | str, pattern: str, group: int = 0) -> Column:
    """regexp_extract that yields NULL (not '') on no-match."""
    return F.nullif(F.regexp_extract(col_of(c), pattern, group), F.lit(""))


def try_long(c: Column) -> Column:
    return c.try_cast("long")


def try_double(c: Column) -> Column:
    return c.try_cast("double")


def count_char(c: Column | str, ch: str) -> Column:
    """Occurrences of a literal character (dot/comma disambiguation)."""
    c = col_of(c)
    return F.length(c) - F.length(F.translate(c, ch, ""))


def let_(value: Column, body) -> Column:
    """Bind ``value`` once and reference it many times in ``body``
    without duplicating its expression tree.

    Column builders compose; a builder that references its input N
    times over an input that is itself a deep chain multiplies tree
    size (the naive ``re_extract_price`` hit ~10^5 analysis nodes and
    OOM'd the driver).  ``transform`` over a 1-element array gives a
    true let: the lambda variable is a leaf reference, evaluated once
    per row.  The 1-element array detour keeps everything JVM-side.
    """
    return F.element_at(F.transform(F.array(value), body), 1)
