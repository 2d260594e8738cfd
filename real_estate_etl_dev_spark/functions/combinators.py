"""Item-processor combinators C1-C6 (SURVEY §2.9) — the ItemLoader
algebra re-expressed over Columns.

Reference semantics: ``reid/items.py:18-87`` wires every field
through ``TakeFirst`` / ``MapCompose`` / ``Join`` chains;
``/root/reference/reid/func.py`` 676-733, 843-846 define the custom
ones.  In a columnar engine a "collected values list" is either a
set of alternative expressions (C1/C2) or an ArrayType column
(C3-C6) — both forms are provided where they differ.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column
from pyspark.sql import functions as F

from .core import col_of

# C3 / C5 primitives live in textops (join_and_strip, split_on,
# take_nth, max_of); C4 any_sold_delisted and C6 is_off_plan live in
# proptypes; C6 lease cascade lives in udfs.  Re-exported via
# functions.__init__ so the combinator set is one namespace.


def take_first(*candidates: Column | str) -> Column:
    """C1 TakeFirst: first non-null, non-empty-string candidate
    (ref itemloaders TakeFirst semantics: None and '' are skipped)."""
    cleaned = [F.nullif(col_of(c).cast("string"), F.lit("")) for c in candidates]
    return F.coalesce(*cleaned)


def take_first_typed(*candidates: Column | str) -> Column:
    """C1 for non-string columns (no ''-skip; plain coalesce)."""
    return F.coalesce(*[col_of(c) for c in candidates])


def map_compose(*fns: Callable[[Column], Column]) -> Callable[[Column], Column]:
    """C2 MapCompose: function-chain composition over a single value.
    Drop-None propagation is native — a NULL intermediate stays NULL
    through every built-in expression."""

    def chained(c: Column | str) -> Column:
        out = col_of(c)
        for fn in fns:
            out = fn(out)
        return out

    return chained


def map_compose_array(*fns: Callable[[Column], Column]) -> Callable[[Column], Column]:
    """C2 over an ArrayType column: apply the chain per element, then
    drop nulls (MapCompose drops values the chain maps to None)."""

    def chained(arr: Column | str) -> Column:
        out = F.transform(col_of(arr), map_compose(*fns))
        return F.array_compact(out)

    return chained
