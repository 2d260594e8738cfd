"""Text cleanup / split-take / icon parsing — SURVEY §2.8 F11, F12,
F15, F20, F21, plus the C3/C5 combinator primitives.

Reference semantics: ``/root/reference/reid/func.py`` 11-12
(get_first/get_last), 197-221 (grab_first/grab_first_word/get_icons),
262-293 (whitespace/show-more cleanup), 347-351
(construct_description), 354-369 (location finders), 729-733
(JoinAndStrip).  All pure column expressions.
"""

from __future__ import annotations

import re as _re

from pyspark.sql import Column
from pyspark.sql import functions as F

from .core import col_of, rex


def get_first(c: Column | str, sep: str) -> Column:
    """Text before the first separator (ref func.py:11)."""
    return F.substring_index(col_of(c), sep, 1)


def get_last(c: Column | str, sep: str) -> Column:
    """Text after the last separator (ref func.py:12)."""
    return F.substring_index(col_of(c), sep, -1)


def grab_first(c: Column | str) -> Column:
    """Split on the first of ``/ - + or`` present and take the head
    (ref func.py:197-206; priority order preserved)."""
    c = col_of(c)
    return (
        F.when(c.contains("/"), F.substring_index(c, "/", 1))
        .when(c.contains("-"), F.substring_index(c, "-", 1))
        .when(c.contains("+"), F.substring_index(c, "+", 1))
        .when(c.contains("or"), F.substring_index(c, "or", 1))
        .otherwise(c)
    )


def grab_first_word(c: Column | str) -> Column:
    """First ``\\w+`` run, NULL if none (ref func.py:209-212)."""
    return rex(c, r"\w+", 0)


def remove_whitespace(c: Column | str) -> Column:
    """Collapse runs of whitespace to single spaces and trim
    (ref func.py:262-263)."""
    return F.trim(F.regexp_replace(col_of(c), r"\s+", " "))


def dot_to_comma(c: Column | str) -> Column:
    """All dots → commas (ref func.py:288-289)."""
    return F.translate(col_of(c), ".", ",")


def remove_show_more_less(c: Column | str) -> Column:
    """Strip UI artifacts 'Show More' / 'Show Less' (ref func.py:292-293)."""
    c = col_of(c)
    return F.replace(F.replace(c, F.lit("Show More"), F.lit("")), F.lit("Show Less"), F.lit(""))


def construct_description(lines: Column | str) -> Column:
    """Array of raw lines → trimmed, empties dropped, '\\n'-joined
    (ref func.py:347-351).  C3 JoinAndStrip generalizes this."""
    return join_and_strip(lines, "\n")


def join_and_strip(values: Column | str, sep: str) -> Column:
    """C3 combinator: strip each, drop empties, join (ref func.py:729-733)."""
    arr = col_of(values)
    # NB: must be an explicit unary lambda — F.trim itself has an
    # optional 2nd param, which transform() would fill with the index.
    cleaned = F.filter(F.transform(arr, lambda x: F.trim(x)), lambda x: x != "")
    return F.trim(F.array_join(cleaned, sep))


def get_icons(icons: Column | str) -> Column:
    """"Key: value" lines → map (ref func.py:215-221): key lowercased,
    spaces→underscores; value lowercased, stripped, then 'm2' removed
    (post-strip, so a trailing space can survive — parity quirk)."""
    arr = col_of(icons)
    entry = lambda i: F.struct(  # noqa: E731
        F.replace(
            F.trim(F.lower(F.substring_index(i, ":", 1))), F.lit(" "), F.lit("_")
        ).alias("key"),
        F.replace(
            F.trim(F.lower(F.substring_index(i, ":", -1))), F.lit("m2"), F.lit("")
        ).alias("value"),
    )
    return F.map_from_entries(F.transform(arr, entry))


def find_location_in_description(c: Column | str) -> Column:
    """``location:\\s*(\\w+)`` mined case-insensitively, answer returned
    in its original casing (ref func.py:354-362; the reference re-finds
    the span in the lowercased text — equivalent except when the word
    also occurs earlier, a pathological case we don't reproduce)."""
    return rex(c, r"(?i)location:\s*(\w+)", 1)


def find_location_in_title(c: Column | str) -> Column:
    """First "in <word>" → Title-case (ref func.py:365-369)."""
    return F.initcap(rex(c, r"(?i)in (\w+)", 1))


def split_on(c: Column | str, sep: str = "-", index: int = 0) -> Column:
    """C5 SplitOn: split on a literal separator, take index, strip
    (ref func.py:695-703)."""
    parts = F.split(col_of(c), _re.escape(sep))
    picked = F.get(parts, index) if index >= 0 else F.get(parts, F.size(parts) + index)
    return F.trim(picked)


def take_nth(values: Column | str, position: int) -> Column:
    """C5 TakeNth: positional take with trim; NULL out of range
    (ref func.py:708-721)."""
    arr = F.transform(col_of(values), lambda x: F.trim(x))
    if position >= 0:
        return F.get(arr, position)
    return F.get(arr, F.size(arr) + position)


def max_of(values: Column | str) -> Column:
    """C5 Max over collected values (ref func.py:724-726)."""
    return F.array_max(col_of(values))
