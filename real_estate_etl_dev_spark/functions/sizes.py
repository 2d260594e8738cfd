"""Land/build size mining from prose — SURVEY §2.8 F19, F25, F26.

Reference semantics: ``/root/reference/reid/func.py`` 322-344
(are_to_sqm), 450-496 (find_size/find_land_size/find_build_size),
767-800 (extractor/landsize_extractor/buildsize_extractor), 936-939
(cari_luas_tanah).

All pure column expressions.  The reference's ``eval(value)`` paths
are reproduced with try_cast chains: ``eval`` succeeds exactly when
the comma→dot rewrite yields a single decimal point (try_cast ok),
and its SyntaxError fallback (comma stripped instead) is the second
arm of a coalesce.  Quirk preserved: ``"1.250"`` evaluates to 1.25,
and ``landsize_extractor`` does *not* apply the ×100 are-multiplier
(the line-gated extractor never did).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from .core import col_of, let_, rex, try_double

from .udfs import to_number_expr


def are_to_sqm(c: Column | str) -> Column:
    """"N are" → N×100 sqm as LongType; NULL when no are-match
    (ref func.py:322-344 returns the input unchanged then — callers
    compose ``F.coalesce(are_to_sqm(c), <numeric parse>)``)."""
    raw = rex(c, r"(?i)([0-9.,]+)\s*are", 1)
    val = try_double(F.regexp_replace(raw, ",", "."))
    return (val * 100).try_cast("long")


def _eval_number(val: Column) -> Column:
    """The reference's eval-with-SyntaxError-fallback on a ``[0-9.,]+``
    token: comma→dot first; if that's not a number, strip commas."""
    return F.coalesce(
        try_double(F.regexp_replace(val, ",", ".")),
        try_double(F.regexp_replace(val, ",", "")),
    )


def find_size(
    c: Column | str, patterns: list[tuple[str, int]], lowercase: bool = True
) -> Column:
    """First pattern whose captured size token contains a digit wins;
    a full match ending in 'are' multiplies by 100 (ref func.py:450-476).

    ``patterns`` are (java_regex, capture_group_index) pairs — Java
    regex has no named groups by string key, so the reference's
    ``(?P<name>...)`` becomes a positional group.
    """
    source = F.lower(col_of(c)) if lowercase else col_of(c)

    def body(text: Column) -> Column:
        def candidate(pat: str, gidx: int) -> Column:
            def with_val(val: Column) -> Column:
                return F.when(
                    val.rlike(r"\d"),
                    F.when(
                        rex(text, pat, 0).rlike("are$"), _eval_number(val) * 100
                    ).otherwise(_eval_number(val)),
                )

            return let_(rex(text, pat, gidx), with_val)

        return F.coalesce(*[candidate(pat, gidx) for pat, gidx in patterns])

    return let_(source, body)


LAND_SIZE_PATTERNS: list[tuple[str, int]] = [
    (
        r"(land size|luas tanah|land area|total area).*?([0-9.,]+)\s*(m2|sqm|sq\. meter|square meter|are)",
        2,
    ),
    (r"([0-9.,]+)\s*(sqm of land|square meter(s)? of land|sqm|are)", 1),
]

BUILD_SIZE_PATTERNS: list[tuple[str, int]] = [
    (r"build(ing)? size.*?([0-9.,]+)\s*(m2|m²|sqm|are)?", 2),
    (r"build(ing)?\s*([0-9.,]+)\s*(m2|m²|sqm|are)?", 2),
    (r"([0-9.,]+)\s*(sqm built area|square meter(s)? build|sqm|are)", 1),
    (r"([0-9.,]+) sqm building size", 1),
]


def find_land_size(c: Column | str) -> Column:
    """Land sqm from description (ref func.py:479-485)."""
    return find_size(c, LAND_SIZE_PATTERNS)


def find_build_size(c: Column | str) -> Column:
    """Build sqm from description (ref func.py:488-496)."""
    return find_size(c, BUILD_SIZE_PATTERNS)


def cari_luas_tanah(c: Column | str) -> Column:
    """Bahasa land-size probe returning the raw token string
    (ref func.py:936-939)."""
    return rex(
        c,
        r"(?i)(land size|luas tanah|land area|total area).*?([0-9.,]+)\s*(m2|sqm|sq\. meter|square meter|are)",
        2,
    )


def _gated_line_extractor(c: Column | str, gate_pat: str, token_pat: str) -> Column:
    """Ref func.py:767-781 ``extractor``: per line passing the gate,
    findall the token pattern → to_number each; the FIRST line with
    exactly one match short-circuits; otherwise max over all collected
    values from multi-match lines.  Pure array expressions."""
    lines = F.split(col_of(c), "\n")
    gated = F.filter(lines, lambda line: F.lower(line).rlike(gate_pat))
    per_line = F.transform(
        gated,
        lambda line: F.transform(
            F.regexp_extract_all(line, F.lit(token_pat), F.lit(1)), to_number_expr
        ),
    )
    singles = F.filter(per_line, lambda vals: F.size(vals) == 1)
    flat = F.flatten(per_line)
    return F.when(F.size(singles) > 0, F.get(F.get(singles, 0), 0)).otherwise(
        F.when(F.size(flat) > 0, F.array_max(flat))
    )


def landsize_extractor(c: Column | str) -> Column:
    """Line-gated land-size miner (ref func.py:783-791).  NOTE: no
    ×100 are-multiplier — parity with the reference, which drops it
    in this code path."""
    return _gated_line_extractor(
        c,
        gate_pat="landsize|land size|land for sale",
        token_pat=r"\b([0-9.,]+)(\s*)(sqm|m2|are)\b",
    )


def buildsize_extractor(c: Column | str) -> Column:
    """First line *starting* with Villa/Building that carries a sized
    token (ref func.py:794-800, re.match ⇒ anchored)."""
    pat = r"^(?:[Vv]illa|[Bb]uilding)(.*?)([0-9.,]+)(sqm|m2|are)"
    lines = F.split(col_of(c), "\n")
    matched = F.filter(lines, lambda line: line.rlike(pat))
    first = F.get(matched, 0)
    return to_number_expr(rex(first, pat, 2))
