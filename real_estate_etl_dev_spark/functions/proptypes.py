"""Property-type / contract / availability / off-plan standardization —
SURVEY §2.8 F8, F10, F17, F22, F28, F29 and combinator C4.

Reference semantics: ``/root/reference/reid/func.py`` 161-179
(find_property_type), 187-194 (find_hold_state), 296-299 (is_sold),
372-382 (contract type), 651-673 (define_property_type), 684-692
(AnySoldDelisted), 736-757 (find_sold_out/find_off_plan), 760-764
(find_bedrooms), 849-867 (standardize_property_type);
``models/property.py`` 61-68, 140-153 (off-plan normalize/detect).
All pure column expressions (when-cascades over rlike).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from .core import col_of, rex, try_double


def find_property_type(c: Column | str) -> Column:
    """First keyword of villa|apartement|townhotel|land|loft|house|home
    (substring, lowercased) → Title (ref func.py:161-166)."""
    low = F.lower(col_of(c))
    out = F.lit(None).cast("string")
    chain = F.when(F.lit(False), out)
    for t in ["villa", "apartement", "townhotel", "land", "loft", "house", "home"]:
        chain = chain.when(low.contains(t), F.lit(t.title()))
    return chain.otherwise(out)


def define_property_type(c: Column | str, default: str = "Villa") -> Column:
    """Priority keyword search → canonical type; home/house→House,
    plot→Land; default Villa (ref func.py:651-673)."""
    c = col_of(c)
    chain = None
    for pat, label in [
        ("apartment", "Apartment"),
        ("apartement", "Apartement"),
        ("townhotel", "Townhotel"),
        ("hotel", "Hotel"),
        ("land", "Land"),
        ("loft", "Loft"),
        ("plot", "Land"),
        ("house|home", "House"),
        ("villa", "Villa"),
    ]:
        cond = c.rlike(f"(?i){pat}")
        chain = F.when(cond, label) if chain is None else chain.when(cond, label)
    return chain.otherwise(F.lit(default))


def standardize_property_type(c: Column | str) -> Column:
    """Regex case-chain → canonical; passthrough when unknown; then
    strip ' for Sale' (ref func.py:849-867)."""
    c = col_of(c)
    mapped = (
        F.when(c.rlike(r"(?i)land"), "Land")
        .when(c.rlike(r"(?i)townhouse"), "Townhouse")
        .when(c.rlike(r"(?i)house|home"), "House")
        .when(c.rlike(r"(?i)apartment|apartement"), "Apartment")
        .when(c.rlike(r"(?i)commercial"), "Commercial")
        .when(c.rlike(r"(?i)^hotel"), "Hotel")
        .when(c.rlike(r"(?i)villa"), "Villa")
        .otherwise(c)
    )
    return F.replace(mapped, F.lit(" for Sale"), F.lit(""))


def find_contract_type(c: Column | str) -> Column:
    """leasehold|freehold → Title-case, else passthrough
    (ref func.py:372-376)."""
    c = col_of(c)
    hit = rex(F.lower(c), r"leasehold|freehold", 0)
    return F.coalesce(F.initcap(hit), c)


def get_contract_type(c: Column | str) -> Column:
    """leasehold|freehold → Title-case, else 'Freehold'
    (ref func.py:379-382)."""
    hit = rex(F.lower(col_of(c)), r"leasehold|freehold", 0)
    return F.coalesce(F.initcap(hit), F.lit("Freehold"))


def find_hold_state(tags: Column | str) -> Column:
    """Tag array → struct(is_leasehold, is_sold) (ref func.py:187-194);
    whitespace squeezed out of each tag before the substring tests."""
    arr = F.transform(col_of(tags), lambda t: F.lower(F.regexp_replace(t, r"\s+", "")))
    return F.struct(
        F.exists(arr, lambda t: t.contains("lease")).alias("is_leasehold"),
        F.exists(arr, lambda t: t.contains("sold")).alias("is_sold"),
    )


def is_sold(c: Column | str) -> Column:
    """Exact 'sold' label → Sold else Available (ref func.py:296-299)."""
    return F.when(F.lower(col_of(c)) == "sold", F.lit("Sold")).otherwise(F.lit("Available"))


def find_sold_out(labels: Column | str) -> Column:
    """Any label containing 'sold' → Sold else Available
    (ref func.py:736-742; empty array → Available)."""
    hit = F.exists(col_of(labels), lambda s: F.lower(s).contains("sold"))
    return F.when(hit, F.lit("Sold")).otherwise(F.lit("Available"))


def any_sold_delisted(values: Column | str) -> Column:
    """C4 combinator: any 'sold' ⇒ Sold; else any 'delisted' ⇒
    Delisted; else Available (ref func.py:684-692)."""
    arr = col_of(values)
    sold = F.exists(arr, lambda s: F.lower(s).contains("sold"))
    delisted = F.exists(arr, lambda s: F.lower(s).contains("delisted"))
    return (
        F.when(sold, F.lit("Sold"))
        .when(delisted, F.lit("Delisted"))
        .otherwise(F.lit("Available"))
    )


def normalize_off_plan(c: Column | str) -> Column:
    """"off … plan" variants → 'off-plan' (ref models/property.py:147-153)."""
    return F.regexp_replace(col_of(c), r"(?i)\boff([\s\d\w]+)plan\b", "off-plan")


def has_off_plan(c: Column | str, include_under_construction: bool = True) -> Column:
    """Off-plan keyword check; NULL-safe → false
    (ref models/property.py:140-145, func.py:745-757 keyword list)."""
    low = F.lower(F.trim(col_of(c)))
    pat = "off plan|offplan|off-plan"
    if include_under_construction:
        pat += "|under construction"
    return F.coalesce(low.rlike(pat), F.lit(False))


def find_off_plan(
    title: Column | str,
    description: Column | str,
    labels: Column | str | None = None,
    include_under_construction: bool = False,
) -> Column:
    """True if title, description, or any label carries an off-plan
    marker (ref func.py:745-757; the Property-model variant also counts
    'under construction' — models/property.py:140-145)."""
    out = has_off_plan(title, include_under_construction) | has_off_plan(
        description, include_under_construction
    )
    if labels is not None:
        out = out | F.coalesce(
            F.exists(col_of(labels), lambda x: has_off_plan(x, include_under_construction)),
            F.lit(False),
        )
    return out


def check_off_plan(title: Column | str, description: Column | str, labels: Column | str | None = None) -> Column:
    """Property.check_off_plan analog: normalize 'off … plan' spellings
    in title/description first, then detect (models/property.py:61-68)."""
    return find_off_plan(
        normalize_off_plan(title),
        normalize_off_plan(description),
        labels,
        include_under_construction=True,
    )


def find_bedrooms(c: Column | str) -> Column:
    """"N bedroom(s)" → N (ref func.py:760-764)."""
    return rex(c, r"(?i)(\d{1,2}) bedroom(s?)", 1).try_cast("long")


def safe_number(c: Column | str) -> Column:
    """str→float, ints kept integral, others round(2); NULL on junk
    (ref func.py:302-319).  DoubleType (the int/float split is a
    Python-type artifact; values match)."""
    v = try_double(col_of(c))
    return F.when(v == F.floor(v), v).otherwise(F.round(v, 2))
