"""Per-site micro-parsers — SURVEY §2.8 F36 (reid/customs/*).

Reference semantics: ``reid/customs/balimoves.py`` (fa_remover),
``exotiqproperty.py`` (lease_or_free_hold), ``balivillasales.py``
(get_balivillasales_price), ``dotproperty.py`` (after_colon in
jsonio, find_years, leasehold_years_finders cascade),
``ubudproperty.py`` (find_code, extract_publish_date),
``balipropertiesforsale.py`` (to_mmddyy in dates),
``balitreasureproperties.py`` (find_page_number in jsonio),
``baliexception.py`` (try_pass ⇒ NULL-on-failure, which is the
native semantics of every builder here).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from .core import col_of, rex


def fa_remover(c: Column | str) -> Column:
    """Last css class with the leading 'fa-' characters stripped
    (ref customs/balimoves.py; ``lstrip("fa-")`` strips the CHARACTER
    SET {f,a,-}, quirk preserved)."""
    last = F.substring_index(col_of(c), " ", -1)
    return F.regexp_replace(last, r"^[fa\-]+", "")


def lease_or_free_hold(c: Column | str) -> Column:
    """'For lease'→Leasehold, 'For sale'→Freehold, else passthrough
    (ref customs/exotiqproperty.py)."""
    c = col_of(c)
    return (
        F.when(c == "For lease", "Leasehold")
        .when(c == "For sale", "Freehold")
        .otherwise(c)
    )


def get_balivillasales_price(c: Column | str) -> Column:
    """One price string → struct(idr, usd, lease_years, availability)
    (ref customs/balivillasales.py): slash-split, head routes to
    idr/usd + sold check, tail is the lease term."""
    t = F.lower(F.trim(col_of(c)))
    head = F.substring_index(t, "/", 1)
    tail = F.substring_index(t, "/", -1)
    has_slash = t.contains("/")
    return F.struct(
        F.when(head.contains("idr"), head).alias("idr"),
        F.when(~head.contains("idr") & head.contains("usd"), head).alias("usd"),
        F.when(has_slash, tail).alias("lease_years"),
        F.when(head.contains("sold"), F.lit("Sold"))
        .otherwise(F.lit("Available"))
        .alias("availability"),
    )


def find_years(c: Column | str, current_year: int) -> Column:
    """dotproperty custom: 4-digit years (2xxx) become years-left,
    '\\d{2} th' tokens are literal terms; first positive wins
    (ref customs/dotproperty.py find_years)."""
    toks = F.regexp_extract_all(col_of(c), F.lit(r"\d{4}|\d{2}\s*th"), F.lit(0))
    nums = F.transform(
        toks,
        lambda t: F.nullif(F.regexp_extract(t, r"\d+", 0), F.lit("")).cast("int"),
    )
    shifted = F.transform(
        nums,
        lambda n: F.when(
            (n >= 1000) & (n < 2000), F.lit(None).cast("int")  # 4-digit not starting 2
        ).otherwise(F.when(n >= 2000, n - current_year).otherwise(n)),
    )
    positive = F.filter(shifted, lambda n: n.isNotNull() & (n > 0))
    return F.when(F.size(positive) > 0, F.element_at(positive, 1)).cast("double")


def find_code_before_paren(c: Column | str) -> Column:
    """Listing code = text before ' (' (ref customs/ubudproperty.py
    find_code; '' when absent)."""
    return F.coalesce(rex(c, r"(.*?) \(", 1), F.lit(""))


def extract_publish_date(c: Column | str) -> Column:
    """First 8-digit run parsed as yyyyMMdd; NULL when invalid
    (ref customs/ubudproperty.py extract_publish_date)."""
    token = rex(c, r"\d{8}", 0)
    return F.try_to_timestamp(token, F.lit("yyyyMMdd"))
