"""Price / currency extraction — SURVEY §2.8 F2-F6, F16, F23, F26, F31.

Reference semantics (studied, not copied): ``/root/reference/reid/func.py``
18-32 (to_number), 40-61 (find_usd/find_idr), 64-96 (clean_price_text),
99-112 (fix_price), 115-122 (check_per_meter), 125-158
(re_extract_price), 266-269 (price_request_to_zero), 385-393
(grab_price), 803-825 (recalculate_price_by_land_size), 892-916
(extract_currency/identify_currency).

Everything here is a pure column expression (regexp chains + when
cascades) so Catalyst keeps it inside whole-stage codegen.  Documented
divergences:

* ``re_extract_price`` returns NULL (typed LongType) where the
  reference would return the raw matched *string* for a match that
  does not start with a digit (e.g. ``".5 m"``) — a mixed-type return
  is unrepresentable in a typed engine.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from .core import col_of, count_char, let_, rex, try_double, try_long


def clean_price_text(c: Column | str) -> Column:
    """Indonesian price-text normalizer (ref func.py:64-96).

    Slash→"per", rp/rupiah/nego/pertahun stripped, m2→meter,
    per-meter collapsed to "permeter", split on dash, trimmed.
    Replacement order matches the reference exactly (it matters:
    e.g. ``\\.00$``→",00" runs before m2→meter).
    """
    v = F.lower(col_of(c))
    steps = [
        (r"/", " per "),
        (r"\s+", " "),
        (r"per$|-$", ""),
        (r"^rp\.?", ""),
        (r"rupia$|rupiah|bersih", ""),
        (r"\.00$", ",00"),
        (r"m2", "meter"),
        (r"per m$", "permeter"),
        (r"per(.*?)meter", "permeter"),
        (r"juta(.*?)per(.*?)meter", "juta permeter"),
        (r"jjuta", "juta"),
        (r"mete$|meteer", "meter"),
        (r"per\s*tahun", "pertahun"),
        (r"pertahun", ""),
        (r"nego|neg$", ""),
        (r"_|\)|\(", ""),
    ]
    for pat, rep in steps:
        v = F.regexp_replace(v, pat, rep)
    return F.trim(F.substring_index(v, "-", 1))


def find_usd(c: Column | str) -> Column:
    """``USD 1,250,000`` → 1250000 (LongType, null if absent).

    Ref func.py:40-51: int() after comma strip, dot-strip fallback on
    ValueError — stripping both separators up front is equivalent
    (int() fails iff a dot survives, and the fallback strips dots).
    """
    raw = rex(c, r"(?i)USD\s*([0-9.,]+)", 1)
    return try_long(F.translate(raw, ".,", ""))


def find_idr(c: Column | str) -> Column:
    """``IDR 850.000.000`` → 850000000 (ref func.py:54-61)."""
    raw = rex(c, r"(?i)IDR\s*([0-9.,]+)", 1)
    return try_long(F.translate(raw, ".,", ""))


def fix_price(c: Column | str) -> Column:
    """Comma/dot disambiguation → DoubleType (ref func.py:99-112).

    1 comma + 1 dot ⇒ dot=thousands, comma=decimal; lone comma ⇒
    decimal; many commas ⇒ thousands; many dots ⇒ thousands.
    """
    def body(fp_in: Column) -> Column:
        dots = count_char(fp_in, ".")
        commas = count_char(fp_in, ",")
        t1 = F.when(
            (commas == 1) & (dots == 1),
            F.regexp_replace(F.regexp_replace(fp_in, r"\.", ""), ",", "."),
        ).otherwise(fp_in)
        t2 = let_(
            t1,
            lambda fp_a: F.when(commas == 1, F.regexp_replace(fp_a, ",", "."))
            .when(commas > 1, F.regexp_replace(fp_a, ",", ""))
            .otherwise(fp_a),
        )
        t3 = let_(
            t2,
            lambda fp_b: F.when(dots > 1, F.regexp_replace(fp_b, r"\.", "")).otherwise(
                fp_b
            ),
        )
        return try_double(rex(t3, r"[0-9.]+", 0))

    return let_(col_of(c), body)


def check_per_meter(c: Column | str) -> Column:
    """Is the price quoted per square meter? (ref func.py:115-122)."""
    return clean_price_text(c).rlike(r"per(.*?)meter")


def price_request_to_zero(c: Column | str, value: Column | str | None = None) -> Column:
    """"Price request" listings → "0" (ref func.py:266-269 returns int 0
    into a string pipeline; string "0" parses identically downstream
    and keeps the column typed)."""
    c = col_of(c)
    out = col_of(value) if value is not None else c
    return F.when(F.lower(c).contains("price request"), F.lit("0")).otherwise(out)


def re_extract_price(c: Column | str) -> Column:
    """Multi-pattern price miner with Indonesian unit multipliers
    (ref func.py:125-158): ``N m``→×1e9, ``juta/jt``→×1e6,
    ``ribu/rb``→×1e3, per-meter variants, 0 fallback.

    Branch order is semantic (first match wins), mirrored 1:1.
    """
    def body(t: Column) -> Column:
        def price_of(pattern: str, group: int, mult: float) -> Column:
            return let_(
                rex(t, pattern, group),
                lambda v: F.when(
                    v.isNotNull(), (fix_price(v) * F.lit(mult)).cast("long")
                ),
            )

        m_branch = let_(
            rex(t, r"[0-9.,]+\s*m", 0),
            # ref returns the raw string when the match doesn't start
            # with a digit; typed engine → NULL (module docstring).
            lambda w: F.when(
                w.isNotNull(),
                F.when(w.rlike(r"^\d"), (fix_price(w) * 1e9).cast("long")),
            ),
        )
        plain_branch = let_(
            rex(t, r"[0-9.,]+", 0),
            lambda w: F.when(
                w.isNotNull() & ~t.rlike("[a-z]"), fix_price(w).cast("long")
            ),
        )
        juta_branch = let_(
            rex(t, r"([0-9.,]+)\s*(juta|jt)$", 0),
            lambda w: F.when(w.rlike(r"^\d"), (fix_price(w) * 1e6).cast("long")),
        )
        # first non-null branch wins == reference's early returns;
        # coalesce keeps branch order without re-testing conditions.
        return F.coalesce(
            m_branch,
            plain_branch,
            juta_branch,
            price_of(r"([0-9.,]+)(.*?)ribu$", 1, 1e3),
            price_of(r"([0-9.,]+)\s*per\s*meter", 1, 1.0),
            price_of(r"([0-9.,]+)\s*(juta|jt)\s*per\s*meter", 1, 1e6),
            price_of(r"([0-9.,]+)\s*(ribu|rb)\s*per\s*meter", 1, 1e3),
            F.lit(0),
        )

    return let_(clean_price_text(c), body)


def grab_price(c: Column | str) -> Column:
    """Route a price string to (idr, usd) slots (ref func.py:385-393)."""
    low = F.lower(col_of(c))
    return F.struct(
        F.when(low.contains("idr"), low).alias("idr"),
        F.when(~low.contains("idr") & low.contains("usd"), low).alias("usd"),
    )


def identify_currency(c: Column | str) -> Column:
    """IDR/Rp tokens → 'IDR', USD → 'USD', else NULL (ref func.py:910-916)."""
    c = col_of(c)
    return (
        F.when(c.rlike(r"(?i)\bIDR\b|\bRp\b|\bIDR\d+"), F.lit("IDR"))
        .when(c.rlike(r"(?i)\bUSD\b|\bUSD\d+"), F.lit("USD"))
        .otherwise(F.lit(None).cast("string"))
    )


def extract_currency(c: Column | str) -> Column:
    """First currency token as written (ref func.py:892-907); falls back
    to the input when nothing matches (reference returns the text)."""
    c = col_of(c)
    tok = rex(c, r"(?i)\b(IDR)\b|\b(USD)\b|\b(Rp)\b|(IDR)\d+|(USD)\d+|\b(Rp)\s*\d+", 0)
    first_group = rex(c, r"(?i)\b(IDR)\b", 1)
    return F.coalesce(first_group, tok, c)


def recalculate_price_by_land_size(
    text: Column | str, price: Column | str, land_size: Column | str
) -> Column:
    """If the text quotes ``/are``, price × (land_size/100)
    (ref func.py:803-825; the /m2 branch is dead code there — only the
    are-branch ever produces a value, mirrored here).  NULL when the
    rule does not apply."""
    t, p, ls = col_of(text), col_of(price), col_of(land_size)
    return F.when(
        t.rlike(r"/\w*are") & (ls > 0),
        (p.cast("double") * ls.cast("double") / F.lit(100.0)),
    )
