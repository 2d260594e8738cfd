"""Date mining / normalization — SURVEY §2.8 F13, F14, F27, F33, F35.

Reference semantics: ``/root/reference/reid/func.py`` 224-252
(get_uploaded_date), 272-285 (time_ago_to_datetime), 643-648
(find_published_date), 884-889 (first_month);
``models/listing.py:177-180`` (epoch millis export).

All pure column expressions.  The reference's ``datetime.now()``
dependencies take an explicit ``run_date``/``current_date`` argument
(SURVEY §7.4 determinism).  Divergence: the reference's
``first_month`` crashes in January (``month=0``); ``add_months``
rolls over correctly here.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from .core import col_of, rex


def _candidate(y: Column, m: Column, d: Column) -> Column:
    """Validated yyyy-mm-dd triple → 'MM/dd/yy', NULL when invalid.
    Month>12 swaps month/day (US-vs-ISO fixup, ref func.py:242-246);
    try_to_timestamp nulls out what datetime() would raise on."""
    mi, di = m.try_cast("int"), d.try_cast("int")
    mi2 = F.when(mi > 12, di).otherwise(mi)
    di2 = F.when(mi > 12, mi).otherwise(di)
    ts = F.try_to_timestamp(
        F.concat_ws("-", y, mi2.cast("string"), di2.cast("string")),
        F.lit("yyyy-M-d"),
    )
    return F.when(y.rlike(r"^20\d{2}$"), F.date_format(ts, "MM/dd/yy"))


def get_uploaded_date(c: Column | str) -> Column:
    """Mine an upload date out of an image URL: ``YYYY-MM-DD``,
    ``YYYYMMDD``, or ``/YYYY/MM/`` (day := 01); first pattern that
    survives validation wins (ref func.py:224-252)."""
    c = col_of(c)
    p1 = r"(\d{4})-(\d{2})-(\d{2})"
    p2 = r"(\d{4})(\d{2})(\d{2})"
    p3 = r"(\d{4})/(\d{2})/"
    return F.coalesce(
        _candidate(rex(c, p1, 1), rex(c, p1, 2), rex(c, p1, 3)),
        _candidate(rex(c, p2, 1), rex(c, p2, 2), rex(c, p2, 3)),
        _candidate(rex(c, p3, 1), rex(c, p3, 2), F.lit("01")),
    )


def time_ago_to_datetime(c: Column | str, run_date: Column | str) -> Column:
    """"N years/months/weeks/days ago" → 'MM/dd/yy' relative to
    ``run_date``; passthrough when no unit matches (ref func.py:272-285;
    year=365d, month=30d, week=7d — same coarse arithmetic)."""
    c = col_of(c)
    base = F.to_date(col_of(run_date) if not isinstance(run_date, str) else F.lit(run_date))
    n = rex(c, r"[0-9.]+", 0).try_cast("double")
    days = (
        F.when(c.contains("year"), n * 365)
        .when(c.contains("month"), n * 30)
        .when(c.contains("week"), n * 7)
        .when(c.contains("day"), n)
    )
    shifted = F.date_sub(base, days.cast("int"))
    return F.when(days.isNotNull(), F.date_format(shifted, "MM/dd/yy")).otherwise(c)


def find_published_date(c: Column | str) -> Column:
    """JSON-LD ``"datePublished":"ISO"`` → 'MM/dd/yy'; '' when absent
    (ref func.py:643-648 — wall-clock date as written, offset ignored)."""
    iso = rex(c, r"\"datePublished\":\"([T0-9\-\:\+]+)\"", 1)
    d = F.try_to_timestamp(F.substring(iso, 1, 10), F.lit("yyyy-MM-dd"))
    return F.coalesce(F.date_format(d, "MM/dd/yy"), F.lit(""))


def first_month(run_date: Column | str) -> Column:
    """First day of the month before ``run_date`` as 'yyyy-MM-dd' —
    the scraped_at/sold_at watermark (ref func.py:884-889)."""
    base = col_of(run_date) if not isinstance(run_date, str) else F.lit(run_date)
    return F.date_format(
        F.add_months(F.date_trunc("month", F.to_date(base)), -1), "yyyy-MM-dd"
    )


def epoch_millis(ts: Column | str) -> Column:
    """Timestamp → epoch milliseconds for the export projection
    (ref models/listing.py:177-180).  True integral division (`DIV`,
    like readers.py does for nanos): Column `/` is double division,
    exact for micros only below 2^53 (~year 2255) — ADVICE r02."""
    return F.call_function("div", F.unix_micros(col_of(ts)), F.lit(1000))


def to_mmddyy(c: Column | str, input_fmt: str = "yyyy-MM-dd") -> Column:
    """Date-string reformat helper (ref reid/customs/balipropertiesforsale.py:4-6)."""
    return F.date_format(F.try_to_timestamp(col_of(c), F.lit(input_fmt)), "MM/dd/yy")
