"""URL / image-source utilities — SURVEY §2.8 F7, F9.

Reference semantics: ``/root/reference/reid/func.py`` 35-37
(get_domain), 182-184 (get_img_src), 255-259 (get_background_image),
627-640 (dimension_remover); ``api/func.py:4-9``.

Divergences (documented): the reference's ``get_domain`` pattern
``http[s]://`` hard-requires the 's' (plain http crashes it); we
accept both.  ``dimension_remover`` strips every ``-WxH`` attached to
an image extension (the reference str.replaces the first match's text
anywhere in the string — same result on real image URLs).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from .core import col_of, rex


def get_domain(c: Column | str) -> Column:
    """Host part of a URL (ref func.py:35-37)."""
    return rex(c, r"https?://(.*?)/", 1)


def get_img_src(c: Column | str) -> Column:
    """URL inside the first parenthesis pair — css ``url(...)``
    (ref func.py:182-184)."""
    return rex(c, r"\((.*?)\)", 1)


def get_background_image(c: Column | str) -> Column:
    """``background-image:url(SRC);`` → SRC, else passthrough
    (ref func.py:255-259)."""
    c = col_of(c)
    return F.coalesce(rex(c, r"background\-image\:url\((.*)\)\;", 1), c)


def dimension_remover(c: Column | str) -> Column:
    """Strip ``-640x480`` style suffixes before image extensions
    (ref func.py:627-640)."""
    return F.regexp_replace(
        col_of(c), r"-\d+x\d+(\.jpg|\.jpeg|\.png|\.webp)", "$1"
    )
