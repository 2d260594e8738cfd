"""Value-equivalence tests for the serve-path pagination operators.

The plan-shape suite proves keyset pagination pushes its seek
predicate to the scan; this suite proves the part that actually
matters to a user switching from the reference's OFFSET endpoints:
walking keyset pages yields EXACTLY the offset pages, row for row,
including through runs of duplicate sort values where only the
(sort, key) tie-break keeps the walk stable.
"""

import random

from real_estate_etl_dev_spark.operators.analytics import (
    paginate_keyset,
    paginate_offset,
    top1_by_key,
)


def _frame(spark, n=537, dup_every=5, seed=7):
    rng = random.Random(seed)
    rows = [
        # duplicate sort values every few rows: tie-break territory
        (i, float(rng.randrange(0, n // dup_every)) * 1.5, f"k{i:04d}")
        for i in range(n)
    ]
    return spark.createDataFrame(rows, "row_id long, price double, url string")


def _walk_keyset(df, pages, page_size, descending):
    """Walk from page 1 using each page's last row as the next anchor."""
    out, anchor = [], (None, None)
    for _ in range(pages):
        page = paginate_keyset(
            df,
            "price",
            "url",
            last_sort_value=anchor[0],
            last_key_value=anchor[1],
            page_size=page_size,
            descending=descending,
        ).collect()
        out.append([(r["price"], r["url"]) for r in page])
        if not page:
            break
        anchor = (page[-1]["price"], page[-1]["url"])
    return out


def test_keyset_walk_equals_offset_pages(spark):
    df = _frame(spark)
    for descending in (True, False):
        keyset_pages = _walk_keyset(df, pages=4, page_size=50, descending=descending)
        for pageno, kp in enumerate(keyset_pages, start=1):
            op = paginate_offset(
                df, "price", "url", page=pageno, page_size=50, descending=descending
            ).collect()
            assert kp == [(r["price"], r["url"]) for r in op], (
                f"page {pageno} desc={descending} diverged"
            )


def test_keyset_walk_is_exhaustive_and_disjoint(spark):
    """Walking to the end visits every row exactly once."""
    df = _frame(spark, n=213)
    pages = _walk_keyset(df, pages=10, page_size=50, descending=True)
    flat = [r for p in pages for r in p]
    assert len(flat) == 213
    assert len(set(flat)) == 213


def test_top1_matches_full_sort_head(spark):
    df = _frame(spark)
    got = top1_by_key(df, "price", "url").collect()[0]
    want = sorted(
        ((r["price"], r["url"]) for r in df.collect()),
        key=lambda t: (-t[0], t[1]),
    )[0]
    assert (got["price"], got["url"]) == want
