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


def test_q2_min_cost_ties_all_surface(spark, tmp_path):
    """The fixture has no per-part supply-cost ties, so the Q2
    contract the spec cares about — ALL suppliers at a part's
    regional minimum surface, not an arbitrary one — is pinned on a
    planted fixture: suppkeys 4 and 1004 of part 10 derive IDENTICAL
    supply costs (the cost formula is mod-1000 in 13·suppkey, and
    13·1000 ≡ 0), while suppkey 5 derives a higher one; the tied
    minimum pair must both emit and the loser must not."""
    from real_estate_etl_dev_spark.plans.catalog import CATALOG
    from pyspark.sql import functions as F

    d = str(tmp_path)
    # derived cost = 1 + (partkey*7 + suppkey*13) % 1000; for
    # partkey=10, suppkeys 4 and 1004 give identical costs (13*1000
    # ≡ 0 mod 1000); suppkey 5 gets a different (higher or lower)
    # cost — the min pair must BOTH surface whatever it is.
    spark.createDataFrame(
        [(10, "blue rod", "Brand#1", 15, "LARGE", 1.0)],
        "p_partkey long, p_name string, p_brand string, p_size int,"
        " p_type string, p_retailprice double",
    ).write.parquet(f"{d}/part.parquet")
    spark.createDataFrame(
        [(4, "S4", 0, 10.0), (1004, "S1004", 0, 20.0), (5, "S5", 0, 30.0)],
        "s_suppkey long, s_name string, s_nationkey int, s_acctbal double",
    ).write.parquet(f"{d}/supplier.parquet")
    spark.createDataFrame(
        [(0, "NATION_0", 0)], "n_nationkey int, n_name string, n_regionkey int"
    ).write.parquet(f"{d}/nation.parquet")
    spark.createDataFrame(
        [(0, "EUROPE")], "r_regionkey int, r_name string"
    ).write.parquet(f"{d}/region.parquet")
    li_rows = [
        (1, 10, 4, 1, 1.0, 1.0, 0.0, 0.0, "N", "O", "1995-01-01"),
        (2, 10, 1004, 1, 1.0, 1.0, 0.0, 0.0, "N", "O", "1995-01-01"),
        (3, 10, 5, 1, 1.0, 1.0, 0.0, 0.0, "N", "O", "1995-01-01"),
    ]
    spark.createDataFrame(
        li_rows,
        "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber int,"
        " l_quantity double, l_extendedprice double, l_discount double,"
        " l_tax double, l_returnflag string, l_linestatus string, l_ship string",
    ).withColumn("l_shipdate", F.col("l_ship").cast("timestamp")).drop(
        "l_ship"
    ).write.parquet(f"{d}/lineitem.parquet")

    out = CATALOG["min_cost_supplier_q2"].fn(spark, d).collect()
    # cost(4) == cost(1004) = 1 + (70 + 52) % 1000 = 123;
    # cost(5) = 1 + (70 + 65) % 1000 = 136 — so the tied pair IS the min.
    names = sorted(r["s_name"] for r in out)
    assert names == ["S1004", "S4"], out
    assert all(r["supplycost"] == 123.0 for r in out)
