"""Catalog queries for the OLAP reshaping families: pivot, unpivot,
and hierarchical rollup — standard serve-path shapes (the reference's
dashboard tables pivot report rows client-side, e.g.
dashboard/components/report-table.jsx; here the engine does it).

All three are exactly SQL-expressible, so the oracles are full
independent implementations (DuckDB conditional aggregation / UNPIVOT
/ ROLLUP).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .catalog import query, T

_STATUSES = ["F", "O", "P"]


@query(
    "order_status_pivot",
    f"""
    SELECT o_orderpriority,
           {", ".join(f"count(*) FILTER (WHERE o_orderstatus = '{s}') AS status_{s}" for s in _STATUSES)}
    FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
    survey="A-pivot",
    tags=("olap",),
)
def order_status_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot: order counts as one column per status.  The pivot values
    are DECLARED (not discovered), so the plan is a single hash-agg
    with conditional counts — no extra values-discovery job, which is
    the difference between one pass and two at 100 TB."""
    orders = T(spark, sf_dir, "orders")
    out = (
        orders.groupBy("o_orderpriority")
        .pivot("o_orderstatus", _STATUSES)
        .agg(F.count(F.lit(1)))
        .na.fill(0, [s for s in _STATUSES])
    )
    return out.select(
        "o_orderpriority",
        *[F.col(s).alias(f"status_{s}") for s in _STATUSES],
    ).orderBy("o_orderpriority")


@query(
    "order_status_unpivot",
    f"""
    WITH wide AS (
      SELECT o_orderpriority,
             {", ".join(f"count(*) FILTER (WHERE o_orderstatus = '{s}') AS status_{s}" for s in _STATUSES)}
      FROM orders GROUP BY o_orderpriority
    )
    SELECT o_orderpriority, status, n
    FROM wide UNPIVOT (n FOR status IN ({", ".join(f"status_{s}" for s in _STATUSES)}))
    ORDER BY o_orderpriority, status
    """,
    survey="A-unpivot",
    tags=("olap",),
)
def order_status_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot (melt): the wide pivot back to (priority, status, n)
    rows via ``unpivot`` — a zero-shuffle projection (each input row
    expands in place), so it composes freely after any aggregate."""
    wide = order_status_pivot(spark, sf_dir)
    return (
        wide.unpivot(
            "o_orderpriority",
            [f"status_{s}" for s in _STATUSES],
            "status",
            "n",
        )
        .orderBy("o_orderpriority", "status")
    )


@query(
    "revenue_rollup_status_priority",
    """
    SELECT COALESCE(o_orderstatus, 'ALL') AS status,
           COALESCE(o_orderpriority, 'ALL') AS priority,
           CAST(GROUPING(o_orderstatus) + GROUPING(o_orderpriority) AS BIGINT)
             AS agg_level,
           count(*) AS n_orders,
           round(sum(o_totalprice), 2) AS revenue
    FROM orders
    GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
    ORDER BY agg_level, status, priority
    """,
    survey="A-rollup",
    tags=("olap",),
)
def revenue_rollup_status_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical rollup: (status, priority) → status subtotals →
    grand total in ONE pass — Spark expands grouping sets map-side, so
    the three levels cost one shuffle, not three scans (the
    dashboard's subtotal rows without re-querying).  ``grouping()``
    disambiguates real NULL keys from subtotal rows."""
    orders = T(spark, sf_dir, "orders")
    lvl = (
        F.grouping("o_orderstatus") + F.grouping("o_orderpriority")
    ).cast("long")
    return (
        orders.rollup("o_orderstatus", "o_orderpriority")
        .agg(
            lvl.alias("agg_level"),
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("revenue"),
        )
        .select(
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("status"),
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("priority"),
            "agg_level",
            "n_orders",
            "revenue",
        )
        .orderBy("agg_level", "status", "priority")
    )


@query(
    "revenue_grouping_sets",
    """
    SELECT o_orderstatus, o_orderpriority,
           CAST(GROUPING(o_orderstatus, o_orderpriority) AS BIGINT) AS grp_id,
           CAST(count(*) AS BIGINT) AS n_orders,
           round(sum(o_totalprice), 2) AS revenue
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
    ORDER BY grp_id, o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST
    """,
    survey="A-groupingsets",
    tags=("olap",),
)
def revenue_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPING SETS — the general form rollup/cube specialize: three
    independent aggregation grains (by status, by priority, grand
    total) in ONE pass over the fact table, disambiguated by
    ``grouping_id`` (the null-vs-aggregated marker rollup consumers
    need; bit order follows the listed group-by columns and matches
    DuckDB's ``GROUPING()``).

    Scale: Catalyst plans grouping sets as a single Expand + hash
    aggregate — the fact table is scanned ONCE and expanded ×|sets|
    with map-side partial aggregation, vs |sets| separate scans if the
    grains ran as separate queries; the shuffle carries only the
    per-grain group cardinalities."""
    orders = T(spark, sf_dir, "orders")
    return (
        orders.groupingSets(
            [["o_orderstatus"], ["o_orderpriority"], []],
            "o_orderstatus",
            "o_orderpriority",
        )
        .agg(
            F.grouping_id().cast("long").alias("grp_id"),
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("revenue"),
        )
        .select("o_orderstatus", "o_orderpriority", "grp_id", "n_orders", "revenue")
        .orderBy(
            "grp_id",
            F.col("o_orderstatus").asc_nulls_first(),
            F.col("o_orderpriority").asc_nulls_first(),
        )
    )


# Catalog row RETIRED r14 (pre-agreed replacement plan, COVERAGE.md
# "r14 arithmetic"): the seat went to `corpus_curation_funnel`.  The
# operator itself stays — CUBE is grouping-sets' superset sugar and
# the OLAP multi-grain family remains certified via
# `revenue_grouping_sets` (same Expand+agg plan, arbitrary grains);
# this function is still importable and covered by the same pytest
# harness style as any non-catalog helper.  Last driver green: r10
# (CORRECTNESS_r10, 24/24 rows hash-matched).  Former oracle:
#   SELECT COALESCE(o_orderstatus,'ALL') status, COALESCE(o_orderpriority,'ALL')
#   priority, GROUPING(...) grp_id, count(*), round(sum(decimal price),2)
#   FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
def revenue_cube_status_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE — all four grains of the (status, priority) pair (detail,
    each one-dimension margin, grand total) in ONE pass, completing
    the multi-grain family next to rollup (hierarchical prefixes) and
    grouping sets (arbitrary grains).  ``grouping_id`` separates a
    real NULL key from a margin row.

    Scale: same single Expand + hash-agg plan as the other grains —
    one fact scan expanded ×4 with map-side partials; the shuffle
    carries per-grain group cardinalities (≤ 5·5 + 5 + 5 + 1 rows
    here), never fact rows."""
    orders = T(spark, sf_dir, "orders")
    return (
        orders.cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.grouping_id().cast("long").alias("grp_id"),
            F.count(F.lit(1)).alias("n_orders"),
            # exact-decimal sum (house rule): a raw double sum's last
            # digits depend on partial-agg order and can flip the 2-dp
            # rounding across engines on the wide grand-total groups
            F.round(
                F.sum(F.col("o_totalprice").cast("decimal(20,8)")).cast("double"), 2
            ).alias("revenue"),
        )
        .select(
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("status"),
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("priority"),
            "grp_id",
            "n_orders",
            "revenue",
        )
        .orderBy("grp_id", "status", "priority")
    )
