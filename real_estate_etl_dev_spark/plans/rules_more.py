"""Catalog queries for the remaining row-rule operators — SURVEY
§2.10 R8 (imputation cascades), R9 (availability consistency),
R10+F35 (export projection), R12 (error-clear on success), and
§2.2 P14 (conditional skip routing).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .. import functions as fx
from ..operators.projection import split_skip
from ..operators.rules import availability_consistency, export_projection
from ..sources.readers import load_table
from .catalog import query
from .fixtures import listing_fixture
from .merging import CUR_COLS, CUR_FILTER, K, _cte

# Goldens for the description-mined fallbacks per DESCS case
# (traced through the reference extractors; see tests/test_functions.py).
_BED_DESC = [None, None, 3, 4, None, None]
_LAND_DESC = [500.0, 450.0, 180.0, 1250.0, None, 200.0]


@query(
    "imputation_cascade_cases",
    f"""
    SELECT o_orderkey AS key,
           CAST(COALESCE(
             CASE WHEN o_orderkey % 3 = 0 THEN NULL ELSE CAST(o_orderkey % 5 + 1 AS DOUBLE) END,
             CASE (o_orderkey % 6) {" ".join(f"WHEN {i} THEN {v if v is not None else 'NULL'}" for i, v in enumerate(_BED_DESC))} END
           ) AS DOUBLE) AS bedrooms,
           CAST(
             CASE WHEN (CASE WHEN o_orderkey % 4 = 0 THEN NULL ELSE CAST((o_orderkey % 11) * 50 AS DOUBLE) END) IS NOT NULL
                  THEN (CASE WHEN o_orderkey % 4 = 0 THEN NULL ELSE CAST((o_orderkey % 11) * 50 AS DOUBLE) END)
                  ELSE (CASE (o_orderkey % 6) {" ".join(f"WHEN {i} THEN {v if v is not None else 'NULL'}" for i, v in enumerate(_LAND_DESC))} END)
             END AS DOUBLE) AS land_size,
           CASE WHEN (o_orderkey % 6) IN (0, 2) THEN 'Leasehold' ELSE 'Freehold' END AS contract_type,
           CAST(
             CASE WHEN CAST((o_orderkey % 9) * 30 AS DOUBLE) >
                       COALESCE(
                         CASE WHEN o_orderkey % 4 = 0 THEN NULL ELSE CAST((o_orderkey % 11) * 50 AS DOUBLE) END,
                         CASE (o_orderkey % 6) {" ".join(f"WHEN {i} THEN {v if v is not None else 'NULL'}" for i, v in enumerate(_LAND_DESC))} END,
                         CAST(0 AS DOUBLE))
                  THEN NULL ELSE CAST((o_orderkey % 9) * 30 AS DOUBLE) END AS DOUBLE) AS build_size
    FROM orders ORDER BY key
    """,
    survey="R8",
)
def imputation_cascade_cases(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R8: fill bedrooms/land_size from the description when the
    selector came up empty (coalesce(primary, mined)), infer the
    contract type from the prose, and gate build_size by the
    build≤land sanity rule (ref reid/spiders/lazudi.py:147-174,
    dotproperty.py:143-180, kibarer.py:143-152)."""
    d = listing_fixture(spark, sf_dir)
    k = F.col("key")
    explicit_bed = F.when(k % 3 != 0, (k % 5 + 1).cast("double"))
    explicit_land = F.when(k % 4 != 0, ((k % 11) * 50).cast("double"))
    raw_build = ((k % 9) * 30).cast("double")

    bedrooms = F.coalesce(explicit_bed, fx.find_bedrooms("description").cast("double"))
    land = F.coalesce(explicit_land, fx.find_land_size("description"))
    contract = fx.get_contract_type("description")
    # sanity gate: a build size larger than the (imputed) land size is
    # discarded rather than trusted
    build = F.when(
        raw_build > F.coalesce(land, F.lit(0.0)), F.lit(None).cast("double")
    ).otherwise(raw_build)
    return d.select(
        "key",
        bedrooms.alias("bedrooms"),
        land.alias("land_size"),
        contract.alias("contract_type"),
        build.alias("build_size"),
    ).orderBy("key")


@query(
    "availability_consistency_cases",
    f"""
    SELECT o_orderkey AS key,
           CASE WHEN (CASE {K} % 4 WHEN 1 THEN TIMESTAMP '2025-06-01 00:00:00' END) IS NOT NULL
                 AND (CASE {K} % 3 WHEN 0 THEN 'Sold' WHEN 1 THEN 'Available' ELSE 'Delisted' END) NOT IN ('Sold','Delisted')
                THEN 'Sold'
                ELSE (CASE {K} % 3 WHEN 0 THEN 'Sold' WHEN 1 THEN 'Available' ELSE 'Delisted' END) END AS availability,
           strftime(
             CASE WHEN (CASE {K} % 3 WHEN 0 THEN 'Sold' WHEN 1 THEN 'Available' ELSE 'Delisted' END) = 'Sold'
                   AND (CASE {K} % 4 WHEN 1 THEN TIMESTAMP '2025-06-01 00:00:00' END) IS NULL
                  THEN TIMESTAMP '2026-01-31 00:00:00'
                  WHEN (CASE {K} % 3 WHEN 0 THEN 'Sold' WHEN 1 THEN 'Available' ELSE 'Delisted' END) = 'Available'
                  THEN NULL
                  ELSE (CASE {K} % 4 WHEN 1 THEN TIMESTAMP '2025-06-01 00:00:00' END) END,
             '%Y-%m-%d %H:%M:%S') AS sold_at,
           CAST(({K} % 5) = 0 AS BOOLEAN) AS is_excluded
    FROM orders ORDER BY key
    """,
    survey="R9",
)
def availability_consistency_cases(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R9: the availability/sold_at invariant normalizer — Sold needs
    a date (stamped), Available clears it, a set date forces Sold,
    excluded_by drives is_excluded
    (ref api/routers/tag_routes.py:159-189,212-236)."""
    orders = load_table(spark, sf_dir, "orders")
    k = F.col("o_orderkey")
    av = (
        F.when(k % 3 == 0, "Sold").when(k % 3 == 1, "Available").otherwise("Delisted")
    )
    sa = F.when(k % 4 == 1, F.lit("2025-06-01 00:00:00").cast("timestamp"))
    ex = F.when(k % 5 == 0, F.lit("manual-review"))
    norm = availability_consistency(av, sa, ex, run_ts="2026-01-31 00:00:00")
    return (
        orders.select(k.alias("key"), norm.alias("norm"))
        .select(
            "key",
            F.col("norm.availability").alias("availability"),
            F.date_format(F.col("norm.sold_at"), "yyyy-MM-dd HH:mm:ss").alias("sold_at"),
            F.col("norm.is_excluded").alias("is_excluded"),
        )
        .orderBy("key")
    )


@query(
    "listing_export_projection",
    f"""
    WITH {_cte("cur", CUR_COLS, CUR_FILTER)},
         base AS (
           SELECT c.*, CAST(substring(c.url, 2) AS BIGINT) AS k FROM cur c
         )
    SELECT url AS property_link,
           'src' || (k % 3) AS source_a,
           property_id AS id,
           CASE WHEN currency = 'IDR' THEN price END AS price_idr,
           CASE WHEN currency = 'USD' THEN price END AS price_usd,
           CASE WHEN k % 12 = 7 THEN 'Sold' ELSE 'Available' END AS availability,
           CASE WHEN k % 12 = 7 THEN 'Delisted' END AS site_status,
           CAST(epoch_ms(CASE WHEN k % 12 = 7 THEN TIMESTAMP '2026-01-01 00:00:00' END) AS BIGINT) AS sold_date_ms,
           CASE WHEN is_off_plan THEN 'Yes' ELSE 'No' END AS off_plan
    FROM base ORDER BY property_link
    """,
    survey="R10,F35",
)
def listing_export_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R10 + F35: the wide spreadsheet export — currency routes the
    price to its column, Delisted rows display as Sold with
    site_status retained, dates go out as epoch millis
    (ref models/listing.py:175-241 to_dict)."""
    from .merging import current_fixture

    cur = current_fixture(spark, sf_dir)
    k = F.expr("CAST(substring(url, 2) AS BIGINT)")
    enriched = (
        cur.withColumn("source", F.concat(F.lit("src"), (k % 3).cast("string")))
        .withColumn(
            "availability",
            F.when(k % 12 == 7, "Delisted").otherwise(F.col("availability")),
        )
        .withColumn(
            "sold_at",
            F.when(k % 12 == 7, F.lit("2026-01-01 00:00:00").cast("timestamp")),
        )
        .withColumn("reid_id", F.lit(None).cast("string"))
        .withColumn("region", F.lit(None).cast("string"))
        .withColumn("scraped_at", F.lit(None).cast("timestamp"))
        .withColumn("title", F.lit(None).cast("string"))
    )
    wide = export_projection(enriched)
    return wide.select(
        "property_link",
        "source_a",
        "id",
        "price_idr",
        "price_usd",
        "availability",
        "site_status",
        "sold_date_ms",
        "off_plan",
    ).orderBy("property_link")


@query(
    "error_clear_on_success",
    """
    WITH errors AS (
      SELECT DISTINCT 'u' || user_id AS url, substring(props, 1, 12) AS error_message
      FROM events WHERE event_type = 'error'
    ),
    succeeded AS (
      SELECT DISTINCT 'u' || user_id AS url FROM events WHERE event_type = 'purchase' AND user_id % 3 = 0
    )
    SELECT e.url, e.error_message FROM errors e
    WHERE NOT EXISTS (SELECT 1 FROM succeeded s WHERE s.url = e.url)
    ORDER BY url, error_message
    """,
    survey="R12",
)
def error_clear_on_success(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R12: a successful item clears its recorded errors — set-based
    anti-join of the error table against succeeded urls, instead of a
    DELETE per item (ref reid/pipelines/property.py:48-52,
    spiders/base.py:26-29)."""
    ev = load_table(spark, sf_dir, "events")
    url = F.concat(F.lit("u"), F.col("user_id").cast("string")).alias("url")
    errors = (
        ev.filter(F.col("event_type") == "error")
        .select(url, F.substring("props", 1, 12).alias("error_message"))
        .distinct()
    )
    succeeded = (
        ev.filter((F.col("event_type") == "purchase") & (F.col("user_id") % 3 == 0))
        .select(url)
        .distinct()
    )
    return errors.join(succeeded, "url", "left_anti").orderBy("url", "error_message")


@query(
    "skip_routing_counts",
    f"""
    SELECT CAST(sum(CASE WHEN {K} % 10 = 0 THEN 0 ELSE 1 END) AS BIGINT) AS n_active,
           CAST(sum(CASE WHEN {K} % 10 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_skipped
    FROM orders
    """,
    survey="P14",
)
def skip_routing_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P14: conditional skip/short-circuit — flagged rows bypass the
    pipeline via a lazy filter split (ref pipelines/property.py:24-25,
    96-98 pass skip items through untouched)."""
    orders = load_table(spark, sf_dir, "orders").withColumn(
        "skip", F.col("o_orderkey") % 10 == 0
    )
    active, skipped = split_skip(orders)
    return active.agg(F.count(F.lit(1)).cast("long").alias("n_active")).crossJoin(
        skipped.agg(F.count(F.lit(1)).cast("long").alias("n_skipped"))
    )
