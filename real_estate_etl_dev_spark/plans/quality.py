"""Catalog queries for the data-quality rule operators — SURVEY §2.10
R2 (identify_issues), R3 (land zoning), R11 (missing-fields audit),
plus E4 (array_distinct label uniquify, exercised by the issues array).

Same fixture strategy as ``merging.py``: inputs built from ``orders``
via dialect-portable SQL snippets; the oracle re-implements each rule
in SQL independently (R2/R11) or maps golden cases (R3 — goldens
traced through models/property.py:155-194).

Scale: scan → project → explode; no shuffles beyond the output sort.
The reference runs these rules per-row in Python with a DB round-trip
per tag (models/property.py:122-138); here the rule battery is one
array expression and tags are an exploded column.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.rules import define_land_zoning, identify_issues, missing_fields_audit
from ..sources.readers import load_table
from .catalog import query

K = "o_orderkey"

QUAL_COLS: dict[str, str] = {
    "url": f"'u' || {K}",
    "bedrooms": f"CASE {K} % 11 WHEN 10 THEN CAST(14 AS DOUBLE) ELSE CAST({K} % 6 AS DOUBLE) END",
    "price": f"({K} % 7) * 100000",
    "title": f"CASE {K} % 4 WHEN 0 THEN NULL WHEN 1 THEN 'N/A' ELSE 'T' || {K} END",
    "description": f"CASE {K} % 5 WHEN 0 THEN '' ELSE 'd' || {K} END",
    "location": f"CASE {K} % 3 WHEN 0 THEN NULL ELSE 'L' || ({K} % 3) END",
    "build_size": f"CAST(({K} % 9) * 10 AS DOUBLE)",
    "land_size": f"CAST(({K} % 4) * 20 AS DOUBLE)",
    "contract_type": (
        f"CASE {K} % 5 WHEN 0 THEN 'Leasehold' WHEN 1 THEN 'Rental' "
        f"WHEN 2 THEN 'Rent-to-own' ELSE 'Freehold' END"
    ),
    "leasehold_years": f"CASE {K} % 2 WHEN 0 THEN NULL ELSE CAST({K} % 30 AS DOUBLE) END",
    "availability": f"CASE {K} % 6 WHEN 1 THEN 'Sold' WHEN 3 THEN 'Delisted' ELSE 'Available' END",
    "property_type": (
        f"CASE {K} % 5 WHEN 0 THEN 'Villa' WHEN 1 THEN 'Land' WHEN 2 THEN 'House' "
        f"WHEN 3 THEN 'Penthouse' ELSE NULL END"
    ),
    "land_zoning": f"CASE {K} % 2 WHEN 0 THEN 'Residential' ELSE NULL END",
}


def _quality_fixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return orders.selectExpr(
        *[f"({expr}) AS {name}" for name, expr in QUAL_COLS.items()]
    )


def _qual_cte() -> str:
    sels = ", ".join(f"({expr}) AS {col}" for col, expr in QUAL_COLS.items())
    return f"q AS (SELECT {sels} FROM orders)"


# Independent SQL re-derivation of the 13 rules
# (models/property.py:70-119; Python truthiness spelled out).
_ISSUE_CONDS: list[tuple[str, str]] = [
    ("(bedrooms IS NOT NULL AND bedrooms <> 0 AND bedrooms >= 13)", "has_more_than_13_bedrooms"),
    (
        "((bedrooms IS NULL OR bedrooms = 0) AND (property_type IS NULL OR property_type <> 'Land'))",
        "no_bedrooms",
    ),
    ("(price = 0)", "no_price"),
    ("(title IS NULL OR title = '' OR title = 'N/A')", "no_title"),
    ("(description IS NULL OR description = '')", "no_description"),
    ("(location IS NULL OR location = '')", "no_location"),
    (
        "(build_size IS NOT NULL AND build_size <> 0 AND land_size IS NOT NULL "
        "AND land_size <> 0 AND build_size > land_size)",
        "build_size_greater_than_land_size",
    ),
    (
        "(contract_type = 'Leasehold' AND (leasehold_years IS NULL OR leasehold_years = 0))",
        "no_leasehold_years",
    ),
    ("(availability IS NULL OR availability <> 'Available')", "not_available"),
    (
        "(property_type IS NULL OR property_type NOT IN "
        "('Villa','House','Land','Apartment','Hotel','Townhouse','Commercial','Loft'))",
        "unknown_property_type",
    ),
    (
        "(property_type = 'Land' AND bedrooms IS NOT NULL AND bedrooms <> 0 AND bedrooms > 0)",
        "land_with_bedrooms",
    ),
    (
        "(contract_type IS NULL OR contract_type NOT IN ('Freehold','Leasehold','Rental'))",
        "unknown_contract_type",
    ),
    (
        "(property_type = 'Land' AND (land_zoning IS NULL OR land_zoning = ''))",
        "no_land_zoning",
    ),
]


@query(
    "dq_identify_issues",
    f"""
    WITH {_qual_cte()}
    SELECT * FROM (
      {" UNION ALL ".join(f"SELECT url, '{label}' AS issue FROM q WHERE {cond}" for cond, label in _ISSUE_CONDS)}
    ) ORDER BY url, issue
    """,
    survey="R2,E4",
)
def dq_identify_issues(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R2: the 13-rule DQ battery as one array expression, exploded to
    (url, issue) tag rows (ref models/property.py:70-138 runs per-row
    Python + one DB merge per tag)."""
    d = _quality_fixture(spark, sf_dir)
    issues = identify_issues(
        bedrooms="bedrooms",
        price="price",
        title="title",
        description="description",
        location="location",
        build_size="build_size",
        land_size="land_size",
        contract_type="contract_type",
        leasehold_years="leasehold_years",
        availability="availability",
        property_type="property_type",
        land_zoning="land_zoning",
    )
    return (
        d.select("url", F.explode(issues).alias("issue"))
        .orderBy("url", "issue")
    )


ZONING_DESCS = [
    "Nice land.\nzoning: yellow area",
    "Plot.\nZoning is red commercial",
    "zoning: tourism area permitted",
    "No zone info here",
    "Great view.\nzoning: dark green protected",
]
# Goldens traced through models/property.py:155-194 — note case 4:
# the color map iterates insertion order, so "dark green" text hits
# "green" first → Agricultural (reference quirk preserved).
ZONING_GOLDENS = ["Residential", "Commercial", "Tourism", None, "Agricultural"]


@query(
    "land_zoning_cases",
    f"""
    SELECT {K} AS key,
           CASE WHEN {K} % 2 = 1 THEN NULL ELSE
             CASE {K} % 5
               {" ".join(f"WHEN {i} THEN " + ("NULL" if g is None else f"'{g}'") for i, g in enumerate(ZONING_GOLDENS))}
             END
           END AS zoning
    FROM orders ORDER BY key
    """,
    survey="R3",
)
def land_zoning_cases(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R3: zoning classification from description sentences — Land
    rows only, color map before category map
    (ref models/property.py:155-194, reid/settings.py:145-160)."""
    orders = load_table(spark, sf_dir, "orders")
    from .fixtures import pick

    k = F.col(f"{K}")
    d = orders.select(
        k.alias("key"),
        pick(k, ZONING_DESCS).alias("description"),
        F.when(k % 2 == 0, "Land").otherwise("Villa").alias("property_type"),
    )
    return d.select(
        "key", define_land_zoning("property_type", "description").alias("zoning")
    ).orderBy("key")


AUDIT_COLS: dict[str, str] = {
    "url": f"'u' || {K}",
    "property_id": f"CASE {K} % 6 WHEN 0 THEN NULL ELSE 'P' || {K} END",
    "listed_date": f"CASE {K} % 7 WHEN 0 THEN NULL ELSE '2024-01-15' END",
    "title": f"CASE {K} % 4 WHEN 0 THEN NULL ELSE 'T' || {K} END",
    "location": f"CASE {K} % 3 WHEN 0 THEN '' ELSE 'L' || ({K} % 3) END",
    "contract_type": f"CASE {K} % 5 WHEN 0 THEN 'Leasehold' WHEN 1 THEN 'Lease to own' ELSE 'Freehold' END",
    "property_type": f"CASE {K} % 5 WHEN 4 THEN NULL ELSE 'Villa' END",
    "leasehold_years": f"CASE {K} % 2 WHEN 0 THEN NULL ELSE CAST({K} % 30 AS DOUBLE) END",
    "longitude": f"CASE {K} % 8 WHEN 0 THEN NULL ELSE CAST({K} AS DOUBLE) / 1000 END",
    "latitude": f"CASE {K} % 9 WHEN 0 THEN NULL ELSE CAST({K} AS DOUBLE) / 2000 END",
    "bedrooms": f"CAST({K} % 6 AS DOUBLE)",
    "bathrooms": f"CAST({K} % 4 AS DOUBLE)",
    "land_size": f"CAST(({K} % 11) * 10 AS DOUBLE)",
    "build_size": f"CASE {K} % 10 WHEN 0 THEN NULL ELSE CAST(({K} % 9) * 10 AS DOUBLE) END",
    "price": f"({K} % 7) * 100000",
    "currency": f"CASE {K} % 2 WHEN 0 THEN 'IDR' ELSE 'USD' END",
    "image_url": f"CASE {K} % 3 WHEN 0 THEN '' ELSE 'img' || ({K} % 3) END",
    "availability_label": f"CASE {K} % 6 WHEN 1 THEN 'Sold' WHEN 3 THEN 'Delisted' ELSE 'Available' END",
    "sold_at": f"CASE {K} % 6 WHEN 1 THEN '2025-06-01' ELSE NULL END",
    "description": f"CASE {K} % 5 WHEN 0 THEN '' ELSE 'd' || {K} END",
    "is_off_plan": f"({K} % 4) = 0",
}


def _audit_cte() -> str:
    sels = ", ".join(f"({expr}) AS {col}" for col, expr in AUDIT_COLS.items())
    return f"a AS (SELECT {sels} FROM orders)"


def _audit_oracle() -> str:
    # independent SQL: field missing = NULL or '' (bool/number columns
    # stringify, so 0/false are NOT missing); leasehold_years excused
    # unless contract matches 'lease'; sold_at excused when the label
    # matches 'available' (ref reid/pipelines/local.py:4-44).
    selects = []
    for name in AUDIT_COLS:
        if name == "url":
            continue
        cond = f"(a.{name} IS NULL OR CAST(a.{name} AS STRING) = '')"
        if name == "leasehold_years":
            cond += " AND regexp_matches(lower(COALESCE(a.contract_type,'')), 'lease')"
        if name == "sold_at":
            cond += " AND NOT regexp_matches(lower(COALESCE(a.availability_label,'')), 'available')"
        selects.append(
            f"SELECT url, '{name}' AS missing_field FROM a WHERE {cond}"
        )
    return f"""
    WITH {_audit_cte()}
    SELECT * FROM ({" UNION ALL ".join(selects)}) ORDER BY url, missing_field
    """


@query("missing_fields_audit", _audit_oracle(), survey="R11")
def missing_fields_audit_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R11: required-field completeness audit with the two conditional
    excusals, exploded to (url, missing_field) rows
    (ref reid/pipelines/local.py:4-44)."""
    orders = load_table(spark, sf_dir, "orders")
    d = orders.selectExpr(
        *[f"({expr}) AS {name}" for name, expr in AUDIT_COLS.items()]
    )
    return (
        d.select("url", F.explode(missing_fields_audit(d)).alias("missing_field"))
        .orderBy("url", "missing_field")
    )


@query(
    "properties_with_open_issues",
    f"""
    WITH {_qual_cte()}
    SELECT url FROM q
    WHERE EXISTS (
      SELECT 1 FROM (
        {" UNION ALL ".join(f"SELECT url AS iurl FROM q WHERE {cond}" for cond, _ in _ISSUE_CONDS[:4])}
      ) i WHERE i.iurl = q.url
    )
    ORDER BY url
    """,
    survey="P11,J7",
)
def properties_with_open_issues(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P11: the tag-shaped EXISTS-subquery filter — properties having
    at least one open DQ tag, as a left-semi join against the exploded
    tag rows (ref api/routers/tag_routes.py:57-65
    ``Property.tags.any(...)``)."""
    d = _quality_fixture(spark, sf_dir)
    issues = identify_issues(
        bedrooms="bedrooms",
        price="price",
        title="title",
        description="description",
        location="location",
        build_size="build_size",
        land_size="land_size",
        contract_type="contract_type",
        leasehold_years="leasehold_years",
        availability="availability",
        property_type="property_type",
        land_zoning="land_zoning",
    )
    # restrict to the first four rules to mirror the oracle's tag set
    open_tags = d.select(
        "url", F.explode(F.slice(issues, 1, 13)).alias("issue")
    ).filter(
        F.col("issue").isin(
            "has_more_than_13_bedrooms", "no_bedrooms", "no_price", "no_title"
        )
    )
    return (
        d.join(open_tags, "url", "left_semi").select("url").orderBy("url")
    )


# --- R2 tag reconcile: the second, smaller merge engine (SURVEY §7.4) ------

# Four join cases by construction: existing-open kept/auto-solved,
# existing-closed acknowledged/ignored-on-recur, and brand-new names.
TAG_NAMES = "CASE {m} WHEN 0 THEN 'no_price' WHEN 1 THEN 'no_title' ELSE 'not_available' END"

_CUR_TAGS = f"""
  cur_tags AS (
    SELECT 'P' || {K} AS property_id,
           {TAG_NAMES.format(m=f"{K} % 3")} AS name,
           ({K} % 5 = 0) AS is_solved,
           ({K} % 7 = 0) AS is_ignored
    FROM orders WHERE {K} % 4 <> 3
  )
"""
_OBS_ISSUES = f"""
  obs AS (
    SELECT 'P' || {K} AS property_id,
           {TAG_NAMES.format(m=f"{K} % 2")} AS name
    FROM orders WHERE {K} % 5 <> 4
  )
"""


def _tags_fixtures(spark: SparkSession, sf_dir: str):
    orders = load_table(spark, sf_dir, "orders")
    cur = orders.filter(F.expr(f"{K} % 4 <> 3")).selectExpr(
        f"'P' || {K} AS property_id",
        f"{TAG_NAMES.format(m=f'{K} % 3')} AS name",
        f"({K} % 5 = 0) AS is_solved",
        f"({K} % 7 = 0) AS is_ignored",
    )
    obs = orders.filter(F.expr(f"{K} % 5 <> 4")).selectExpr(
        f"'P' || {K} AS property_id",
        f"{TAG_NAMES.format(m=f'{K} % 2')} AS name",
    )
    return cur, obs


@query(
    "tag_reconcile",
    f"""
    WITH {_CUR_TAGS},
         {_OBS_ISSUES},
         o AS (SELECT DISTINCT property_id, name, TRUE AS seen FROM obs),
         j AS (
           SELECT COALESCE(c.property_id, o.property_id) AS property_id,
                  COALESCE(c.name, o.name) AS name,
                  c.is_solved AS c_solved, c.is_ignored AS c_ignored,
                  (c.is_solved IS NOT NULL) AS existed,
                  COALESCE(o.seen, FALSE) AS seen,
                  COALESCE(c.is_solved OR c.is_ignored, FALSE) AS was_closed
           FROM cur_tags c FULL OUTER JOIN o
             ON c.property_id = o.property_id AND c.name = o.name
         )
    SELECT property_id, name,
           CASE WHEN NOT existed THEN FALSE
                WHEN NOT seen AND NOT was_closed THEN TRUE
                ELSE c_solved END AS is_solved,
           COALESCE(c_ignored, FALSE) AS is_ignored,
           CASE WHEN NOT existed THEN 'new'
                WHEN NOT seen AND NOT was_closed THEN 'auto_solved'
                WHEN was_closed THEN 'acknowledged'
                ELSE 'open' END AS state
    FROM j ORDER BY property_id, name
    """,
    survey="R2-reconcile",
)
def tag_reconcile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R2 tag reconcile (operators/tags.py): this run's observed
    issues full-outer merged into the tags table — disappeared issues
    auto-solve, new names insert open, previously-closed names stay
    closed on recurrence (solved/ignored are human acknowledgements).

    Ref models/property.py:112-137; the reference's object-vs-string
    membership quirk (every tag solved every run) is documented in
    COVERAGE.md divergences — this is the evident intent.

    Scale: one full-outer shuffle on (property_id, name); no per-row
    ORM round-trips."""
    from ..operators.tags import reconcile_tags

    cur, obs = _tags_fixtures(spark, sf_dir)
    return reconcile_tags(cur, obs).orderBy("property_id", "name")
