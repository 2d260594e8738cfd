"""Tag reconcile — the second, smaller merge engine (SURVEY §7.4):
current DQ-tag rows vs the issues observed this run.

Reference semantics (models/property.py:112-137): per property,
``identify_issues`` yields the current issue-name set; existing tags
whose issue no longer appears are marked solved; names not previously
present are inserted; previously-present names (open OR solved) are
left alone — a solved tag is a human acknowledgement and does NOT
reopen when the issue recurs (``prev_issues`` includes solved tags).

Documented divergence: the reference's "mark solved" loop compares a
tag NAME against a list of Tag OBJECTS (``if tag.name not in
issues:`` after ``issues`` was remapped to ``Tag(...)`` instances),
so the membership test is always true and EVERY existing tag is
solved on every run, even when its issue persists.  This engine
implements the evident intent (solve only disappeared issues); the
quirk is recorded in COVERAGE.md "Documented divergences".

Scale: ONE full-outer shuffle join on (property_id, name) — at 100 TB
both sides partition on the same compound key, and the tags table is
naturally bucketable by property_id for exchange-free reconciles
(operators/layout.py).  The reference does this per-property with two
ORM round-trips per tag.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["reconcile_tags"]


def reconcile_tags(
    current_tags: DataFrame,
    observed_issues: DataFrame,
    key: str = "property_id",
    name_col: str = "name",
) -> DataFrame:
    """Merge this run's observed (property, issue) pairs into the tags
    table.

    ``current_tags``: key, name, is_solved, is_ignored.
    ``observed_issues``: key, name (deduplicated upstream; this
    function applies a defensive dropDuplicates like the reference's
    ``list(set(issues))``).

    Returns the reconciled table plus a ``state`` audit column:
    ``new`` (inserted open), ``auto_solved`` (issue disappeared this
    run), ``open`` (still failing), ``acknowledged`` (was solved or
    ignored; recurrence does not reopen).
    """
    c = (
        current_tags.select(
            F.col(key), F.col(name_col), F.col("is_solved"), F.col("is_ignored")
        )
        # Explicit row-existence marker (ADVICE r02): probing a data
        # column (is_solved IS NOT NULL) would misclassify an existing
        # tag whose is_solved is NULL as 'new' and reset its
        # is_ignored flag.  __cur mirrors __seen on the observed side.
        .withColumn("__cur", F.lit(True))
        .alias("c")
    )
    o = (
        observed_issues.select(F.col(key), F.col(name_col))
        .dropDuplicates([key, name_col])
        .withColumn("__seen", F.lit(True))
        .alias("o")
    )
    joined = c.join(o, on=[key, name_col], how="full_outer")
    existed = F.coalesce(F.col("__cur"), F.lit(False))
    seen = F.coalesce(F.col("__seen"), F.lit(False))
    was_closed = F.coalesce(
        F.col("c.is_solved") | F.col("c.is_ignored"), F.lit(False)
    )
    state = (
        F.when(~existed, F.lit("new"))
        .when(~seen & ~was_closed, F.lit("auto_solved"))
        .when(was_closed, F.lit("acknowledged"))
        .otherwise(F.lit("open"))
    )
    is_solved = (
        F.when(~existed, F.lit(False))
        .when(~seen & ~was_closed, F.lit(True))
        .otherwise(F.col("c.is_solved"))
    )
    return joined.select(
        F.col(key),
        F.col(name_col),
        is_solved.alias("is_solved"),
        F.coalesce(F.col("c.is_ignored"), F.lit(False)).alias("is_ignored"),
        state.alias("state"),
    )
