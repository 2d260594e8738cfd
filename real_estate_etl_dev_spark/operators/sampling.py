"""Deterministic corpus-splitting / sampling operators (LLM-data
pipeline extensions; driver north star).

A training pipeline must split corpora REPRODUCIBLY — the same doc
lands in the same split on every run, every engine, every cluster
size.  ``sample()``/``randomSplit()`` can't promise that (partition-
dependent RNG); a content/id hash can.  ``hash_split`` buckets
``md5(salt ‖ id)`` into 10k bins and maps cumulative weight ranges to
split names — pure column expressions, map-only (no shuffle), and
cross-engine checkable (the DuckDB oracle computes the identical md5
arithmetic).
"""

from __future__ import annotations

from collections.abc import Mapping

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["hash_split", "split_column"]

_BINS = 10_000


def split_column(
    id_col: Column | str,
    weights: Mapping[str, float],
    salt: str = "v1",
) -> Column:
    """Split-name Column for an id: bucket = first 8 md5 hex chars of
    ``salt ‖ id`` mod 10000 (8 hex chars → 2³² values, so the mod
    bias is ~1e-6 — 4 chars would bias buckets by ~9%); cumulative
    weight ranges map buckets to names.  Deterministic across runs,
    engines, and partitionings."""
    total = sum(weights.values())
    c = F.col(id_col) if isinstance(id_col, str) else id_col
    bucket = (
        F.conv(
            F.substring(F.md5(F.concat(F.lit(salt), c.cast("string")).cast("binary")), 1, 8),
            16,
            10,
        ).cast("long")
        % _BINS
    )
    expr = None
    acc = 0.0
    items = list(weights.items())
    for name, w in items[:-1]:
        acc += w / total
        cond = bucket < int(round(acc * _BINS))
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
    last = items[-1][0]
    return (F.lit(last) if expr is None else expr.otherwise(F.lit(last))).alias("split")


def hash_split(
    df: DataFrame,
    id_col: str = "doc_id",
    weights: Mapping[str, float] | None = None,
    salt: str = "v1",
    out_col: str = "split",
) -> DataFrame:
    """Attach a deterministic train/val/test split column.  Map-only:
    no shuffle, no RNG, no driver state — the operator every
    training-data pipeline needs to be re-runnable at 100 TB."""
    weights = weights or {"train": 0.8, "val": 0.1, "test": 0.1}
    return df.withColumn(out_col, split_column(id_col, weights, salt))
