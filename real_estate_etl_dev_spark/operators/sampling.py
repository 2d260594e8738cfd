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

__all__ = ["hash_split", "mixture_plan", "mixture_sample", "split_column"]

_BINS = 10_000


def _hash_bucket(id_col: Column | str, salt: str) -> Column:
    """10k-bin bucket of md5(salt ‖ id) — the shared deterministic
    uniform used by both the split and mixture samplers."""
    c = F.col(id_col) if isinstance(id_col, str) else id_col
    return (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit(salt), c.cast("string")).cast("binary")), 1, 8
            ),
            16,
            10,
        ).cast("long")
        % _BINS
    )


def mixture_sample(
    df: DataFrame,
    domain_col: str,
    weights_bp: Mapping[str, int],
    token_col: Column | str,
    budget_tokens: int,
    id_col: str = "doc_id",
    salt: str = "mix1",
) -> DataFrame:
    """Domain-mixture sampler: downsample each domain so the kept
    corpus approaches ``budget_tokens`` split by the target mixture
    ``weights_bp`` (basis points, must sum to 10000) — the dataset-
    mixing step every pretraining run performs (e.g. re-weighting web
    vs books vs code).

    Per-domain rate (basis points) = min(10000, budget·w_bp ÷ avail) —
    ALL-INTEGER arithmetic, so the rate is bit-identical across
    engines (no float-rounding flakes at the floor boundary).  A
    domain with fewer tokens than its target clamps at 10000 (keep
    everything) — the DEFICIT case the mixture report must surface
    rather than silently rebalance.  Docs are kept when the
    deterministic md5 bucket of (salt ‖ id) falls under the rate:
    replay-safe, partition-independent, engine-checkable.

    Scale: phase 1 aggregates token counts per domain (one shuffle to
    a |domains|-row frame — single-digit rows, broadcast back); phase
    2 is a map-only filter.  No RNG, no collect of row data, no
    repartition of the corpus.

    Returns ``df`` + ``__rate_bp`` / ``__avail_tokens`` columns,
    filtered to the sampled rows.
    """
    rates = mixture_plan(df, domain_col, weights_bp, token_col, budget_tokens)
    return df.join(F.broadcast(rates), domain_col).filter(
        _hash_bucket(id_col, salt) < F.col("__rate_bp")
    )


def mixture_plan(
    df: DataFrame,
    domain_col: str,
    weights_bp: Mapping[str, int],
    token_col: Column | str,
    budget_tokens: int,
) -> DataFrame:
    """The per-domain sampling-rate frame behind ``mixture_sample`` —
    one row per domain PRESENT IN ``df`` with ``__w_bp`` /
    ``__avail_tokens`` / ``__rate_bp``.  Exposed separately so mixture
    REPORTS enumerate every domain even when a domain samples zero
    rows (a report derived from the sampled rows alone would silently
    drop such domains)."""
    assert sum(weights_bp.values()) == _BINS, "weights_bp must sum to 10000"
    tok = F.col(token_col) if isinstance(token_col, str) else token_col
    avail = df.groupBy(domain_col).agg(
        F.sum(tok.cast("long")).alias("__avail_tokens")
    )
    wmap = F.create_map(
        *[x for k, v in weights_bp.items() for x in (F.lit(k), F.lit(int(v)))]
    )
    return (
        avail.withColumn(
            "__w_bp", F.coalesce(wmap[F.col(domain_col)], F.lit(0)).cast("long")
        )
        .withColumn(
            "__rate_bp",
            F.least(
                F.lit(_BINS).cast("long"),
                F.expr(
                    f"CAST({int(budget_tokens)} AS BIGINT) * __w_bp"
                    " div __avail_tokens"
                ),
            ),
        )
    )


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
    bucket = _hash_bucket(id_col, salt)
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
