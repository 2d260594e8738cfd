"""Temporal operators Spark lacks natively: as-of join and
sessionization (LLM-data/event-pipeline extensions; the reference has
no temporal joins — its nearest analog is the per-row "latest state"
probe in reid/pipelines/property.py:96-126 — so these are additive
scale-path operators in the spirit of SURVEY §2's J/W families).

Both are built as ONE shuffle on the partition key + a sorted window
pass — no range join, no per-key driver loop, no Python UDF — so they
survive 100 TB exactly like any other keyed window:

* ``asof_join`` — the classic union-and-carry-forward formulation:
  tag both inputs, union them (right rows carry their payload as a
  struct, left rows carry NULL), sort within each key by
  (ts, side), and ``last(payload, ignorenulls=True)`` carries the
  most recent right row onto every left row.  This is O(n log n) per
  key partition vs the O(n·m) range-join a naive
  ``left.join(right, cond).groupBy(...).agg(max_by)`` would plan.
* ``sessionize`` — gap-based session ids via
  ``sum(gap > threshold) over (partition by key order by ts)``.
  The cumulative sum uses the default RANGE frame, so rows tied on
  the timestamp deterministically share a session id regardless of
  tie order.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["asof_join", "sessionize"]

_TS = "__asof_ts"
_SIDE = "__asof_side"
_MATCH = "__asof_match"


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | Sequence[str],
    left_ts: str = "ts",
    right_ts: str | None = None,
    payload: Sequence[str] | None = None,
    direction: str = "backward",
    prefix: str = "r_",
    tolerance_us: int | None = None,
) -> DataFrame:
    """For every left row, attach the payload of the nearest right row
    with the same key and ``right.ts <= left.ts`` (``backward``; ties
    match, like DuckDB/pandas ASOF) or ``right.ts >= left.ts``
    (``forward``).  Unmatched left rows keep NULL payload columns
    (left-join semantics).

    Plan shape: unionByName (no shuffle) → one shuffle on ``on`` →
    in-partition sort by (ts, side) → running ``last(ignorenulls)``.
    The right payload travels as ONE struct column, so the window
    carries a single value regardless of payload width.

    ``prefix`` names the attached columns (``{prefix}{field}`` plus
    ``{prefix}ts``).  ``tolerance_us`` drops matches further than that
    many microseconds from the left timestamp.

    Right rows tied on (key, ts) make the match nondeterministic —
    pre-aggregate the right side to one row per (key, ts) first.
    """
    keys = [on] if isinstance(on, str) else list(on)
    right_ts = right_ts or left_ts
    if payload is None:
        payload = [c for c in right.columns if c not in (*keys, right_ts)]
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")

    match = F.struct(
        F.col(right_ts).alias(f"{prefix}ts"),
        *[F.col(c).alias(prefix + c) for c in payload],
    )
    r = right.select(
        *keys,
        F.col(right_ts).alias(_TS),
        F.lit(0).alias(_SIDE),
        match.alias(_MATCH),
    )
    l = left.withColumn(_TS, F.col(left_ts)).withColumn(_SIDE, F.lit(1))
    u = l.unionByName(r, allowMissingColumns=True)

    # Right-before-left at equal ts (side 0 < 1) makes ties match in
    # both directions.
    order = [F.col(_TS).desc(), F.col(_SIDE)] if direction == "forward" else [_TS, _SIDE]
    w = (
        Window.partitionBy(*keys)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = u.withColumn(_MATCH, F.last(_MATCH, ignorenulls=True).over(w)).filter(
        F.col(_SIDE) == 1
    )
    if tolerance_us is not None:
        lag = F.abs(
            F.unix_micros(F.col(_TS)) - F.unix_micros(F.col(_MATCH)[f"{prefix}ts"])
        )
        filled = filled.withColumn(
            _MATCH, F.when(lag <= tolerance_us, F.col(_MATCH))
        )
    out_payload = [
        F.col(_MATCH)[f"{prefix}ts"].alias(f"{prefix}ts"),
        *[F.col(_MATCH)[prefix + c].alias(prefix + c) for c in payload],
    ]
    return filled.select(*left.columns, *out_payload)


def sessionize(
    events: DataFrame,
    key: str = "user_id",
    ts_col: str = "ts",
    gap_seconds: int = 1800,
    session_col: str = "session_seq",
) -> Column | DataFrame:
    """Assign 1-based per-key session sequence numbers: a new session
    starts when the gap to the previous event exceeds
    ``gap_seconds``.  One shuffle on ``key``; integer µs arithmetic
    (no double drift).  The RANGE cumulative frame makes rows tied on
    the timestamp share a session id deterministically."""
    w = Window.partitionBy(key).orderBy(ts_col)
    us = F.unix_micros(F.col(ts_col))
    gap = us - F.lag(us).over(w)
    is_new = F.coalesce(gap > gap_seconds * 1_000_000, F.lit(True))
    # Default (RANGE UNBOUNDED PRECEDING .. CURRENT ROW) frame on the
    # ordered window — tied rows are frame peers, one shared value.
    return events.withColumn(
        session_col, F.sum(is_new.cast("long")).over(w)
    )
