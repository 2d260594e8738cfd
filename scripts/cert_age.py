#!/usr/bin/env python
"""Regenerate COVERAGE.md's driver-certification-age table from the
committed CORRECTNESS_r*.json artifacts and the data-driven window
(plans/catalog.py:front_window) — the same inputs the rotation uses,
so the table can't drift from the behavior.

Usage: python scripts/cert_age.py   (prints the markdown section)
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from real_estate_etl_dev_spark.plans.catalog import (  # noqa: E402
    CATALOG,
    _cert_history,
    front_window,
)


def main() -> None:
    hist = _cert_history()
    window = set(front_window())
    never = [n for n in CATALOG if n not in hist]
    by_round: dict[int, int] = {}
    for n in CATALOG:
        if n in hist:
            by_round[hist[n]] = by_round.get(hist[n], 0) + 1
    summary = ", ".join(
        f"{c} latest-green r{r:02d}" for r, c in sorted(by_round.items())
    )
    print("## Driver-certification age (generated: scripts/cert_age.py)")
    print()
    print(
        "The driver certifies the first 50 registered queries each round;\n"
        "the window is computed (plans/catalog.py:front_window) as: smoke\n"
        "gate, then never-certified, then forced canaries, then oldest\n"
        "latest-green first.  Regenerate this section after adding queries\n"
        "or when a new CORRECTNESS artifact lands."
    )
    print()
    print(
        f"Summary: {len(CATALOG)} catalog queries — {summary}, "
        f"{len(never)} never certified "
        f"({', '.join(never) if never else '—'}). "
        f"{sum(1 for n in CATALOG if n in window)} in this round's window."
    )
    print()
    print("| query | latest green | in current window |")
    print("|---|---|---|")
    for n in CATALOG:
        age = f"r{hist[n]:02d}" if n in hist else "never"
        print(f"| `{n}` | {age} | {'yes' if n in window else 'no'} |")
    print()
    _next_round_budget(hist, window)


def _next_round_budget(hist: dict[str, int], window: set[str]) -> None:
    """The forward arithmetic every round states by hand (COVERAGE.md
    round records): IF every window row certifies green this round,
    what does the next window look like and how many free slots does
    it leave for new registrations + forced canaries?  Computed from
    the same inputs as the rotation so the statement can't drift."""
    from real_estate_etl_dev_spark.plans.catalog import _WINDOW_SIZE

    this_round = max(hist.values(), default=0) + 1
    projected = dict(hist)
    for n in window:
        projected[n] = this_round
    # never-certified rows OUTSIDE the current window (window
    # overflow) take next-round slots AHEAD of aged rows, per
    # front_window's policy — they must charge the budget first
    never_out = [n for n in CATALOG if n not in projected]
    aged = sorted(v for n, v in projected.items() if n in CATALOG)
    if not aged:
        return
    oldest = aged[0]
    head = sum(1 for v in aged if v == oldest)
    free = _WINDOW_SIZE - 1 - len(never_out) - head  # 1 = smoke gate
    never_note = (
        f" {len(never_out)} never-certified overflow rows claim slots"
        f" first ({', '.join(never_out)});" if never_out else ""
    )
    slip_note = (
        " NEGATIVE: the oldest cohort itself overflows the window — "
        f"{-free} of its rows slip a round even with zero new "
        "registrations." if free < 0 else ""
    )
    print(
        f"Next-round budget (if all {len(window)} window rows certify "
        f"as r{this_round:02d}): window head = {head} rows last-green "
        f"r{oldest:02d};{never_note} 1 smoke + {len(never_out)} "
        f"never-certified + {head} aged leaves **{free} free slots** "
        f"for new registrations + forced canaries before an aged row "
        f"slips past the retirement guarantee.{slip_note}"
    )


if __name__ == "__main__":
    main()
