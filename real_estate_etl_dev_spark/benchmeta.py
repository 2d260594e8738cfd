"""Setup-vs-execution accounting for fixture-building queries.

A handful of certified queries must BUILD their input on disk before
the operator under test can run: the four streaming queries drop
parquet files + a fresh checkpoint dir per invocation (a real
deployment's stream source already exists), and the bucketed merge
writes its two bucketed tables (a real deployment writes the current
table bucketed ONCE, then amortizes it over every nightly merge).
Billing that construction as query wall-clock overstates the
operators' cost in every bench sweep (r05 VERDICT item 3).

The queries wrap their fixture-construction span in
:func:`setup_span`; ``bench.py`` reads :data:`SETUP_SECONDS` after
each timed run and publishes a per-query ``setup`` map alongside the
total timings — the total still includes setup (the driver contract
is unchanged), the split just makes the overhead visible instead of
folklore.
"""

from __future__ import annotations

import time
from contextlib import contextmanager

# query name -> seconds spent building the on-disk fixture during the
# MOST RECENT invocation (overwritten per call, so a bench warm-up
# can't inflate the timed run's number).
SETUP_SECONDS: dict[str, float] = {}


@contextmanager
def setup_span(name: str):
    """Time the enclosed fixture-construction block and record it
    under ``name``.  One span per query invocation."""
    t0 = time.perf_counter()
    try:
        yield
    finally:
        SETUP_SECONDS[name] = round(time.perf_counter() - t0, 4)
