"""Bench order-sensitivity A/B — VERDICT r04 item 1.

BENCH_r04 showed four mid-weight queries (tag_reconcile,
dedup_exact_groups, merge_change_log, dq_identify_issues) at >2x their
r02 sweep times while warm best-of-3 showed them flat-or-faster.  Both
cannot be the steady state.  Hypothesis: sweep-order/JVM-state
sensitivity after the r04 window rotation reshuffled execution order —
this script tests it with a controlled experiment instead of a shrug.

Design: run the FULL catalog sweep TWICE in one JVM (pass1 = the
driver's cold-sweep condition, pass2 = warm steady state), in ONE of
two orders, selected at launch:

    python scripts/bench_ab.py                      # rotated (driver) order
    SPARK_GRAFT_NO_ROTATE=1 python scripts/bench_ab.py   # registration (r02-like) order

Each run writes ``bench_ab_<order>.json`` with both passes' per-query
timings.  Attribution logic (BENCHNOTES.md):

* suspect slow in pass1 but fast in pass2, in both orders
    -> JVM/session state (JIT, shuffle-service warmup), not the plan;
* suspect slow in pass1 of one order only
    -> neighborhood effect of that order (e.g. GC pressure inherited
       from a heavy predecessor);
* suspect slow in BOTH passes of an order
    -> real regression -> bisect the plan.

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
     SPARK_GRAFT_CPUS (default 32).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("SPARK_SUBMIT_OPTS", "-Dlog4j2.level=error")

SUSPECTS = [
    "tag_reconcile",
    "dedup_exact_groups",
    "merge_change_log",
    "dq_identify_issues",
]


def sweep(spark, sf_dir: str, catalog) -> dict[str, float]:
    """One timing contract for the whole repo: reuse bench.run_catalog
    (fault isolation, error truncation, identical loop) — failed
    queries are simply absent from the dict rather than -1-sentinel
    values that could leak into averages."""
    from bench import run_catalog

    timings, _errors, _total = run_catalog(spark, sf_dir, catalog)
    return timings


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    order = "registration" if os.environ.get("SPARK_GRAFT_NO_ROTATE") else "rotated"

    from real_estate_etl_dev_spark.session import get_spark

    spark = get_spark(f"bench-ab-{order}")
    spark.sparkContext.setLogLevel("ERROR")

    from real_estate_etl_dev_spark.plans.catalog import CATALOG

    # Same warm-up contract as bench.py so pass1 matches the driver's
    # sweep condition.
    for wname in (
        next(iter(CATALOG)),
        "revenue_by_nation",
        "multimodal_fake_features",
        "ml_region_prediction",
    ):
        try:
            CATALOG[wname].fn(spark, sf_dir).count()
        except Exception as exc:  # noqa: BLE001
            print(f"warm-up {wname} failed: {exc}", file=sys.stderr)

    t0 = time.perf_counter()
    pass1 = sweep(spark, sf_dir, CATALOG)
    t1 = time.perf_counter()
    pass2 = sweep(spark, sf_dir, CATALOG)
    t2 = time.perf_counter()

    payload = {
        "order": order,
        "sf_dir": sf_dir,
        "query_order": list(CATALOG),
        "pass1": pass1,
        "pass2": pass2,
        "pass1_total": round(t1 - t0, 2),
        "pass2_total": round(t2 - t1, 2),
        "suspects": {
            n: {"pass1": pass1.get(n), "pass2": pass2.get(n)} for n in SUSPECTS
        },
    }
    out = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        f"bench_ab_{order}.json",
    )
    with open(out, "w") as f:
        json.dump(payload, f, indent=1)
    print(json.dumps(payload["suspects"], indent=1))
    print(f"wrote {out}: pass1 {payload['pass1_total']}s, pass2 {payload['pass2_total']}s")


if __name__ == "__main__":
    main()
