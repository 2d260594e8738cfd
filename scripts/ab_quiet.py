"""Quiet-window A/B of the r09 no-code-change perf movers — VERDICT
r09 item 3.

BENCH_r09 showed ``dedup_setsim_hybrid`` (4.24s r08 → 5.6s r09 clean
pair) and ``streaming_stream_stream_join`` (4.02 → 5.54s) slower with
ZERO code change to their modules between the two verdict commits
(git log empty over the round for operators/dedup.py and
plans/temporal.py).  BENCHNOTES attributes the delta to tenancy
bounce; this script tests that attribution with the controlled
experiment the verdict demanded: the SAME two queries, run from BOTH
git revisions (HEAD vs the r08 verdict commit in a detached
worktree), three interleaved invocations each, steal-stamped per
measurement.

Usage (one invocation = one fresh JVM = one sample pair):

    python scripts/ab_quiet.py --label head
    python scripts/ab_quiet.py --repo /tmp/ab_r08 --label r08

Interleave by alternating invocations:  r08, head, r08, head, ...
Each invocation times each suspect twice — pass 1 (cold in this JVM)
and pass 2 (warm) — and prints ONE JSON line per measurement with
wall seconds, steal-%, and the 1-minute load average, so the
BENCHNOTES table can discard contaminated samples by the same
thresholds the scaling pairs use.

Attribution logic: if HEAD ≈ r08 within jitter on a quiet window,
the r09 deltas were tenancy (expected).  If HEAD is consistently
slower at equal steal/load, something outside the two modules (a
session conf, a catalog-order effect) regressed — bisect from there.

r11 reuse (VERDICT r10 item 2): ``--suspects`` generalizes the
query list so the same harness adjudicates the r10 driver-bench
movers (streaming_ann_enrichment_ivf 4.13->9.39s,
bloom_sizing_design 4.59->6.57s) against the r09 verdict commit:

    python scripts/ab_quiet.py --label r09 --repo /tmp/ab_r09 \\
        --suspects streaming_ann_enrichment_ivf,bloom_sizing_design
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

os.environ.setdefault("SPARK_SUBMIT_OPTS", "-Dlog4j2.level=error")

DEFAULT_SUSPECTS = ["dedup_setsim_hybrid", "streaming_stream_stream_join"]


def _cpu_stat() -> tuple[int, int]:
    v = list(map(int, open("/proc/stat").readline().split()[1:]))
    return v[7], sum(v)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--repo", default="/root/repo")
    ap.add_argument("--label", required=True)
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument(
        "--suspects",
        default=",".join(DEFAULT_SUSPECTS),
        help="comma-separated catalog query names to time",
    )
    args = ap.parse_args()
    suspects = [s.strip() for s in args.suspects.split(",") if s.strip()]

    sys.path.insert(0, args.repo)
    os.chdir(args.repo)
    import __spark_entry__ as e
    from real_estate_etl_dev_spark.session import get_spark

    qs = e.queries()
    unknown = [s for s in suspects if s not in qs]
    if unknown:
        # fail BEFORE the JVM spins up or any timing prints — a
        # mid-run KeyError after the first suspect's samples would
        # corrupt the interleaved design
        sys.exit(f"unknown suspects (not in queries()): {unknown}")

    spark = get_spark("ab-quiet")
    spark.sparkContext.setLogLevel("ERROR")
    for pass_no in (1, 2):
        for name in suspects:
            s0, t0 = _cpu_stat()
            load0 = os.getloadavg()[0]
            w0 = time.perf_counter()
            qs[name](spark, args.sf_dir).count()
            wall = time.perf_counter() - w0
            s1, t1 = _cpu_stat()
            print(
                json.dumps(
                    {
                        "label": args.label,
                        "query": name,
                        "pass": pass_no,
                        "wall_s": round(wall, 3),
                        "steal_pct": round(
                            100.0 * (s1 - s0) / max(t1 - t0, 1), 3
                        ),
                        "load1m_start": round(load0, 2),
                    }
                ),
                flush=True,
            )


if __name__ == "__main__":
    main()
