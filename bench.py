"""Benchmark harness — times every catalog query at the bench scale factor.

Run:  python bench.py
Env:  SPARK_GRAFT_SF_DIR  (default /root/testdata/sf0.1)
      SPARK_GRAFT_CPUS    (default 32)

Prints exactly ONE JSON line on stdout (and NOTHING else on stdout):
  {"metric": "catalog_total_wall", "value": <sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": <float>, "n_queries": N}

The driver records only the last 2000 characters of stdout, so the
line MUST stay short (BENCH_r02 `parsed: null` post-mortem: the full
86-query dict was ~2500 chars and got truncated mid-line).  Every
catalog query is still timed — the full table goes to stderr — but
the stdout line carries only the HEADLINE subset.  A hard
`len(line) < 1900` assert guards the contract.

Each query is executed to completion (count() materializes the whole
plan — all shuffles/aggregations run; we avoid collect() so driver
transfer time doesn't pollute operator timings).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# Route Spark logs to stderr so stdout stays a single JSON line.
os.environ.setdefault("SPARK_SUBMIT_OPTS", "-Dlog4j2.level=error")

from real_estate_etl_dev_spark.session import get_spark  # noqa: E402

# Headline queries: one per heavy/representative operator family.
# Kept small enough that the stdout JSON line stays under ~1900 chars
# (driver tail limit is 2000); when a new family lands, a cheap
# family-twin entry rotates out (J7 semi-join twin, W1 sequence, W3
# token stats) — the full table still goes to stderr every run.
HEADLINE = [
    "monthly_order_counts",        # A3 derived-key agg
    "revenue_by_nation",           # A2/J2 join+agg
    "latest_order_per_customer",   # W2/J1 window top-1
    "customers_without_orders",    # J6 anti-join
    "doc_embedding_enrichment",    # J3/J8 enrichment join
    "merge_scd1",                  # R4 SCD-1 merge engine
    # merge_change_log rotated out r08 (R4 family twin of merge_scd1,
    # still timed on stderr) to make stdout room for the hybrid
    "dedup_setsim_hybrid",         # hot-token hybrid setsim join (r08)
    "streaming_merge_scd1",        # §2.12 streaming upsert path
    # tag_reconcile rotated out r09 (R2 family twin of
    # dq_identify_issues, still timed on stderr) for the BPE budget
    "token_budget_bpe",            # tokenizer-count budgeting (r09)
    "dq_identify_issues",          # R2 13-rule DQ
    "price_extraction_cases",      # F-tier scalar battery
    "dedup_exact_groups",          # exact dedup
    "dedup_minhash_pairs",         # MinHash LSH near-dup
    "embedding_cosine_topk",       # brute-force ANN baseline
    "embedding_ann_ivf",           # IVF ANN scale path
    "multimodal_fake_features",    # multimodal plumbing
    "ml_region_prediction",        # ML pipeline
    # salted_skew_event_sums rotated out r07 (family twin of
    # salted_skew_user_join, still timed on stderr) to make stdout
    # room for the machine-load stamp (VERDICT r06 item 4)
    "dedup_connected_components",  # dup-cluster graph resolution
    "dedup_semantic_keepers",      # semantic dedup end-to-end
    "doc_decontaminate",           # eval n-gram overlap screen
    "streaming_queue_status",      # stateful streaming queue
    # streaming_incremental_dedup rotated out r08 (streaming-dedup
    # family twin of streaming_watermark_dedup, still on stderr) to
    # make stdout room for the streaming ANN enrichment path
    # streaming_ann_enrichment (exact) rotated out r09 for its own
    # IVF scale path (same family, still timed on stderr)
    "streaming_ann_enrichment_ivf",  # per-trigger IVF ANN search (r09)
    "fuzzy_title_pairs",           # edit-distance entity resolution
    "zorder_bucket_stats",         # Morton 2-D layout key
    # shipping_priority_topn rotated out r09 (TPC-H composite twin
    # of local_supplier_volume, still on stderr) for the widest new
    # derived-partsupp join
    "product_profit_q9",           # TPC-H Q9 six-table profit (r09)
    # returned_item_losses rotated out r08 (TPC-H composite twin of
    # shipping_priority_topn, still on stderr) for the containment join
    "doc_containment_pairs",       # blocked exact-substr containment (r08)
    # kll_quantile_sketch_prices rotated out r08 (mergeable-sketch
    # family twin of cms_heavy_hitters_users, still on stderr) for the
    # bloom-filter audit — the sketch slot stays a sketch
    # bloom_filter_fp_audit rotated out r09 for its design-tool
    # inverse (same family + measured-vs-predicted columns; audit
    # still timed on stderr)
    "bloom_sizing_design",         # bloom sizing + saturation alarm (r09)
    "streaming_watermark_dedup",   # engine-native streaming dedup
    "streaming_session_windows",   # native streaming sessionization
    "streaming_static_enrichment",  # stream-static broadcast join
    "cms_heavy_hitters_users",     # mergeable frequency sketch
    "streaming_stream_stream_join",  # watermarked two-stream join
    "revenue_grouping_sets",       # multi-grain single-pass agg
    "snapshot_time_travel",        # versioned-table commit protocol
    # snapshot_change_feed rotated out r09 (snapshot family twin of
    # snapshot_time_travel, still on stderr) for the PQ audit
    "embedding_pq_adc_recall",     # PQ/ADC compression audit (r09)
    "incremental_agg_maintenance",  # IVM from CDC deltas
    "embedding_kmeans",            # certified Lloyd k-means
    "dedup_ngram_coverage",        # ExactSubstr dup accounting
    "doc_lm_cross_entropy",        # LM perplexity quality gate
    "partition_pruned_scan",       # Hive-partition pruning
    "local_supplier_volume",       # TPC-H Q5 co-location join
    "salted_skew_user_join",       # manual skew-split join
    # dedup_setsim_prefix stays on stderr (dense adversarial twin);
    # the Zipfian twin is the realistic-vocabulary operating point
    "dedup_setsim_prefix_zipf",    # PPJoin on realistic vocab (r10)
    "seq_pack_bpe_windows",        # next-fit context-window packing (r10)
]


def run_catalog(spark, sf_dir: str, catalog) -> tuple[dict, dict, float]:
    """Time every catalog query; faults are isolated per query so one
    broken plan can never zero out the run (BENCH_r03 post-mortem).
    Returns (timings, errors, total_wall)."""
    timings: dict[str, float] = {}
    errors: dict[str, str] = {}
    t_all = time.perf_counter()
    for name, q in catalog.items():
        t0 = time.perf_counter()
        try:
            q.fn(spark, sf_dir).count()
            timings[name] = round(time.perf_counter() - t0, 4)
        except Exception as exc:  # noqa: BLE001 — isolate per-query faults
            errors[name] = f"{type(exc).__name__}: {exc}"[:200]
            print(f"FAILED {name}: {errors[name]}", file=sys.stderr)
    return timings, errors, round(time.perf_counter() - t_all, 4)


def build_payload(
    timings: dict,
    errors: dict,
    total: float,
    sf: float,
    setup: dict | None = None,
    load: list[float] | None = None,
) -> str:
    """The driver contract: ONE stdout JSON line, always parseable,
    always under the driver's 2000-char stdout tail."""
    # 2 decimals (10 ms): the r07 sweep measured the line at 1875 of
    # the 1900-char budget at 3 dp — one char per query buys back ~40
    # chars of margin, and 10 ms granularity is noise-level for these
    # multi-hundred-ms queries (stderr keeps 3 dp for humans)
    headline = {n: round(timings[n], 2) for n in HEADLINE if n in timings}
    payload = {
        "metric": "catalog_total_wall",
        "value": round(total, 2),
        "unit": "sec",
        "queries": headline,
        "sf": sf,
        "n_queries": len(timings),
        "n_errors": len(errors),
    }
    if load is not None:
        # [start_load1m, end_load1m, steal_pct] — the contamination
        # observables (VERDICT r06 item 4: three rounds of loaded-box
        # sweeps masqueraded as plan regressions).  steal_pct is the
        # share of CPU time the HOST withheld during the run
        # (/proc/stat steal delta): this box is a microVM, so host
        # tenancy is invisible to loadavg — a quiet-guest sweep can
        # still run 20% slow with zero guest load.  Thresholds:
        # BENCHNOTES.md "Machine-load stamp".
        payload["load"] = load
    if setup:
        # Fixture-construction seconds INCLUDED in the timings above for
        # the queries that must build their input per invocation (the
        # streaming drops + checkpoint dirs, the bucketed-table writes).
        # total/queries are unchanged — this is the split, not a rebate.
        # 2 dp + HEADLINE-only: the stdout setup split mirrors the
        # stdout queries dict (every non-headline split still prints
        # in the stderr table) — the full dict grew the line to
        # 1882/1900 chars as the streaming family expanded.
        payload["setup"] = {
            n: round(s, 2)
            for n, s in sorted(setup.items())
            if n in HEADLINE
        }
    if errors:
        # Names only — full messages are on stderr; the stdout line must
        # stay under the driver's 2000-char tail.
        payload["errors"] = sorted(errors)[:10]
    line = json.dumps(payload, separators=(",", ":"))
    if len(line) >= 1900:  # hard contract: never emit an unparseable line
        payload["queries"] = {}
        payload.pop("errors", None)
        payload["truncated"] = True
        line = json.dumps(payload, separators=(",", ":"))
    return line


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    try:
        sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", ""))
    except ValueError:
        sf = -1.0

    spark = get_spark("real-estate-etl-dev-spark-bench")
    spark.sparkContext.setLogLevel("ERROR")

    from real_estate_etl_dev_spark.plans.catalog import CATALOG

    # Warm the JVM + parquet footers so per-query numbers measure plan
    # cost, not session startup: the first catalog query (the schema
    # smoke gate — scans every table), one join+agg (whole-stage-codegen
    # JIT), and one Arrow/pandas-UDF query (Python worker pool spin-up).
    # Matters since the window rotation: heavy queries now run FIRST in
    # catalog order and would otherwise absorb cold-JVM cost their r02
    # late-order timings never paid.  Guarded: a broken warm-up query
    # must not kill the run before a single timing exists (BENCH_r03
    # post-mortem — one AnalysisException produced rc=1, zero numbers).
    # ml_region_prediction is warmed too: its ML-stage codegen JIT is a
    # one-time session cost (~4s) that the rotated order would otherwise
    # charge to the timed run; steady-state plan cost is ~2s (BENCHNOTES).
    def _cpu_stat() -> tuple[int, int]:
        """(steal_jiffies, total_jiffies) from /proc/stat line 1;
        (0, 0) when unreadable so the stamp degrades, never crashes.
        Total sums the first 8 fields only — guest/guest_nice are
        already accounted inside user/nice, and double-counting them
        would understate steal_pct on a VM-hosting kernel."""
        try:
            v = list(map(int, open("/proc/stat").readline().split()[1:]))
            return (v[7] if len(v) > 7 else 0, sum(v[:8]))
        except (OSError, ValueError, IndexError):
            return (0, 0)

    load_start = round(os.getloadavg()[0], 2)
    warmups = [
        next(iter(CATALOG)),
        "revenue_by_nation",
        "multimodal_fake_features",
        "ml_region_prediction",
    ]
    for wname in warmups:
        try:
            CATALOG[wname].fn(spark, sf_dir).count()
        except Exception as exc:  # noqa: BLE001
            print(f"warm-up {wname} failed: {exc}", file=sys.stderr)

    from real_estate_etl_dev_spark.benchmeta import SETUP_SECONDS

    SETUP_SECONDS.clear()  # drop warm-up spans; keep only the timed run's
    # steal window = EXACTLY the timed run (BENCHNOTES thresholds are
    # calibrated for it): capturing before warm-up would let a steal
    # episode confined to warm-up condemn a clean run, or a long quiet
    # warm-up dilute a mid-run episode below threshold
    steal0, total0 = _cpu_stat()
    timings, errors, total = run_catalog(spark, sf_dir, CATALOG)
    setup = {n: s for n, s in SETUP_SECONDS.items() if n in timings}
    steal1, total1 = _cpu_stat()
    # -1.0 sentinel when EITHER sample failed: a (0,0) first read with
    # a good second one would otherwise report cumulative
    # steal-since-boot as if it were the run delta (ADVICE r07)
    steal_pct = (
        round(100.0 * (steal1 - steal0) / (total1 - total0), 2)
        if total0 and total1 > total0
        else -1.0
    )
    load = [load_start, round(os.getloadavg()[0], 2), steal_pct]

    # Full per-query table → stderr (humans, BENCHNOTES).
    for name in sorted(timings, key=timings.get, reverse=True):
        extra = (
            f"  (setup {setup[name]:.3f}s)" if name in setup else ""
        )
        print(f"{timings[name]:9.3f}s  {name}{extra}", file=sys.stderr)
    print(
        f"{total:9.3f}s  TOTAL ({len(timings)} ok, {len(errors)} failed)",
        file=sys.stderr,
    )

    print(
        f"loadavg1m start={load[0]:.2f} end={load[1]:.2f} steal={load[2]:.2f}%",
        file=sys.stderr,
    )
    print(build_payload(timings, errors, total, sf, setup, load))
    sys.stdout.flush()


if __name__ == "__main__":
    main()
