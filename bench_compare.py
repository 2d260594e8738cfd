"""Side-by-side throughput: this engine (Spark local[32]) vs DuckDB
running the IDENTICAL oracle SQL on the same parquet, plus a
reference-architecture probe (row-at-a-time Python merge loop, the
shape of reid/pipelines/property.py:96-126) vs the set-based merge.

Writes BENCHNOTES.md.  This is diagnostic tooling, not the driver
bench — bench.py stays the one-JSON-line contract.

Run:  python bench_compare.py  [sf_dir]
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import duckdb

from real_estate_etl_dev_spark.session import get_spark
from real_estate_etl_dev_spark.sources.readers import TABLES

HEADLINE = [
    "monthly_order_counts",
    "revenue_by_nation",
    "latest_order_per_customer",
    "order_sequence_ids",
    "merge_scd1",
    "streaming_merge_scd1",  # real stream → foreachBatch merge; oracle = same merge SQL
    "merge_change_log",
    "dq_identify_issues",
    "dedup_exact_groups",
    "asof_error_click",
    "event_sessions",
    "rolling_7d_revenue",
    "doc_fingerprints",
    "tag_reconcile",
    "corpus_prep_pipeline",
    "revenue_rollup_status_priority",
    # Heavy hitters that changed since r02 (minhash rewrite, IVF KMeans
    # trim, events-reader dtype adaptivity) + the new smoke gate.
    "dedup_minhash_pairs",
    "dedup_simhash_pairs",
    "embedding_ann_ivf",
    "embedding_cosine_topk",
    "ml_region_prediction",
    "event_type_counts",
    "salted_skew_event_sums",
    "token_budget_sample",
    "multimodal_fake_features",
    "schema_inventory",
    # Round-4 additions.
    "doc_repetition_scores",
    "dedup_incremental_against_corpus",
    "doc_pack_assignments",
    "doc_pii_redaction",
    "streaming_windowed_counts",  # real stream; oracle = batch group-by
    # Round-8 additions.  dedup_setsim_hybrid is deliberately absent:
    # its oracle is the O(n²) brute-force all-pairs join (357s in
    # DuckDB at sf0.1) — a completeness proof, not a comparable
    # workload; the Spark side is seconds.
    "embedding_ann_recall_cost",
    "embedding_matryoshka_recall",
    "embedding_int8_quantization_error",
    "doc_pii_scrub_audit",
    "corpus_ngram_diversity",
    "corpus_zipf_fit",
    "nation_trade_volume_q7",
    "customer_order_distribution_q13",
    # Round-8 second-session additions.  doc_containment_pairs IS
    # included despite its brute-force oracle: DuckDB runs the 30.8M
    # all-pairs contains() in ~9s at sf0.1, making it a fair (and
    # Spark-favoring) comparison — the blocked join wins 2.6x.
    "market_share_q8",
    "doc_chunk_windows",
    "bloom_filter_fp_audit",
    "doc_containment_pairs",
    "streaming_ann_enrichment",
    "dedup_bloom_prefilter",
    "streaming_bloom_dedup",
    "multimodal_frame_schedule",
]


def parse_round_artifact(path: str) -> dict[str, float]:
    """Recover per-query seconds from a BENCH_r{N}.json driver artifact.

    The driver records only the stdout tail, often truncated mid-JSON, so
    parse `"name": float` pairs by regex instead of json.loads.
    """
    import json
    import re

    try:
        with open(path) as f:
            tail = json.load(f).get("tail", "") or ""
    except (OSError, ValueError):
        return {}
    return {
        m.group(1): float(m.group(2))
        for m in re.finditer(r'"([a-z0-9_]+)":\s*([0-9.]+)', tail)
        if not m.group(1) in {"value", "sf", "n_queries", "n_errors"}
    }


def time_n(fn, n=3):
    runs = []
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        runs.append(time.perf_counter() - t0)
    return min(runs), statistics.median(runs)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    spark = get_spark("bench-compare")
    spark.sparkContext.setLogLevel("ERROR")
    from real_estate_etl_dev_spark.plans.catalog import CATALOG

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    # warm both engines
    CATALOG["monthly_order_counts"].fn(spark, sf_dir).count()
    con.execute(CATALOG["monthly_order_counts"].oracle).fetchall()

    rows = []
    for name in HEADLINE:
        q = CATALOG[name]
        s_best, s_med = time_n(lambda: q.fn(spark, sf_dir).count())
        d_best, d_med = time_n(lambda: con.execute(q.oracle).fetchall())
        rows.append((name, s_best, s_med, d_best, d_med))
        print(f"{name:34s} spark {s_best:6.2f}s  duckdb {d_best:6.2f}s")

    # Reference-architecture probe: the reference merges row-at-a-time
    # (per-item SELECT current -> compare -> UPDATE, property.py:96-126).
    # Reproduce that shape in-process: dict-indexed current state +
    # a Python loop over staging rows doing per-field compare/fill.
    from real_estate_etl_dev_spark.plans.merging import (
        current_fixture,
        staging_fixture,
    )

    cur = {r["url"]: r.asDict() for r in current_fixture(spark, sf_dir).collect()}
    stg = [r.asDict() for r in staging_fixture(spark, sf_dir).collect()]
    fields = [k for k in stg[0] if k != "url"]

    def row_loop():
        changes = 0
        for s in stg:
            c = cur.get(s["url"])
            if c is None:
                continue
            for f in fields:
                new, old = s[f], c[f]
                if new not in (None, "", 0, -1) and new != old:
                    changes += 1
        return changes

    t0 = time.perf_counter()
    row_loop()
    loop_s = time.perf_counter() - t0
    merge_best, _ = time_n(
        lambda: CATALOG["merge_scd1"].fn(spark, sf_dir).count(), n=2
    )
    n_stg = len(stg)

    with open("BENCHNOTES.md", "w") as f:
        f.write(
            "# BENCHNOTES — engine vs single-node SQL vs reference shape\n\n"
            f"Config: `{sf_dir}`, Spark local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}] "
            "vs DuckDB (same box, same parquet, same SQL semantics — each row's "
            "DuckDB query IS the oracle the Spark plan hash-matches). "
            "best-of-3 wall seconds.\n\n"
            "| query | spark best | spark med | duckdb best | duckdb med |\n"
            "|---|---|---|---|---|\n"
        )
        for name, sb, sm, db, dm in rows:
            f.write(f"| {name} | {sb:.2f} | {sm:.2f} | {db:.2f} | {dm:.2f} |\n")

        r02 = parse_round_artifact("BENCH_r02.json")
        deltas = [
            (name, r02[name], sb)
            for name, sb, _, _, _ in rows
            if name in r02
        ]
        if deltas:
            f.write(
                "\n## Round-over-round (vs BENCH_r02 driver artifact)\n\n"
                "r02 numbers are the driver's single-pass catalog sweep "
                "(cold-ish JVM, registration order); this round's are "
                "best-of-3 warm — so treat <1.3× either way as noise. "
                "Material moves only:\n\n"
                "| query | r02 sweep | r04 best-of-3 | ratio |\n"
                "|---|---|---|---|\n"
            )
            for name, old, new in sorted(deltas, key=lambda r: r[2] / r[1]):
                ratio = new / old
                if ratio < 0.75 or ratio > 1.3:
                    f.write(
                        f"| {name} | {old:.2f} | {new:.2f} | {ratio:.2f}× |\n"
                    )
        f.write(
            "\nCaveat: for `dedup_minhash_pairs`, `dedup_simhash_pairs`, "
            "`embedding_ann_ivf`, and `ml_region_prediction` the DuckDB "
            "column is the recall/accuracy GATE oracle (planted-duplicate "
            "counts, not an equivalent LSH/KMeans/RF computation), so its "
            "near-zero time is not an engine comparison for those rows — "
            "only the Spark column is a real workload there.\n"
            "\nNote: the `streaming_merge_scd1` and `streaming_windowed_counts` "
            "rows compare REAL Structured Streaming runs (availableNow file "
            "ingest + checkpoint; the merge publishes parquet via foreachBatch, "
            "the windowed count crosses multiple maxFilesPerTrigger-sliced "
            "micro-batches) against DuckDB executing the equivalent batch SQL — "
            "the delta over their batch twins is the streaming machinery, which "
            "buys exactly-once incremental processing.\n"
            "\nNote: `doc_repetition_scores` is the row where Spark BEATS DuckDB "
            "~4× on identical semantics — whole-stage-codegen array expressions "
            "(transform/array_distinct over per-doc bigrams) against DuckDB's "
            "list lambdas. Expression-heavy text scoring is exactly the shape "
            "the JVM tier wins even single-node.\n"
            "\nReading: DuckDB is the strongest single-node columnar engine — "
            "parity-or-close against it at this scale means per-query JVM/plan "
            "overhead (codegen compile, 32-way task scheduling on ~100 MB "
            "inputs) is the gap, not the plan shape. The Spark plans' payoff "
            "is horizontal: every shuffle key here partitions across "
            "executors, which DuckDB (and the reference) cannot do at 100 TB.\n\n"
            "## Reference-architecture probe (merge path)\n\n"
            f"The reference merges row-at-a-time: per staged item, one SELECT "
            "for current state plus one UPDATE/INSERT "
            "(reid/pipelines/property.py:96-126, batch_size=10 commits at "
            "api/routers/data_routes.py:124-142). The pure in-memory compare "
            f"loop over the same {n_stg} staged rows costs {loop_s:.2f}s here "
            "— but that omits what actually dominates the reference: 2 SQL "
            f"round-trips × {n_stg} items. At even 1 ms/round-trip that is "
            f"~{2 * n_stg / 1000:.0f}s serialized; the set-based full-outer "
            f"merge does the identical field policy in **{merge_best:.2f}s** "
            "end-to-end (scan+shuffle+projection) and parallelizes across "
            "executors at any scale.\n"
        )
    print("wrote BENCHNOTES.md")


if __name__ == "__main__":
    main()
