"""Benchmark harness — times every catalog query at the bench scale factor.

Run:  python bench.py
Env:  SPARK_GRAFT_SF_DIR  (default /root/testdata/sf0.1)
      SPARK_GRAFT_CPUS    (default 32)

Prints exactly ONE JSON line on stdout:
  {"metric": "catalog_total_wall", "value": <sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": <float>}

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


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    try:
        sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", ""))
    except ValueError:
        sf = -1.0

    spark = get_spark("real-estate-etl-dev-spark-bench")
    spark.sparkContext.setLogLevel("ERROR")

    from real_estate_etl_dev_spark.plans.catalog import CATALOG

    # Warm the JVM + parquet footers once so per-query numbers measure
    # plan cost, not session startup.
    next(iter(CATALOG.values())).fn(spark, sf_dir).count()

    timings: dict[str, float] = {}
    t_all = time.perf_counter()
    for name, q in CATALOG.items():
        t0 = time.perf_counter()
        q.fn(spark, sf_dir).count()
        timings[name] = round(time.perf_counter() - t0, 4)
    total = round(time.perf_counter() - t_all, 4)

    print(
        json.dumps(
            {
                "metric": "catalog_total_wall",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
