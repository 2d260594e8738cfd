"""SparkSession factory with scale-oriented defaults.

The driver may hand us its own session (``__spark_entry__.entry``),
so every query must also work without these conf defaults — we rely
on per-plan hints (``broadcast()``) rather than session conf where
correctness or plan shape matters.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app_name: str = "real-estate-etl-dev-spark") -> SparkSession:
    """Build (or reuse) a local session tuned for the test harness.

    On a real cluster these confs come from spark-submit; the ones
    here encode the engine's posture: AQE on (runtime re-plan,
    partition coalescing, skew-join splitting), Arrow on (pandas-UDF
    tier), sane shuffle parallelism for local[N].
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(max(int(cpus), 8)))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # Runtime bloom-filter join pruning: a selective dim-side
        # filter injects might_contain(bloom(join_key)) into the fact
        # scan before the shuffle.  Spark ships it off by default; the
        # default thresholds (creation side ≤ 10 MB, application-side
        # scan ≥ 10 GB) mean it only fires at real fact-table sizes —
        # a no-op at test SFs, a large shuffle-volume win at 100 TB.
        # tests/test_plan_shapes.py proves the machinery fires when
        # the thresholds are met.
        .config("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
    )
    return builder.getOrCreate()
