"""Readers for the driver-provided parquet zone (TESTDATA.md).

Reference parity: S10 (DB table scan → ``spark.read.parquet``),
S11 (JSON source), S12 (CSV source) from SURVEY §2.1; reference
sites ``api/routers/analytics_routes.py:28``, ``ml_region_prediction.py:46``.

Scans stay fully declarative so Catalyst pushes predicates and prunes
columns into the parquet reader (check ``PushedFilters`` / ``ReadSchema``
in ``df.explain("formatted")``).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Small dimensions we always broadcast in joins (fits executor memory
# at any SF — region/nation are bounded; others scale with SF).
BROADCAST_TABLES = frozenset({"region", "nation"})


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Scan one table. Column pruning/pushdown left to Catalyst.

    ``events.ts`` has shipped as parquet TIMESTAMP(NANOS) (which Spark 4
    only reads as nanos-since-epoch int64 under a legacy conf) and as
    plain ``timestamp[us]``, depending on testdata generation. We adapt
    to whichever dtype the file actually carries and always surface a
    session-local microsecond TimestampType so every downstream consumer
    (and the DuckDB oracles) sees one stable type.

    EXECUTION-AFTER-RESTORE ASSUMPTION (ADVICE r04): the conf overrides
    below are restored in ``finally`` BEFORE the returned DataFrame ever
    executes.  Correctness therefore relies on Spark baking the
    footer-inferred schema into the relation at ``read()`` time — true
    today, and pinned by ``tests/test_readers.py`` (a required gate: it
    exercises all three shipped ts dtypes through this path).  Any
    future change that re-resolves the file schema at ACTION time
    (schema merge, ``REFRESH TABLE``, a lazy file-index rebuild) would
    regress silently — if you touch this function or see a ts-typed
    oracle mismatch, run test_readers.py first.
    """
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    path = os.path.join(sf_dir, f"{name}.parquet")
    if name == "events":
        # Save/restore confs so a scan never permanently mutates a
        # (possibly driver-owned) shared session.
        confs = {
            # TIMESTAMP(NANOS) variant: read as epoch-nanos int64.
            "spark.sql.legacy.parquet.nanosAsLong": "true",
            # timestamp[us] isAdjustedToUTC=false variant: read directly
            # as TimestampType (stored micros = UTC instants) instead of
            # TIMESTAMP_NTZ, keeping one stable downstream type and full
            # filter pushdown on the scan.
            "spark.sql.parquet.inferTimestampNTZ.enabled": "false",
        }
        prevs = {k: spark.conf.get(k, None) for k in confs}
        for k, v in confs.items():
            spark.conf.set(k, v)
        try:
            df = spark.read.parquet(path)
            ts_type = df.schema["ts"].dataType.typeName()
            if ts_type == "long":
                # TIMESTAMP(NANOS) surfaced as epoch-nanos int64.
                # Integer division: epoch-nanos (~1.7e18) exceed double's
                # 2^53 exact range, so `/ 1000` via double would drift ±1µs.
                return df.withColumn(
                    "ts", F.timestamp_micros(F.expr("CAST(ts DIV 1000 AS BIGINT)"))
                )
            if ts_type == "timestamp_ntz":
                # Defensive: normalize NTZ → session-UTC TimestampType so
                # filters, date_format, and the oracle hash-compare agree.
                return df.withColumn("ts", F.col("ts").cast("timestamp"))
            return df  # already TimestampType
        finally:
            for k, prev in prevs.items():
                if prev is None:
                    spark.conf.unset(k)
                else:
                    spark.conf.set(k, prev)
    return spark.read.parquet(path)


def fan_out(df: DataFrame) -> DataFrame:
    """Spread a CPU-heavy map pipeline across the cluster when its
    input's PHYSICAL parallelism is below the session's core count —
    the guide §2.5 "repartition immediately after the read" remedy
    for unsplittable inputs, made conditional so it is a no-op at
    real scale.

    Why it exists: the committed testdata ships every table as ONE
    parquet row group, so a scan is one task no matter what
    ``maxPartitionBytes``/``minPartitionNum`` say (byte-ranges of a
    single row group collapse to one non-empty split), and every
    map-heavy stage above it — regex batteries, shingle explodes,
    decimal distance passes — runs on one core while the other 31
    idle.  The same degeneracy appears above ``localCheckpoint``:
    AQE coalesces small-BYTE exchanges to one partition
    (`parallelismFirst` still respects the 1 MB floor), the
    checkpoint freezes that layout, and a fan-out stage reading it
    (prefix-token candidate joins, bucket-pair explodes) serializes.

    At 100 TB inputs carry orders of magnitude more row groups than
    cores and checkpointed frames inherit real shuffle parallelism,
    so the partition check fails and this returns ``df`` untouched —
    the repartition only fires when the frame is provably narrower
    than the cluster, where its round-robin shuffle is by
    construction small (fewer partitions than cores of data).

    CALLER CONTRACT: only wrap frames whose plan below is scans +
    maps + already-materialized checkpoints.  ``df.rdd`` must build
    the physical RDD to read the partition count; over an
    unexecuted exchange (AQE) that would force the stage to run
    early (harmless for timing — still inside the query — but it
    would also freeze the plan).  Apply AFTER pushed filters: an
    exchange between scan and filter would defeat pushdown.

    The contract is now ENFORCED, not docstring-only (ADVICE r14): if
    the optimized logical plan carries a shuffle-inducing node (join,
    aggregate, sort, window, repartition — i.e. the physical plan
    would hold an unexecuted AQE exchange that the ``df.rdd`` probe
    would force and freeze), fan_out declines and returns ``df``
    untouched."""
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    # case-sensitive NODE names — lowercase HOF expressions like
    # aggregate(...)/sort_array(...)/window(...) must not trip this
    unsafe = ("Join", "Aggregate [", "Sort [", "Window [",
              "RepartitionByExpression", "Repartition ", "Deduplicate")
    if any(tok in plan for tok in unsafe):
        return df
    target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df


def register_views(spark: SparkSession, sf_dir: str, prefix: str = "") -> None:
    """Register every table as a temp view for spark.sql paths."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(prefix + name)


def read_json_source(spark: SparkSession, path: str, schema=None) -> DataFrame:
    """S11: JSON file source (reference ml_region_prediction.py:20,50)."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(path)


def read_csv_source(spark: SparkSession, path: str, schema=None) -> DataFrame:
    """S12: CSV source with header (reference ml_region_prediction.py:46)."""
    reader = spark.read.option("header", "true")
    if schema is not None:
        reader = reader.schema(schema)
    else:
        reader = reader.option("inferSchema", "true")
    return reader.csv(path)
