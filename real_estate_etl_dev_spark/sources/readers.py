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

    ``events.ts`` is a parquet TIMESTAMP(NANOS) column, which Spark 4
    rejects outright; we read it as nanos-since-epoch (legacy conf) and
    surface a microsecond TimestampType — the precision every consumer
    here needs. DuckDB oracles must likewise truncate when comparing.
    """
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    path = os.path.join(sf_dir, f"{name}.parquet")
    if name == "events":
        # Save/restore the legacy conf so a scan never permanently
        # mutates a (possibly driver-owned) shared session.
        key = "spark.sql.legacy.parquet.nanosAsLong"
        prev = spark.conf.get(key, None)
        spark.conf.set(key, "true")
        try:
            df = spark.read.parquet(path)
            # Integer division: epoch-nanos (~1.7e18) exceed double's 2^53
            # exact range, so `/ 1000` via double would drift by ±1µs.
            return df.withColumn(
                "ts", F.timestamp_micros(F.expr("CAST(ts DIV 1000 AS BIGINT)"))
            )
        finally:
            if prev is None:
                spark.conf.unset(key)
            else:
                spark.conf.set(key, prev)
    return spark.read.parquet(path)


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
