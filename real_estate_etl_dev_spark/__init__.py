"""real_estate_etl_dev_spark — a PySpark-native analytics engine.

A brand-new, idiomatic-Spark engine with the same query and
data-processing capabilities as the reference real-estate ETL
(``ekkyarmandi/real-estate-etl-dev``), re-expressed as declarative
DataFrame plans so Catalyst/Tungsten/AQE pick the physical strategy.

Layout
------
- ``sources``    — typed readers for the parquet/json/csv zones
- ``functions``  — the scalar extraction library (SURVEY §2.8) as
                   Column builders + the pandas-UDF tier
- ``operators``  — merge engine, DQ rules, dedup, similarity,
                   text analysis, analytics queries
- ``plans``      — the query catalog wired into __spark_entry__.py
- ``streaming``  — Structured Streaming variants (SURVEY §2.12)
- ``ml``         — pyspark.ml region-prediction analog (SURVEY §2.11)

Designed for a 1000-executor cluster on ~100 TB: broadcast small
dimensions, pre-filter null join keys, salt skewed keys, keep
expressions JVM-side (whole-stage codegen), push filters to parquet.
Tested on local[32] at sf0.001..0.1.
"""

__version__ = "0.1.0"
