"""Every catalog query with an oracle must hash-match DuckDB — this is
a local mirror of the driver's t2 correctness gate."""

import pytest

from real_estate_etl_dev_spark.plans.catalog import CATALOG

from .oracle_harness import compare

ORACLE_QUERIES = [(n, q) for n, q in sorted(CATALOG.items()) if q.oracle]


@pytest.mark.parametrize("name,q", ORACLE_QUERIES, ids=[n for n, _ in ORACLE_QUERIES])
def test_oracle_parity(spark, sf_dir, name, q):
    problems = compare(spark, sf_dir, q.fn, q.oracle)
    assert not problems, f"{name}: " + "; ".join(problems)


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert df.columns == ["month", "n_orders"]


def test_contract_shape():
    import __spark_entry__ as e

    qs = e.queries()
    os_ = e.oracle_sql()
    assert qs, "queries() must not be empty"
    for name in os_:
        assert name in qs, f"oracle_sql has {name} not in queries()"
