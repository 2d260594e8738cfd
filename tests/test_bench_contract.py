"""Bench-harness contract tests (VERDICT r03 item 2): one broken query
must degrade to one error entry, never to a run with zero timings or an
unparseable stdout line — BENCH_r03 was a crash artifact (rc=1,
``parsed: null``) because a single AnalysisException killed the loop.
"""

from __future__ import annotations

import json

import bench
from real_estate_etl_dev_spark.plans.catalog import Query


def _ok_query(name):
    def fn(spark, sf_dir):
        return spark.range(3)

    return Query(name, fn, None)


def _boom_query(name):
    def fn(spark, sf_dir):
        raise RuntimeError("synthetic plan failure")

    return Query(name, fn, None)


def test_run_catalog_isolates_failures(spark):
    catalog = {
        "good_a": _ok_query("good_a"),
        "bad": _boom_query("bad"),
        "good_b": _ok_query("good_b"),
    }
    timings, errors, total = bench.run_catalog(spark, "/nonexistent", catalog)
    assert set(timings) == {"good_a", "good_b"}
    assert set(errors) == {"bad"}
    assert "RuntimeError" in errors["bad"]
    assert total >= 0


def test_payload_is_one_parseable_line_with_errors():
    line = bench.build_payload(
        {"good_a": 0.1}, {"bad": "RuntimeError: synthetic"}, 0.2, 0.1
    )
    assert "\n" not in line and len(line) < 1900
    parsed = json.loads(line)
    assert parsed["metric"] == "catalog_total_wall"
    assert parsed["n_queries"] == 1 and parsed["n_errors"] == 1
    assert parsed["errors"] == ["bad"]


def test_payload_never_exceeds_driver_tail():
    """Even a pathological error set must fall back to a short line."""
    huge_errors = {f"query_{i:04d}_{'x' * 40}": "Boom" for i in range(200)}
    timings = {n: 0.5 for n in bench.HEADLINE}
    line = bench.build_payload(timings, huge_errors, 9.9, 0.1)
    assert "\n" not in line and len(line) < 1900
    assert json.loads(line)["n_errors"] == 200
