"""Semantic unit tests for the temporal operators (asof_join,
sessionize) — tie handling, direction, tolerance, left semantics."""

from datetime import datetime

from pyspark.sql import functions as F

from real_estate_etl_dev_spark.operators.asof import asof_join, sessionize


def _ts(s):
    return datetime.fromisoformat(s)


def _frames(spark):
    left = spark.createDataFrame(
        [
            (1, 10, _ts("2024-01-01 00:10:00")),  # after q1/q2 -> q2
            (2, 10, _ts("2024-01-01 00:05:00")),  # tie with q2 -> q2
            (3, 10, _ts("2024-01-01 00:00:30")),  # after q1 only -> q1
            (4, 10, _ts("2023-12-31 23:00:00")),  # before all -> null
            (5, 20, _ts("2024-01-01 09:00:00")),  # other key -> q3
            (6, 30, _ts("2024-01-01 00:00:00")),  # key with no right -> null
        ],
        "event_id long, user_id long, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            (10, _ts("2024-01-01 00:00:00"), 101),
            (10, _ts("2024-01-01 00:05:00"), 102),
            (20, _ts("2024-01-01 08:00:00"), 103),
        ],
        "user_id long, ts timestamp, quote long",
    )
    return left, right


def test_asof_backward(spark):
    left, right = _frames(spark)
    out = asof_join(left, right, on="user_id", payload=["quote"])
    got = {r.event_id: r.r_quote for r in out.collect()}
    assert got == {1: 102, 2: 102, 3: 101, 4: None, 5: 103, 6: None}


def test_asof_forward(spark):
    left, right = _frames(spark)
    out = asof_join(left, right, on="user_id", payload=["quote"], direction="forward")
    got = {r.event_id: r.r_quote for r in out.collect()}
    # forward: nearest right at ts >= left ts; ties still match
    assert got == {1: None, 2: 102, 3: 102, 4: 101, 5: None, 6: None}


def test_asof_tolerance(spark):
    left, right = _frames(spark)
    out = asof_join(
        left, right, on="user_id", payload=["quote"], tolerance_us=60_000_000
    )
    got = {r.event_id: r.r_quote for r in out.collect()}
    # only matches within 60s survive: event 2 (0s) and 3 (30s)
    assert got == {1: None, 2: 102, 3: 101, 4: None, 5: None, 6: None}


def test_asof_preserves_left_rows_and_columns(spark):
    left, right = _frames(spark)
    out = asof_join(left, right, on="user_id", payload=["quote"])
    assert out.count() == left.count()
    assert out.columns == [*left.columns, "r_ts", "r_quote"]


def test_sessionize_gaps_and_ties(spark):
    rows = [
        (1, _ts("2024-01-01 00:00:00")),
        (1, _ts("2024-01-01 00:10:00")),  # 10 min -> same session
        (1, _ts("2024-01-01 01:00:00")),  # 50 min -> new session
        (1, _ts("2024-01-01 01:00:00")),  # tie -> same session
        (2, _ts("2024-01-01 00:00:00")),  # other key restarts at 1
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")
    out = sessionize(df, key="user_id", ts_col="ts", gap_seconds=1800)
    got = sorted((r.user_id, r.ts.isoformat(), r.session_seq) for r in out.collect())
    assert got == [
        (1, "2024-01-01T00:00:00", 1),
        (1, "2024-01-01T00:10:00", 1),
        (1, "2024-01-01T01:00:00", 2),
        (1, "2024-01-01T01:00:00", 2),
        (2, "2024-01-01T00:00:00", 1),
    ]


def test_asof_matches_pandas_merge_asof(spark):
    """Cross-check against an independent implementation: pandas
    merge_asof (backward, allow_exact_matches) on pseudo-random
    data."""
    import random

    import pandas as pd

    rng = random.Random(7)
    left_rows = [
        (i, rng.randrange(5), _ts("2024-01-01 00:00:00").timestamp() + rng.randrange(100_000))
        for i in range(300)
    ]
    right_rows = []
    seen = set()
    for j in range(200):
        k = rng.randrange(5)
        t = _ts("2024-01-01 00:00:00").timestamp() + rng.randrange(100_000)
        if (k, t) in seen:  # unique (key, ts) per the operator contract
            continue
        seen.add((k, t))
        right_rows.append((1000 + j, k, t))

    lpdf = pd.DataFrame(left_rows, columns=["event_id", "user_id", "ts_s"])
    rpdf = pd.DataFrame(right_rows, columns=["quote_id", "user_id", "ts_s"])
    lpdf["ts"] = pd.to_datetime(lpdf.ts_s, unit="s")
    rpdf["ts"] = pd.to_datetime(rpdf.ts_s, unit="s")

    expected = pd.merge_asof(
        lpdf.sort_values("ts"),
        rpdf.sort_values("ts")[["user_id", "ts", "quote_id"]],
        on="ts",
        by="user_id",
        direction="backward",
        allow_exact_matches=True,
    ).set_index("event_id")["quote_id"]

    left = spark.createDataFrame(lpdf[["event_id", "user_id", "ts"]])
    right = spark.createDataFrame(rpdf[["quote_id", "user_id", "ts"]])
    out = asof_join(left, right, on="user_id", payload=["quote_id"])
    got = {r.event_id: r.r_quote_id for r in out.collect()}

    for eid, want in expected.items():
        want = None if pd.isna(want) else int(want)
        assert got[eid] == want, f"event {eid}: got {got[eid]}, want {want}"


def test_cms_sketch_merges_additively(spark):
    """The count-min sketch's load-bearing property: the sketch of a
    union is the cellwise SUM of the parts' sketches (what lets a
    1000-executor build combine map-side and lets per-day sketches
    roll up without rescanning keys)."""
    from real_estate_etl_dev_spark.plans.temporal import _cms_coords

    def cms(df):
        pairs = df.select(F.explode(_cms_coords(F.col("k"))).alias("c")).select(
            "c.d", "c.b"
        )
        return {
            (r.d, r.b): r.cnt
            for r in pairs.groupBy("d", "b").agg(F.count(F.lit(1)).alias("cnt")).collect()
        }

    full = spark.range(0, 500).select((F.col("id") % 37).alias("k"))
    half1 = spark.range(0, 250).select((F.col("id") % 37).alias("k"))
    half2 = spark.range(250, 500).select((F.col("id") % 37).alias("k"))

    merged: dict = {}
    for part in (cms(half1), cms(half2)):
        for cell, n in part.items():
            merged[cell] = merged.get(cell, 0) + n
    assert cms(full) == merged


def test_cms_estimate_never_underestimates(spark):
    """est ≥ exact for EVERY key — the one-sided CMS error bound, on a
    deliberately colliding (width-saturating) key space."""
    from real_estate_etl_dev_spark.plans.temporal import _CMS_SEEDS, _CMS_W, _cms_coords

    df = spark.range(0, 20_000).select((F.col("id") % 3000).alias("k"))
    pairs = df.select(F.explode(_cms_coords(F.col("k"))).alias("c")).select("c.d", "c.b")
    cms = pairs.groupBy("d", "b").agg(F.count(F.lit(1)).alias("cnt"))
    exact = df.groupBy("k").agg(F.count(F.lit(1)).alias("exact_n"))
    probes = exact.select(
        "k", "exact_n", F.explode(_cms_coords(F.col("k"))).alias("c")
    ).select("k", "exact_n", "c.d", "c.b")
    est = (
        probes.join(F.broadcast(cms), ["d", "b"])
        .groupBy("k", "exact_n")
        .agg(F.min("cnt").alias("est"))
    )
    bad = est.filter(F.col("est") < F.col("exact_n")).count()
    assert bad == 0
    # 3000 keys over width 1024 MUST collide somewhere — prove the
    # test exercises the interesting regime, not a collision-free one
    assert est.filter(F.col("est") > F.col("exact_n")).count() > 0
