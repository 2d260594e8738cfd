"""Pure-Python exact-decimal Lloyd + SemDeDup dominance model.

``dedup_semantic_kmeans`` (built r11, registers r12) rests on three
legs of evidence: the DuckDB oracle (unrolled CTE replay), the
lloyd_kmeans/lloyd_assignments mechanical sync guard, and — with this
module — an INDEPENDENT re-derivation with zero Spark and zero SQL in
the derivation path, the ``test_simhash_model`` treatment (VERDICT
r10 item 4 precedent).  The model re-implements, from the operator
docstrings' stated recipes alone:

* the exact-decimal Lloyd loop (``operators/similarity.py``):
  float → double → DECIMAL(12,8) via the shortest round-trip decimal
  string HALF_UP-quantized (Java ``Double.toString`` ≡ Python
  ``repr`` for round-trip-shortest forms; both sides of the certified
  Spark↔DuckDB parity already rely on this conversion), exact-decimal
  squared-L2 sums, (dist, cluster) lexicographic argmin, centroid
  recompute as double division of the exact component sum HALF_UP-
  requantized to DECIMAL(12,8);
* the SemDeDup composition (``plans/llmdata.py``): the +0.02 planted
  twins over vec_id % 20 == 0 with the data-derived 1e6 namespace
  offset, l2-normalization and cosine as SEQUENTIAL left folds in
  IEEE double (F.aggregate's in-array-order recurrence — Python
  floats are the same doubles), round-to-6 HALF_UP, the ε=0.9 gate,
  and the order-free DOMINANCE drop rule (dropped iff ANY smaller-id
  in-cluster ε-neighbor).

Every comparison below is on INTEGER outputs (assignments, member
counts, pair counts) or on decimals quantized well above double noise
— no approximate assertions.
"""

from __future__ import annotations

import math
from collections import defaultdict
from decimal import ROUND_HALF_UP, Decimal, localcontext
from functools import reduce

import pyarrow.parquet as pq
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

from tests.conftest import SF_SMALL

H = settings(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)

# ---------------------------------------------------------------------------
# Model primitives
# ---------------------------------------------------------------------------


def _dec8(x: float) -> Decimal:
    """double → DECIMAL(12,8), the operator's conversion: shortest
    round-trip decimal form (Double.toString / repr), HALF_UP to 8dp."""
    return Decimal(repr(float(x))).quantize(Decimal("1e-8"), ROUND_HALF_UP)


def _round6(x: float) -> Decimal:
    return Decimal(repr(float(x))).quantize(Decimal("1e-6"), ROUND_HALF_UP)


def _load_embeddings(sf_dir: str):
    t = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    ids = t.column("vec_id").to_pylist()
    vecs = t.column("embedding").to_pylist()
    # float32 parquet elements upcast to Python float = the cast("double")
    return {i: [float(x) for x in v] for i, v in zip(ids, vecs)}


def _lloyd_python(corpus: dict[int, list[float]], k: int, iterations: int):
    """(assignments, centroids): the exact-decimal Lloyd loop of
    operators/similarity.py re-derived.  centroids maps cluster →
    (list[Decimal cval], n_members) AFTER the last recompute."""
    with localcontext() as ctx:
        ctx.prec = 60
        cells = {vid: [_dec8(x) for x in v] for vid, v in corpus.items()}
        seeds = sorted(cells)[:k]
        cents = {c: (list(cells[vid]), None) for c, vid in enumerate(seeds)}
        assign: dict[int, int] = {}
        for _ in range(iterations):
            assign = {}
            for vid, vals in cells.items():
                best = min(
                    (
                        sum(
                            (val - cval) * (val - cval)
                            for val, cval in zip(vals, cvals)
                        ),
                        c,
                    )
                    for c, (cvals, _) in cents.items()
                )
                assign[vid] = best[1]
            members = defaultdict(list)
            for vid, c in assign.items():
                members[c].append(vid)
            cents = {}
            for c, vids in members.items():
                n = len(vids)
                dim = len(next(iter(cells.values())))
                cvals = []
                for pos in range(dim):
                    exact = sum(cells[vid][pos] for vid in vids)
                    cvals.append(_dec8(float(exact) / n))
                cents[c] = (cvals, n)
        return assign, cents


def _normalize(v: list[float]) -> list[float]:
    # l2_norm: sequential left fold of x*x from 0.0, then sqrt —
    # math.sqrt is the same correctly-rounded IEEE op as the JVM's
    n = math.sqrt(reduce(lambda acc, e: acc + e, (x * x for x in v), 0.0))
    return [x / n for x in v]


def _dot(a: list[float], b: list[float]) -> float:
    return reduce(lambda acc, e: acc + e, (x * y for x, y in zip(a, b)), 0.0)


def _semdedup_python(sf_dir: str):
    """dedup_semantic_kmeans's full output re-derived: rows of
    (cluster, n_members, n_dup_pairs, n_dropped, n_kept)."""
    base = _load_embeddings(sf_dir)
    off = max(1_000_000, max(base) + 1)
    corpus = dict(base)
    for vid, v in base.items():
        if vid % 20 == 0:
            corpus[vid + off] = [x * 1.0 + 0.02 for x in v]
    assign, _ = _lloyd_python(corpus, k=4, iterations=3)
    normalized = {vid: _normalize(v) for vid, v in corpus.items()}
    members = defaultdict(list)
    for vid, c in assign.items():
        members[c].append(vid)
    out = {}
    for c, vids in members.items():
        vids = sorted(vids)
        pairs = 0
        dropped = set()
        for j, id_b in enumerate(vids):
            for id_a in vids[:j]:
                cos = _round6(_dot(normalized[id_a], normalized[id_b]))
                if cos >= Decimal("0.9"):
                    pairs += 1
                    dropped.add(id_b)
        out[c] = (len(vids), pairs, len(dropped), len(vids) - len(dropped))
    return out


# ---------------------------------------------------------------------------
# Spark cross-checks
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def py_corpus():
    return _load_embeddings(SF_SMALL)


def test_lloyd_assignments_match_python_model(spark, sf_dir, py_corpus):
    """Every (vid, cluster) of the Spark loop equals the model's —
    the INTEGER output, no rounding tolerance anywhere."""
    from real_estate_etl_dev_spark.operators.similarity import lloyd_assignments
    from real_estate_etl_dev_spark.sources.readers import load_table

    expect, _ = _lloyd_python(py_corpus, k=4, iterations=3)
    got = {
        r["vid"]: r["cluster"]
        for r in lloyd_assignments(
            load_table(spark, sf_dir, "embeddings"), k=4, iterations=3
        ).collect()
    }
    assert got == expect


def test_lloyd_kmeans_centroids_match_python_model(spark, sf_dir, py_corpus):
    """Centroid cells and member counts, cell for cell: the model's
    DECIMAL(12,8) centroid rounded to 6dp equals Spark's ``c``."""
    from real_estate_etl_dev_spark.operators.similarity import lloyd_kmeans
    from real_estate_etl_dev_spark.sources.readers import load_table

    _, cents = _lloyd_python(py_corpus, k=4, iterations=3)
    expect = {
        (c, pos): (_round6(float(cval)), n)
        for c, (cvals, n) in cents.items()
        for pos, cval in enumerate(cvals)
    }
    got = {
        (r["cluster"], r["pos"]): (_round6(r["c"]), r["n_members"])
        for r in lloyd_kmeans(
            load_table(spark, sf_dir, "embeddings"), k=4, iterations=3
        ).collect()
    }
    assert got == expect


@given(
    xs=st.lists(
        st.floats(min_value=-999, max_value=999, allow_nan=False),
        min_size=1,
        max_size=8,
    )
)
@H
def test_dec8_and_round6_match_spark_casts(spark, xs):
    """The model's riskiest assumption, property-pinned: Python
    ``repr`` (shortest round-trip decimal) HALF_UP-quantized equals
    Spark's double → DECIMAL(12,8) cast and F.round(x, 6) for
    arbitrary doubles in the embedding magnitude range — including
    hypothesis-found near-tie values, where a divergent conversion
    recipe would first show."""
    df = spark.createDataFrame([(float(x),) for x in xs], "x double")
    got = df.select(
        F.col("x").cast("decimal(12,8)").alias("d8"),
        F.round(F.col("x"), 6).alias("r6"),
    ).collect()
    for x, r in zip(xs, got):
        assert r["d8"] == _dec8(x), (x, r["d8"])
        assert _round6(r["r6"]) == _round6(x), (x, r["r6"])


def test_semdedup_kmeans_matches_python_model(spark, sf_dir):
    """The composition end to end: cluster sizes, qualifying-pair
    counts, dominance-dropped counts, and keeps — all integers —
    against the zero-Spark derivation."""
    from real_estate_etl_dev_spark.plans.llmdata import dedup_semantic_kmeans

    expect = _semdedup_python(SF_SMALL)
    got = {
        r["cluster"]: (r["n_members"], r["n_dup_pairs"], r["n_dropped"], r["n_kept"])
        for r in dedup_semantic_kmeans(spark, SF_SMALL).collect()
    }
    assert got == expect
