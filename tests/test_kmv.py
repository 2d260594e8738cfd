"""Four-leg evidence for the r15-deferred `dataset_overlap_kmv`
(plans/llmdata.py — see the deferral note above the function):

  leg 1  oracle parity at BOTH local scales;
  leg 2  a pure-Python model (zero Spark, zero SQL) re-deriving every
         output cell, plus the under-full-sketch exactness invariant
         and the tau-filter losslessness proof on live data;
  leg 3  the plan pin lives in tests/test_plan_shapes.py
         (test_kmv_overlap_plan_shape) + PLANS.md;
  leg 4  the growth probe lives in scripts/scale_probe.py
         (kmv_overlap_growth_probe).
"""

from __future__ import annotations

import hashlib

import pyarrow.parquet as pq

from real_estate_etl_dev_spark.plans.llmdata import _KMV_K as _K


def _h(text: str) -> int:
    """The operator's content hash: first 15 hex digits of md5 as an
    integer (operators/bloom.py:md5_key)."""
    return int(hashlib.md5(text.encode()).hexdigest()[:15], 16)


def _est(sketch: list[int], k: int) -> float:
    """kmv_estimate's guarded expression, pure Python: exact when the
    sketch is under-full, else (k-1) / U_(k)."""
    if len(sketch) < k:
        return float(len(sketch))
    return (k - 1) * (float(2**60) / float(max(sketch)))


def _model_overlap(sf_dir: str, k: int = _K) -> dict:
    t = pq.read_table(f"{sf_dir}/documents.parquet")
    ids = t.column("doc_id").to_pylist()
    texts = t.column("text").to_pylist()
    ha = {_h(s) for i, s in zip(ids, texts) if i % 3 != 0}
    hb = {_h(s) for i, s in zip(ids, texts) if i % 2 != 0}
    ska = sorted(ha)[:k]
    skb = sorted(hb)[:k]
    comb = sorted(set(ska) | set(skb))[:k]
    matches = sum(1 for h in comb if h in set(ska) and h in set(skb))
    union = ha | hb
    inter = ha & hb
    return {
        "k": k,
        "est_distinct_a": round(_est(ska, k), 4),
        "exact_distinct_a": len(ha),
        "est_distinct_b": round(_est(skb, k), 4),
        "exact_distinct_b": len(hb),
        "est_distinct_union": round(_est(comb, k), 4),
        "exact_distinct_union": len(union),
        "sketch_matches": matches,
        "est_jaccard": round(matches / len(comb), 6),
        "exact_jaccard": round(len(inter) / len(union), 6),
    }


def test_kmv_overlap_oracle_parity(spark, sf_dir, oracle_sf_dir):
    """Leg 1: the exact compare the catalog row will certify when the
    operator takes an r15+ replacement slot, run at BOTH local
    scales."""
    from real_estate_etl_dev_spark.plans.llmdata import (
        _kmv_overlap_oracle_sql,
        dataset_overlap_kmv,
    )

    from tests.oracle_harness import compare

    for d in (sf_dir, oracle_sf_dir):
        problems = compare(
            spark, d, dataset_overlap_kmv, _kmv_overlap_oracle_sql()
        )
        assert not problems, f"{d}: " + "; ".join(problems)


def test_kmv_python_model(spark, sf_dir, oracle_sf_dir):
    """Leg 2: every output cell re-derived in pure Python from the
    parquet bytes must equal the Spark row, both scales — including
    the under-full B-slice branch (250 distinct < k = 256 at the
    certification fixtures), where the model asserts the estimator
    IS the exact count."""
    from real_estate_etl_dev_spark.plans.llmdata import dataset_overlap_kmv

    for d in (sf_dir, oracle_sf_dir):
        model = _model_overlap(d)
        # the committed cert fixtures exercise BOTH estimator branches
        assert model["exact_distinct_b"] < _K  # under-full => exact
        assert model["est_distinct_b"] == float(model["exact_distinct_b"])
        assert model["exact_distinct_a"] > _K  # estimator branch live
        [row] = dataset_overlap_kmv(spark, d).collect()
        got = row.asDict()
        assert got == model, f"{d}: spark={got} model={model}"


def test_kmv_estimates_are_accurate(spark, sf_dir):
    """The estimator is worth certifying only if it estimates: at the
    committed fixtures every KMV estimate must sit within 15% of its
    exact audit column (k = 256 gives ~1/sqrt(k-1) ≈ 6.3% standard
    error; 15% is ~2.4 sigma), and the sketch-Jaccard within 0.1
    absolute of the exact Jaccard."""
    from real_estate_etl_dev_spark.plans.llmdata import dataset_overlap_kmv

    [row] = dataset_overlap_kmv(spark, sf_dir).collect()
    for side in ("a", "b", "union"):
        est, exact = row[f"est_distinct_{side}"], row[f"exact_distinct_{side}"]
        assert abs(est - exact) <= 0.15 * exact, (side, est, exact)
    assert abs(row["est_jaccard"] - row["exact_jaccard"]) <= 0.1, row


def test_kmv_tau_filter_is_lossless(spark, sf_dir):
    """The 100 TB scale path: kmv_sketch(tau < 1) pre-filters the
    hash stream BEFORE the distinct exchange.  While at least k
    distinct values survive the cut, the filtered sketch is
    bit-identical to the unfiltered one (the k smallest values are
    each below any threshold that admits >= k of them).  Proven here
    on live data with a tau chosen from the data to sit just above
    the k-th value; the 16x growth probe re-asserts it at every
    replication size."""
    from pyspark.sql import functions as F

    from real_estate_etl_dev_spark.operators.bloom import (
        KMV_SPACE,
        kmv_sketch,
    )
    from real_estate_etl_dev_spark.sources.readers import load_table

    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("doc_id") % 3 != 0
    )
    full = [r["h"] for r in kmv_sketch(docs, "text", _K).collect()]
    assert len(full) == _K
    tau = (max(full) * 1.001) / KMV_SPACE  # admits exactly the k-min set
    cut = [r["h"] for r in kmv_sketch(docs, "text", _K, tau=tau).collect()]
    assert cut == full
    # and a too-aggressive tau under-fills rather than corrupting: the
    # survivors are still a PREFIX of the true k-min set
    tau_small = (full[_K // 2] * 1.001) / KMV_SPACE
    part = [r["h"] for r in kmv_sketch(docs, "text", _K, tau=tau_small).collect()]
    assert part == full[: len(part)] and 0 < len(part) < _K
