"""Four-leg evidence for the r16-deferred `dedup_substring_spans`
(plans/llmdata.py — see the deferral note above the function):

  leg 1  oracle parity at BOTH local scales;
  leg 2  a pure-Python model (zero Spark, zero SQL) that computes the
         duplicated span mass the INDEPENDENT way — materializing the
         covered-position set per doc instead of the lag-window
         telescoping sum — plus a planted shared-span corpus with
         hand-computed expectations (cross-doc span, within-doc
         repeat, all-unique doc, sub-L doc);
  leg 3  the plan pin lives in tests/test_plan_shapes.py
         (test_substring_spans_plan_shape) + PLANS.md;
  leg 4  the growth probe lives in scripts/scale_probe.py
         (substring_spans_growth_probe).
"""

import os
from collections import Counter, defaultdict

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

# constants imported, never re-hardcoded: a re-tune of the span length
# or the occurrence threshold must break HERE as a constant drift
from real_estate_etl_dev_spark.plans.llmdata import (  # noqa: E402
    _SPAN_L as _L,
    _SPAN_MIN_OCC as _MIN_OCC,
)


def _model_spans(sf_dir: str):
    """Pure-Python re-derivation.  Deliberately different formulation
    from the Spark plan: gram keys are raw token TUPLES (no md5) and
    per-doc duplicated mass is the SIZE OF THE UNION of covered
    positions (a set), not the sorted-lag telescoping sum — so an
    interval-arithmetic bug in the plan cannot be mirrored here."""
    t = pq.read_table(f"{sf_dir}/documents.parquet")
    rows = list(
        zip(
            t.column("doc_id").to_pylist(),
            t.column("text").to_pylist(),
            t.column("lang").to_pylist(),
        )
    )
    off = max(1_000_000, max(i for i, _, _ in rows) + 1)
    corpus = rows + [
        (i + off, s, lg) for i, s, lg in rows if i % 7 == 0
    ]
    occ = Counter()
    toks_by = {}
    for i, s, lg in corpus:
        toks = (s or "").lower().split(" ")
        toks_by[i] = (toks, lg)
        for p in range(len(toks) - _L + 1):
            occ[tuple(toks[p : p + _L])] += 1
    base = defaultdict(lambda: [0, 0])
    dupa = defaultdict(lambda: [0, 0])
    for i, (toks, lg) in toks_by.items():
        base[lg][0] += 1
        base[lg][1] += len(toks)
        covered = set()
        for p in range(len(toks) - _L + 1):
            if occ[tuple(toks[p : p + _L])] >= _MIN_OCC:
                covered.update(range(p, p + _L))
        if covered:
            dupa[lg][0] += 1
            dupa[lg][1] += len(covered)
    return {
        lg: (lg, base[lg][0], dupa[lg][0], base[lg][1], dupa[lg][1])
        for lg in base
    }


def test_substring_spans_oracle_parity(spark, sf_dir, oracle_sf_dir):
    """Leg 1: the exact compare the catalog row will certify when the
    operator takes an r15+ replacement slot, run at BOTH scales."""
    from real_estate_etl_dev_spark.plans.llmdata import (
        _substring_spans_oracle_sql,
        dedup_substring_spans,
    )

    from tests.oracle_harness import compare

    for d in (sf_dir, oracle_sf_dir):
        problems = compare(
            spark, d, dedup_substring_spans, _substring_spans_oracle_sql()
        )
        assert not problems, f"{d}: " + "; ".join(problems)


def test_substring_spans_python_model(spark, sf_dir, oracle_sf_dir):
    """Leg 2a: every integer cell re-derived by the set-union model
    from the parquet bytes must equal the Spark plan's output (the
    ratio is checked as the exact division of those integers)."""
    from real_estate_etl_dev_spark.plans.llmdata import dedup_substring_spans

    for d in (sf_dir, oracle_sf_dir):
        model = _model_spans(d)
        got = {
            r["lang"]: (
                r["lang"],
                r["n_docs"],
                r["docs_with_dup"],
                r["tokens_total"],
                r["tokens_dup"],
            )
            for r in dedup_substring_spans(spark, d).collect()
        }
        assert got == model, f"{d}: spark={got} model={model}"


def test_substring_spans_planted(spark, tmp_path):
    """Leg 2b: hand-computed expectations on a planted corpus — the
    semantics the committed fixtures can't isolate.  Doc 1 and doc 2
    share a 12-token run in unique context (each must contribute
    EXACTLY 12 duplicated tokens: 5 overlapping 8-gram intervals
    union to one 12-token span); doc 4 repeats an 8-token phrase
    twice WITHIN itself (within-doc repeats count, as in Lee et al.
    -> 16); doc 3 is all-unique (0); doc 5 has fewer than L tokens
    (no positions, counted in n_docs/tokens_total only).  Spark,
    oracle, and model must all agree on the same numbers."""
    from real_estate_etl_dev_spark.plans.llmdata import (
        _substring_spans_oracle_sql,
        dedup_substring_spans,
    )
    from real_estate_etl_dev_spark.sources.readers import TABLES

    from tests.conftest import SF_SMALL
    from tests.oracle_harness import compare

    shared = " ".join(f"s{j}" for j in range(12))
    phrase = " ".join(f"r{j}" for j in range(8))
    texts = {
        1: f"a1 a2 a3 {shared} a4 a5",            # 17 toks, 12 dup
        2: f"b1 b2 {shared} b3 b4 b5 b6",         # 18 toks, 12 dup
        3: " ".join(f"c{j}" for j in range(20)),  # 20 toks, 0 dup
        4: f"{phrase} x1 {phrase} y1",            # 18 toks, 16 dup
        5: "d1 d2 d3 d4 d5",                      # 5 toks, sub-L
    }
    tbl = pa.table(
        {
            "doc_id": pa.array(sorted(texts), type=pa.int64()),
            "text": pa.array([texts[i] for i in sorted(texts)]),
            "lang": pa.array(["en"] * len(texts)),
            "source": pa.array(["synthetic"] * len(texts)),
            "n_chars": pa.array(
                [len(texts[i]) for i in sorted(texts)], type=pa.int64()
            ),
        }
    )
    d = str(tmp_path / "spans")
    os.makedirs(d, exist_ok=True)
    pq.write_table(tbl, f"{d}/documents.parquet")
    for name in TABLES:
        if name != "documents":
            os.symlink(f"{SF_SMALL}/{name}.parquet", f"{d}/{name}.parquet")

    problems = compare(
        spark, d, dedup_substring_spans, _substring_spans_oracle_sql()
    )
    assert not problems, "; ".join(problems)

    rows = dedup_substring_spans(spark, d).collect()
    assert len(rows) == 1
    r = rows[0]
    expect = ("en", 5, 3, 17 + 18 + 20 + 18 + 5, 12 + 12 + 16)
    got = (r["lang"], r["n_docs"], r["docs_with_dup"],
           r["tokens_total"], r["tokens_dup"])
    assert got == expect, (got, expect)
    assert r["dup_token_ratio"] == pytest.approx(40 / 78, abs=1e-6)
    assert _model_spans(d)["en"] == expect
