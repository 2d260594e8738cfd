"""Four-leg evidence for the r14-deferred `dsir_importance_select`
(plans/llmdata.py — see the deferral note above the function):

  leg 1  oracle parity at BOTH local scales;
  leg 2  a pure-Python integer-exact model (zero Spark, zero SQL) —
         plus a planted-relevance semantics check on a handcrafted
         target/raw corpus;
  leg 3  the plan pin lives in tests/test_plan_shapes.py +
         PLANS.md;
  leg 4  the growth probe lives in scripts/scale_probe.py
         (dsir_growth_probe).
"""

import hashlib
import os
from collections import Counter, defaultdict

import pyarrow as pa
import pyarrow.parquet as pq

# module constants imported, never re-hardcoded (a re-tune of the
# bucket count or salt must break HERE as a constant drift, not as a
# wholesale score mismatch); the model's hashing and arithmetic below
# stay pure Python
from real_estate_etl_dev_spark.plans.llmdata import (  # noqa: E402
    _DSIR_BUCKETS as _B,
    _DSIR_SALT as _SALT,
    _DSIR_TOP_K as _TOP_K,
)


def _bucket(g: str) -> int:
    return int(hashlib.md5((_SALT + g).encode()).hexdigest()[:8], 16) % _B


def _grams(text: str):
    toks = text.lower().split(" ")
    return toks + [f"{a} {b}" for a, b in zip(toks, toks[1:])]


def _model_dsir(sf_dir: str):
    """Pure-Python re-derivation: hashed-bucket Laplace counts, the
    integer cross-multiplied weights, occurrence-weighted doc scores,
    per-lang top-k.  Integer arithmetic end to end."""
    t = pq.read_table(f"{sf_dir}/documents.parquet")
    rows = list(
        zip(
            t.column("doc_id").to_pylist(),
            t.column("text").to_pylist(),
            t.column("lang").to_pylist(),
        )
    )
    c_t, c_r = Counter(), Counter()
    doc_buckets = {}
    for i, s, lg in rows:
        bs = [_bucket(g) for g in _grams(s)]
        doc_buckets[i] = bs
        (c_t if i % 31 == 0 else c_r).update(bs)
    tt = sum(c_t.values()) + _B
    rr = sum(c_r.values()) + _B
    lam = {
        b: (c_t[b] + 1) * rr - (c_r[b] + 1) * tt
        for b in set(c_t) | set(c_r)
    }
    by_lang = defaultdict(list)
    for i, _, lg in rows:
        if i % 31 == 0:
            continue
        score = sum(lam[b] for b in doc_buckets[i])
        by_lang[lg].append((score, i))
    out = {}
    for lg, scored in by_lang.items():
        scored.sort(key=lambda t: (-t[0], t[1]))
        out[lg] = [
            (lg, k + 1, i, s) for k, (s, i) in enumerate(scored[:_TOP_K])
        ]
    return out


def test_dsir_oracle_parity(spark, sf_dir, oracle_sf_dir):
    """Leg 1: the exact compare the catalog row will certify when
    DSIR takes an r14+ replacement slot, run at BOTH local scales."""
    from real_estate_etl_dev_spark.plans.llmdata import (
        _dsir_oracle_sql,
        dsir_importance_select,
    )

    from tests.oracle_harness import compare

    for d in (sf_dir, oracle_sf_dir):
        problems = compare(spark, d, dsir_importance_select, _dsir_oracle_sql())
        assert not problems, f"{d}: " + "; ".join(problems)


def test_dsir_python_model(spark, sf_dir, oracle_sf_dir):
    """Leg 2: every ranked row re-derived in pure Python from the
    parquet bytes must equal the Spark plan's output, both scales."""
    from real_estate_etl_dev_spark.plans.llmdata import dsir_importance_select

    for d in (sf_dir, oracle_sf_dir):
        model = _model_dsir(d)
        got = defaultdict(list)
        for r in dsir_importance_select(spark, d).collect():
            got[r["lang"]].append((r["lang"], r["rnk"], r["doc_id"], r["score"]))
        assert dict(got) == model, f"{d}: spark={dict(got)} model={model}"


def test_dsir_planted_relevance(spark, tmp_path):
    """Semantics check the committed fixtures can't give (their target
    split shares the global vocabulary): on a corpus where the target
    docs speak vocabulary A, raw docs speaking A must outrank raw
    docs speaking a disjoint vocabulary B — the whole point of
    importance selection.  Spark, oracle, and model must also agree
    on this handcrafted corpus."""
    from real_estate_etl_dev_spark.plans.llmdata import (
        _dsir_oracle_sql,
        dsir_importance_select,
    )
    from real_estate_etl_dev_spark.sources.readers import TABLES

    from tests.conftest import SF_SMALL
    from tests.oracle_harness import compare

    vocab_a = " ".join(f"alpha{j}" for j in range(14))
    vocab_b = " ".join(f"beta{j}" for j in range(14))
    rows = {}
    for i in range(40):
        if i % 31 == 0:
            rows[i] = vocab_a                       # target: pure A
        elif i % 3 == 0:
            rows[i] = vocab_a + f" tail{i}"         # relevant raw
        else:
            rows[i] = vocab_b + f" tail{i}"         # irrelevant raw
    tbl = pa.table(
        {
            "doc_id": pa.array(sorted(rows), type=pa.int64()),
            "text": pa.array([rows[i] for i in sorted(rows)]),
            "lang": pa.array(["en"] * len(rows)),
            "source": pa.array(["synthetic"] * len(rows)),
            "n_chars": pa.array(
                [len(rows[i]) for i in sorted(rows)], type=pa.int64()
            ),
        }
    )
    d = str(tmp_path / "dsir")
    os.makedirs(d, exist_ok=True)
    pq.write_table(tbl, f"{d}/documents.parquet")
    for name in TABLES:
        if name != "documents":
            os.symlink(f"{SF_SMALL}/{name}.parquet", f"{d}/{name}.parquet")

    problems = compare(spark, d, dsir_importance_select, _dsir_oracle_sql())
    assert not problems, "; ".join(problems)

    model = _model_dsir(d)
    top_ids = [i for (_, _, i, _) in model["en"]]
    relevant = {i for i in rows if i % 31 != 0 and i % 3 == 0}
    assert set(top_ids) <= relevant, (top_ids, relevant)
    # and every relevant raw doc outscores every irrelevant one
    scores = {}
    from collections import Counter

    c_t, c_r = Counter(), Counter()
    for i, s in rows.items():
        (c_t if i % 31 == 0 else c_r).update(_bucket(g) for g in _grams(s))
    tt, rr = sum(c_t.values()) + _B, sum(c_r.values()) + _B
    for i, s in rows.items():
        if i % 31 == 0:
            continue
        scores[i] = sum(
            (c_t[b] + 1) * rr - (c_r[b] + 1) * tt
            for b in (_bucket(g) for g in _grams(s))
        )
    assert min(scores[i] for i in relevant) > max(
        scores[i] for i in scores if i not in relevant
    )


def test_dsir_overflow_guard_fires(spark, sf_dir, monkeypatch):
    """ADVICE r12 item 1: the int64-exact regime bound is now ENFORCED
    in-plan, not just documented.  No feasible fixture can exceed the
    real 2^63 ceiling, so pin the wiring by lowering the module bound
    below the committed fixture's gmax*T*R mass: the job must fail
    fast with the guard's message instead of silently wrapping.  The
    in-bound side (guard present, output unchanged) is covered by the
    parity/model legs above, which run with the real bound."""
    from pyspark.errors.exceptions.captured import SparkRuntimeException

    import real_estate_etl_dev_spark.plans.llmdata as L

    monkeypatch.setattr(L, "_DSIR_INT64_BOUND", 1.0)
    import pytest

    with pytest.raises(SparkRuntimeException, match="overflow int64"):
        L.dsir_importance_select(spark, sf_dir).collect()
