"""Pure-Python model + invariants for ``bpe_learn_merges`` (built
late r11, registers r13 — see the deferral note in plans/llmdata.py).

The model replays merge learning with zero Spark and zero SQL in the
derivation path: Python strings, ``collections.Counter``, and
``str.replace`` — which replaces non-overlapping occurrences left to
right exactly like the JVM's and DuckDB's ``replace``, the single
semantic the delimited-rendering trick depends on (functions/bpe.py
docstring).  Comparisons are on integer counts and ASCII tokens —
no tolerance anywhere.
"""

from __future__ import annotations

import re
from collections import Counter

import pyarrow.parquet as pq

from tests.conftest import SF_SMALL


def _learn_python(texts: list[str], rounds: int):
    docs = [
        re.sub(r"(.)", r"_\1_", re.sub("[_\n\r\u0085\u2028\u2029]", " ", t.lower()))
        for t in texts
    ]
    out = []
    for step in range(1, rounds + 1):
        counts: Counter = Counter()
        for s in docs:
            t = re.findall(r"_([^_]+)_", s)
            for a, b in zip(t, t[1:]):
                if a != " " and b != " ":
                    counts[(a, b)] += 1
        (a, b), c = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        out.append((step, a, b, c))
        docs = [s.replace(f"_{a}__{b}_", f"_{a}{b}_") for s in docs]
    return out


def _sf_texts(sf_dir: str) -> list[str]:
    return pq.read_table(f"{sf_dir}/documents.parquet", columns=["text"]).column(
        "text"
    ).to_pylist()


def test_bpe_learn_matches_python_model(spark):
    from real_estate_etl_dev_spark.plans.llmdata import (
        _BPE_LEARN_ROUNDS,
        bpe_learn_merges,
    )

    expect = _learn_python(_sf_texts(SF_SMALL), _BPE_LEARN_ROUNDS)
    got = [
        (r["step"], r["a"], r["b"], r["pair_count"])
        for r in bpe_learn_merges(spark, SF_SMALL).collect()
    ]
    assert got == expect


def test_bpe_learn_counts_non_increasing(spark):
    """Merging (a, b) creates pairs (x, ab) whose count is bounded by
    the old count(x, a) ≤ the old argmax, and every surviving pair's
    count can only drop — so the learned pair_count sequence is
    non-increasing in step.  A violation means the greedy argmax or
    the replace pass is broken."""
    from real_estate_etl_dev_spark.plans.llmdata import bpe_learn_merges

    rows = bpe_learn_merges(spark, SF_SMALL).collect()
    counts = [r["pair_count"] for r in rows]
    assert counts == sorted(counts, reverse=True)
    assert all(c > 0 for c in counts)
    # space never merges and steps are dense from 1
    assert [r["step"] for r in rows] == list(range(1, len(rows) + 1))
    assert all(r["a"] != " " and r["b"] != " " for r in rows)
