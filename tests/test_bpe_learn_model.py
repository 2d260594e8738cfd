"""Pure-Python model + invariants for ``bpe_learn_merges`` (built
late r11, registered r13 in the window's free slot).

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


def test_learned_table_drops_into_applier_mechanics(spark):
    """The 'drops straight into BPE_MERGES' contract (ADVICE r11),
    pinned mechanically: tokenize the SAME pre-lowercased, pre-stripped
    corpus with the APPLIER's replace-chain recipe
    (functions/bpe.py:bpe_tokenized's exact expression shape) fed the
    LEARNED table, and the resulting engine-side token budget must
    equal a pure-Python replay of render+merges (str.replace is the
    same left-to-right non-overlapping semantics as F.replace).  Any
    drift between the learner's per-round replace and the applier's
    chain — or a violated input precondition — breaks the equality."""
    from pyspark.sql import functions as F

    from real_estate_etl_dev_spark.plans.llmdata import bpe_learn_merges
    from real_estate_etl_dev_spark.sources.readers import load_table

    learned = sorted(
        (r["step"], r["a"], r["b"]) for r in bpe_learn_merges(spark, SF_SMALL).collect()
    )
    merges = [(a, b) for _, a, b in learned]
    assert merges, "learner produced no merges"

    strip = "[_\n\r\u0085\u2028\u2029]"
    docs = load_table(spark, SF_SMALL, "documents")
    pre = F.regexp_replace(F.lower("text"), strip, " ")
    out = F.regexp_replace(pre, "(.)", "_$1_")
    for a, b in merges:
        out = F.replace(out, F.lit(f"_{a}__{b}_"), F.lit(f"_{a}{b}_"))
    n_tokens = (F.length(out) - F.length(F.replace(out, F.lit("_"), F.lit("")))) / 2
    got = docs.select(F.sum(n_tokens).cast("long").alias("n")).collect()[0]["n"]

    t = pq.read_table(f"{SF_SMALL}/documents.parquet")
    want = 0
    for s in t.column("text").to_pylist():
        s = re.sub(strip, " ", s.lower())
        m = "".join(f"_{c}_" for c in s)
        for a, b in merges:
            m = m.replace(f"_{a}__{b}_", f"_{a}{b}_")
        want += m.count("_") // 2
    assert got == want and want > 0
