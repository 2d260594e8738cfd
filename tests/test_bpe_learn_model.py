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


def test_fold_recipe_is_shared():
    """The r14 unification's wiring: the learner's normalization and
    the applier's ``bpe_fold`` are the SAME definition, not parallel
    copies — the model above, the shared Spark class, and the
    learner's oracle SQL all spell the identical pre-strip set (and
    the live plan-identity of the refactored learner vs its certified
    r13 text was verified at the swap; this pins the single-source
    invariant going forward)."""
    from real_estate_etl_dev_spark.functions.bpe import (
        _PRESTRIP_CLASS,
        _PRESTRIP_CLASS_SQL,
        BPE_PRESTRIP_CODEPOINTS,
    )
    from real_estate_etl_dev_spark.plans.llmdata import _bpe_learn_oracle_sql

    # the model's class (line 25) == the shared constant
    assert _PRESTRIP_CLASS == "[_\n\r\u0085\u2028\u2029]"
    assert "".join(BPE_PRESTRIP_CODEPOINTS) == _PRESTRIP_CLASS[1:-1]
    # the learner's DuckDB oracle embeds the exact RE2 spelling of it
    assert _PRESTRIP_CLASS_SQL in _bpe_learn_oracle_sql()


def test_learn_apply_composes_on_mixed_case(spark):
    """VERDICT r13 item 3 executed: the learn → apply chain on a
    MIXED-CASE corpus, with no caveat escape hatch — the learner folds
    case, and the applier's ``fold=True`` applies the same shared
    recipe, so a learned table composes on text the committed
    lowercase fixtures never exercised.  Three pins: (1) Spark
    ``bpe_token_count(merges=learned, fold=True)`` on the RAW
    mixed-case text equals a pure-Python replay of fold + render +
    merges; (2) the DuckDB twin (``bpe_tokenized_sql`` with the same
    merges/fold) equals it too — cross-engine exact; (3) the fold is
    load-bearing: applying the learned table WITHOUT fold yields a
    different (larger) count on this corpus, i.e. the pre-r14 caveat
    was a real composition hazard, not a theoretical one."""
    import duckdb
    from pyspark.sql import functions as F

    from real_estate_etl_dev_spark.functions.bpe import (
        bpe_token_count,
        bpe_token_count_sql,
        bpe_tokenized_sql,
    )

    texts = [
        "The Theater THE these",
        "Another OTHER the Thorough",
        "THE THE the Rother",
        "other brother The\u2028THEME",  # line separator exercises the strip
        "Then_the Tether THE",  # literal '_' exercises the strip
    ]
    rounds = 4
    learned = _learn_python(texts, rounds)
    merges = [(a, b) for _, a, b, _ in learned]
    assert merges and any(
        any(c.isupper() for c in t) for t in texts
    ), "fixture must be mixed-case"

    # pure-Python replay: fold (lower + strip) then render + merges
    strip = "[_\n\r\u0085\u2028\u2029]"

    def replay(fold: bool) -> int:
        total = 0
        for s in texts:
            if fold:
                s = re.sub(strip, " ", s.lower())
            m = "".join(f"_{c}_" for c in s)
            for a, b in merges:
                m = m.replace(f"_{a}__{b}_", f"_{a}{b}_")
            total += m.count("_") // 2
        return total

    want = replay(fold=True)

    df = spark.createDataFrame([(t,) for t in texts], ["text"])
    got = df.select(
        F.sum(bpe_token_count(F.col("text"), merges=merges, fold=True))
        .cast("long")
        .alias("n")
    ).collect()[0]["n"]
    assert got == want and want > 0

    con = duckdb.connect()
    try:
        con.execute("CREATE TABLE t (text VARCHAR)")
        con.executemany("INSERT INTO t VALUES (?)", [(t,) for t in texts])
        merged = bpe_tokenized_sql("text", merges=merges, fold=True)
        duck = con.execute(
            f"SELECT sum(n) FROM (SELECT {bpe_token_count_sql(f'({merged})')}"
            " AS n FROM t)"
        ).fetchone()[0]
    finally:
        con.close()
    assert int(duck) == want

    # the fold is load-bearing: unfolded application diverges here
    got_nofold = df.select(
        F.sum(bpe_token_count(F.col("text"), merges=merges, fold=False))
        .cast("long")
        .alias("n")
    ).collect()[0]["n"]
    assert got_nofold != want
