"""Four-leg evidence for the r14-deferred `corpus_curation_funnel`
(plans/llmdata.py — see the deferral note above the function):

  leg 1  oracle parity at BOTH local scales (the exact compare the
         catalog row will certify);
  leg 2  a pure-Python integer-exact model (zero Spark, zero SQL)
         that re-derives every funnel cell from the parquet bytes;
  leg 3  the plan pin lives in PLANS.md;
  leg 4  the growth probe lives in scripts/scale_probe.py
         (curation_funnel_growth_probe).
"""

import hashlib
import re
from collections import defaultdict

import pyarrow.parquet as pq


def _model_funnel(sf_dir: str):
    """Pure-Python re-derivation of the funnel — integer-exact
    (the quality gate is cross-multiplied, never a float ratio), md5
    via hashlib, 8-grams via str.split.  Returns
    {lang: (n_raw, n_quality, n_dedup, n_clean, tokens_clean)} plus
    the per-row flag maps for the planted-invariant assertions."""
    t = pq.read_table(f"{sf_dir}/documents.parquet")
    base = list(
        zip(
            t.column("doc_id").to_pylist(),
            t.column("text").to_pylist(),
            t.column("lang").to_pylist(),
        )
    )
    off = max(1_000_000, max(i for i, _, _ in base) + 1)
    eval_rows = [(i, s) for i, s, _ in base if i % 41 == 0]
    corpus = [(i, s, lg) for i, s, lg in base if i % 41 != 0] + [
        (i + off, s, lg) for i, s, lg in base if i % 7 == 0
    ]

    def grams(s: str):
        toks = s.split(" ")
        return {" ".join(toks[k : k + 8]) for k in range(len(toks) - 7)}

    eval_grams = set()
    for _, s in eval_rows:
        eval_grams |= grams(s)

    feats = {}
    by_fp = defaultdict(list)
    for i, s, lg in corpus:
        toks = s.split(" ")
        n_tok = len(toks)
        alpha = len(s.replace(" ", ""))
        fp = hashlib.md5(
            re.sub(r"\s+", " ", s.lower(), flags=re.ASCII).encode()
        ).hexdigest()
        q = 10 <= n_tok <= 5000 and 2 * n_tok <= alpha <= 12 * n_tok
        feats[i] = (lg, n_tok, fp, q, grams(s))
        if q:
            by_fp[fp].append(i)

    keeper = {fp: min(ids) for fp, ids in by_fp.items()}
    funnel = defaultdict(lambda: [0, 0, 0, 0, 0])
    flags = {}
    for i, (lg, n_tok, fp, q, gs) in feats.items():
        d = q and keeper.get(fp) == i
        hit = not gs.isdisjoint(eval_grams)
        c = d and not hit
        flags[i] = (q, d, hit, c)
        row = funnel[lg]
        row[0] += 1
        row[1] += q
        row[2] += d
        row[3] += c
        row[4] += n_tok if c else 0
    return {lg: tuple(v) for lg, v in funnel.items()}, flags, off, base


def test_curation_funnel_oracle_parity(spark, sf_dir, oracle_sf_dir):
    """Leg 1: the exact compare the catalog row will certify when the
    funnel takes an r14+ replacement slot, run at BOTH local scales
    now so the deferral carries zero correctness risk."""
    from real_estate_etl_dev_spark.plans.llmdata import (
        _curation_funnel_oracle_sql,
        corpus_curation_funnel,
    )

    from tests.oracle_harness import compare

    for d in (sf_dir, oracle_sf_dir):
        problems = compare(
            spark, d, corpus_curation_funnel, _curation_funnel_oracle_sql()
        )
        assert not problems, f"{d}: " + "; ".join(problems)


def test_curation_funnel_python_model(spark, sf_dir, oracle_sf_dir):
    """Leg 2: every funnel cell re-derived in pure Python from the
    parquet bytes must equal the Spark plan's output, both scales."""
    from real_estate_etl_dev_spark.plans.llmdata import corpus_curation_funnel

    for d in (sf_dir, oracle_sf_dir):
        model, _, _, _ = _model_funnel(d)
        got = {
            r["lang"]: (
                r["n_raw"],
                r["n_quality"],
                r["n_dedup"],
                r["n_clean"],
                r["tokens_clean"],
            )
            for r in corpus_curation_funnel(spark, d).collect()
        }
        assert got == model, f"{d}: spark={got} model={model}"


def test_curation_funnel_planted_invariants(spark, sf_dir):
    """The funnel must be monotone per lang, and the planted srcdup
    copy of a quality-passing eval doc is the proof case: its base
    row is held out, so it SURVIVES exact dedup and MUST die at the
    decontamination stage (exact dedup alone cannot decontaminate)."""
    from real_estate_etl_dev_spark.plans.llmdata import corpus_curation_funnel

    rows = corpus_curation_funnel(spark, sf_dir).collect()
    assert rows, "empty funnel"
    for r in rows:
        assert (
            r["n_raw"] >= r["n_quality"] >= r["n_dedup"] >= r["n_clean"] >= 0
        ), f"non-monotone funnel for {r['lang']}: {r}"

    model, flags, off, base = _model_funnel(sf_dir)
    proof = [
        i + off
        for i, _, _ in base
        if i % 41 == 0 and i % 7 == 0 and flags.get(i + off, (0, 0, 0, 0))[1]
    ]
    assert proof, "fixture lost its eval∩srcdup overlap (doc_id % 287 == 0)"
    for pid in proof:
        q, d, hit, c = flags[pid]
        assert d and hit and not c, (
            f"srcdup eval copy {pid} escaped decontamination: "
            f"q={q} d={d} hit={hit} c={c}"
        )
    assert sum(v[3] for v in model.values()) < sum(v[2] for v in model.values())


def test_curation_funnel_boundary_semantics(spark, tmp_path):
    """The committed fixtures pass the quality gate wholesale, so the
    gate boundaries and the stage interactions need a handcrafted
    corpus: gate failures (short / long-token docs), a dup class whose
    members ALL fail the gate (the window's min-over-quality is NULL —
    d must come out false, never null), a dup class with a real keeper
    and a dropped twin, an eval text duplicated verbatim in the corpus
    (survives dedup as its class keeper, dies at decontamination), and
    a doubled-space twin (same NORMALIZED fingerprint as its
    single-space sibling, different raw token stats — dedup must fire
    on the normalized key).  Spark, the DuckDB oracle, and the
    pure-Python model must agree cell for cell."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pqt

    from real_estate_etl_dev_spark.plans.llmdata import (
        _curation_funnel_oracle_sql,
        corpus_curation_funnel,
    )

    from tests.oracle_harness import compare

    good = " ".join(f"tok{i}" for i in range(12))       # 12 tokens, passes
    short = "one two three"                             # < 10 tokens: fails
    longtok = " ".join("x" * 20 for _ in range(12))     # alpha > 12x: fails
    dup = "dup " + good
    rows = {
        0: good + " zeroeval",     # eval split (0 % 41 == 0); also % 7 == 0
        1: short,                  # fails gate; dup class {1, 4, 9}
        2: dup,                    # dup class {2, 3}: keeper
        3: dup,                    #   dropped at dedup
        4: short,
        5: longtok,
        6: good + " unique six",   # keeper of the normalized class {6, 10}
        7: good + " unique sev",   # srcdup source (7 % 7 == 0)
        8: good + " zeroeval",     # eval doc 0's text verbatim in-corpus
        9: short,
        10: (good + " unique six").replace(" ", "  "),  # doubled spaces
        # fully disjoint vocabulary: survives every stage, pinning a
        # NONZERO clean count + tokens_clean (without it every dedup
        # survivor shares an 8-gram with eval doc 0 and the clean
        # stage is only ever tested at 0 == 0)
        12: " ".join(f"free{j}" for j in range(11)),
    }
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
    d = str(tmp_path / "boundary")
    os.makedirs(d, exist_ok=True)
    pqt.write_table(tbl, f"{d}/documents.parquet")
    # the oracle harness registers every fixture table as a view;
    # only documents matters here — link the rest from the small SF
    from tests.conftest import SF_SMALL
    from real_estate_etl_dev_spark.sources.readers import TABLES

    for name in TABLES:
        if name != "documents":
            os.symlink(f"{SF_SMALL}/{name}.parquet", f"{d}/{name}.parquet")

    problems = compare(
        spark, d, corpus_curation_funnel, _curation_funnel_oracle_sql()
    )
    assert not problems, "; ".join(problems)

    model, flags, off, _ = _model_funnel(d)
    got = {
        r["lang"]: (
            r["n_raw"],
            r["n_quality"],
            r["n_dedup"],
            r["n_clean"],
            r["tokens_clean"],
        )
        for r in corpus_curation_funnel(spark, d).collect()
    }
    assert got == model

    # the gate fires on this corpus (unlike the committed fixtures)
    n_raw, n_quality, n_dedup, n_clean, tokens_clean = model["en"]
    assert n_quality < n_raw and n_dedup < n_quality and n_clean < n_dedup
    # the clean stage passes SOMETHING: doc 12's disjoint vocabulary
    # survives every stage and its 11 tokens land in the budget
    assert flags[12] == (True, True, False, True)
    assert n_clean >= 1 and tokens_clean >= 11
    # dup class where every member fails the gate: d false, never null
    for i in (1, 4, 9):
        q, dd, _, c = flags[i]
        assert q is False and not dd and not c
    # dup class {2, 3}: smallest quality survivor keeps
    assert flags[2][1] and not flags[3][1]
    # eval text verbatim in-corpus: keeper of its class (its base eval
    # row is held out; the srcdup copy off+0 has a larger id), decontam
    # must catch what dedup cannot
    assert flags[8][1] and flags[8][2] and not flags[8][3]
    assert not flags[off + 0][1]
    # srcdup exact copy drops at dedup against its base row
    assert flags[7][1] and not flags[off + 7][1]
    # normalized-fingerprint class {6, 10}: the doubled-space twin
    # passes the (raw-token) gate but dedups against its sibling
    assert flags[10][0] and not flags[10][1] and flags[6][1]
