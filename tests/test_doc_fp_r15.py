r"""Evidence for the STAGED r15 `doc_fingerprints` swap (see the
staging block in plans/llmdata.py and the exit plan recorded in
tests/test_regex_semantics_audit.py BACKSLASH_S_ALLOWED):

  1. the staged pair (explicit whitespace class on BOTH engines) is
     oracle-parity green at both local scales;
  2. it is output-IDENTICAL to the certified pair on every committed
     fixture (the swap is behavior-preserving where certified rows
     have ever been graded);
  3. on a planted-\x0B corpus the CERTIFIED pair diverges (Java \s
     collapses vertical tab, RE2 \s does not — the audit's premise)
     while the staged pair agrees — the fix fixes the actual bug.
"""

import os

import pyarrow as pa
import pyarrow.parquet as pq


def _vtab_corpus(tmp_path):
    """documents table where half the docs carry a vertical tab
    between words — the code point Java \\s and RE2 \\s disagree on."""
    from real_estate_etl_dev_spark.sources.readers import TABLES

    from tests.conftest import SF_SMALL

    rows = {}
    for i in range(20):
        sep = "\x0b" if i % 2 == 0 else " "
        rows[i] = f"alpha{sep}beta  gamma{i}"
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
    d = str(tmp_path / "vtab")
    os.makedirs(d, exist_ok=True)
    pq.write_table(tbl, f"{d}/documents.parquet")
    for name in TABLES:
        if name != "documents":
            os.symlink(f"{SF_SMALL}/{name}.parquet", f"{d}/{name}.parquet")
    return d


def test_staged_pair_parity_both_scales(spark, sf_dir, oracle_sf_dir):
    from real_estate_etl_dev_spark.plans.llmdata import (
        _DOC_FP_ORACLE_R15,
        _doc_fingerprints_r15,
    )

    from tests.oracle_harness import compare

    for d in (sf_dir, oracle_sf_dir):
        problems = compare(spark, d, _doc_fingerprints_r15, _DOC_FP_ORACLE_R15)
        assert not problems, f"{d}: " + "; ".join(problems)


def test_staged_identical_to_certified_on_fixtures(spark, sf_dir, oracle_sf_dir):
    from real_estate_etl_dev_spark.plans.llmdata import (
        _doc_fingerprints_r15,
        doc_fingerprints,
    )

    for d in (sf_dir, oracle_sf_dir):
        old = doc_fingerprints(spark, d)
        new = _doc_fingerprints_r15(spark, d)
        assert old.exceptAll(new).isEmpty() and new.exceptAll(old).isEmpty(), d


def test_certified_diverges_staged_agrees_on_vtab(spark, tmp_path):
    from real_estate_etl_dev_spark.plans.catalog import CATALOG
    from real_estate_etl_dev_spark.plans.llmdata import (
        _DOC_FP_ORACLE_R15,
        _doc_fingerprints_r15,
    )

    from tests.oracle_harness import compare

    d = _vtab_corpus(tmp_path)
    cert = CATALOG["doc_fingerprints"]
    cert_problems = compare(spark, d, cert.fn, cert.oracle)
    assert cert_problems, (
        "expected the certified bare-\\s pair to diverge on \\x0B input "
        "(the audit premise) — it no longer does; re-check the allowlist"
    )
    staged_problems = compare(
        spark, d, _doc_fingerprints_r15, _DOC_FP_ORACLE_R15
    )
    assert not staged_problems, "; ".join(staged_problems)
    # and the staged fingerprints actually collapse the vertical tab:
    # a \x0B doc and its space twin must share a fingerprint
    fps = {
        r["doc_id"]: r["fp"]
        for r in _doc_fingerprints_r15(spark, d).collect()
    }
    assert fps[0] != fps[1]  # different gammaN suffixes
    import hashlib

    want = hashlib.md5(b"alpha beta gamma0").hexdigest()[:16]
    assert fps[0] == want
