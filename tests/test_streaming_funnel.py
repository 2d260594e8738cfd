"""Evidence for the r15-deferred `streaming_curation_funnel`
(plans/llmdata.py — see the deferral note above the function):

  leg 1  oracle parity at BOTH local scales — a REAL availableNow
         multi-micro-batch run against the batch-SQL replay;
  leg 2  file-split invariance: the determinism-by-construction claim
         (class accounting over the fp-normalized rendering) tested
         mechanically — one batch vs many batches vs many files must
         produce identical funnel rows;
  leg 3  consistency with the certified batch funnel on the shared
         stateless stages, plus the planted srcdup-of-eval
         contamination proof;
  leg 4  the growth probe lives in scripts/scale_probe.py
         (streaming_funnel_growth_probe).
"""

from __future__ import annotations


def test_streaming_funnel_oracle_parity(spark, sf_dir, oracle_sf_dir):
    """Leg 1: the exact compare the catalog row will certify when the
    operator takes an r15+ replacement slot, both local scales."""
    from real_estate_etl_dev_spark.plans.llmdata import (
        _streaming_funnel_oracle_sql,
        streaming_curation_funnel,
    )

    from tests.oracle_harness import compare

    for d in (sf_dir, oracle_sf_dir):
        problems = compare(
            spark, d, streaming_curation_funnel, _streaming_funnel_oracle_sql()
        )
        assert not problems, f"{d}: " + "; ".join(problems)


def test_streaming_funnel_split_invariance(spark, sf_dir):
    """Leg 2: the stream's funnel counts are a pure function of the
    corpus SET, not of how the file source slices it into
    micro-batches — the class sink admits a (lang, fp) class in
    whichever batch first carries a quality member, and every
    class-level stat is computed over the normalized rendering all
    members share.  One-batch, default, and many-batch runs must
    agree row for row."""
    from real_estate_etl_dev_spark.plans.llmdata import (
        streaming_curation_funnel,
    )

    def rows(parts, fpt):
        return [
            tuple(r)
            for r in streaming_curation_funnel(
                spark, sf_dir, _parts=parts, _files_per_trigger=fpt
            ).collect()
        ]

    single = rows(1, 1)  # everything in ONE micro-batch
    default = rows(4, 2)  # the registered configuration
    sliced = rows(8, 1)  # 8 micro-batches, cross-batch dedup live
    assert single == default == sliced
    assert len(single) > 0


def test_streaming_funnel_matches_batch_stages(spark, sf_dir):
    """Leg 3: the stateless stages are IDENTICAL to the certified
    batch funnel's (same corpus recipe, same integer-exact quality
    gate), and the planted srcdup-of-an-eval-doc classes — which
    exact dedup cannot catch (their base row is the held-out eval
    split, not the corpus) — are provably caught by the
    decontamination stage: contamination drops at least one dedup
    survivor."""
    from real_estate_etl_dev_spark.plans.llmdata import (
        corpus_curation_funnel,
        streaming_curation_funnel,
    )

    batch = {
        r["lang"]: (r["n_raw"], r["n_quality"])
        for r in corpus_curation_funnel(spark, sf_dir).collect()
    }
    stream_rows = streaming_curation_funnel(spark, sf_dir).collect()
    stream = {r["lang"]: (r["n_raw"], r["n_quality"]) for r in stream_rows}
    assert stream == batch

    dropped = sum(r["n_dedup"] - r["n_clean"] for r in stream_rows)
    assert dropped >= 1, "decon stage caught nothing — planted proof broken"
    # and the funnel is monotone per lang
    for r in stream_rows:
        assert (
            r["n_raw"] >= r["n_quality"] >= r["n_dedup"] >= r["n_clean"] >= 0
        ), r
