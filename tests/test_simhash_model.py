"""Pure-Python simhash/banding/cap model — VERDICT r10 item 4.

``dedup_bucket_audit``'s sf0.1 oracle branch pins the simhash band-2
skip trio (2 hot buckets, 417 rows, 43,320 candidate pairs at cap
200) as Spark-measured constants, because xxhash64/simhash banding is
not DuckDB-expressible.  This module RE-DERIVES the trio with zero
Spark in the derivation path: a pure-Python XXH64 (the public xxHash
spec), the operator's exact tokenization (``split(lower(text),
'\\s+')``), the ±1 bit-vote / sign-fingerprint simhash, the 4×16-bit
banding, and a Counter histogram over the same augmented corpus
(documents ∪ doc_id%7==0 replicas — replica ids differ but band
values depend only on text).  With this in place the oracle branch is
Python-model-verified, not a cross-run determinism pin.

The XXH64 primitive itself is validated two ways before it is
trusted: the public spec's seed-0 empty-input vector, and a one-off
cross-check against Spark's ``F.xxhash64`` (seed 42) on a token set
covering every tail length class (0-7 residual bytes) plus >32-byte
inputs that exercise the stripe loop.

Section 3 gives the audit's MinHash half the same treatment: the
3-gram-shingle seeded-min signatures re-derived in Python (including
Spark's two-child xxhash64 fold and LongType's SIGNED array_min),
deriving the all-zero minhash skip columns the oracle pins at both
scales.
"""

from __future__ import annotations

import os
import re
from collections import Counter

import pytest

from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# XXH64, from the public spec (https://github.com/Cyan4973/xxHash/blob/dev/
# doc/xxhash_spec.md) — all arithmetic mod 2^64.
# ---------------------------------------------------------------------------

_P1 = 0x9E3779B185EBCA87
_P2 = 0xC2B2AE3D27D4EB4F
_P3 = 0x165667B19E3779F9
_P4 = 0x85EBCA77C2B2AE63
_P5 = 0x27D4EB2F165667C5
_M = (1 << 64) - 1


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M


def _round(acc: int, inp: int) -> int:
    return (_rotl((acc + inp * _P2) & _M, 31) * _P1) & _M


def _merge_round(h: int, v: int) -> int:
    return ((h ^ _round(0, v)) * _P1 + _P4) & _M


def xxh64(data: bytes, seed: int = 42) -> int:
    """Reference XXH64 (returns the unsigned 64-bit digest).  Seed
    defaults to 42 — Spark's fixed seed for ``F.xxhash64``."""
    n = len(data)
    i = 0
    if n >= 32:
        v1 = (seed + _P1 + _P2) & _M
        v2 = (seed + _P2) & _M
        v3 = seed & _M
        v4 = (seed - _P1) & _M
        while i <= n - 32:
            v1 = _round(v1, int.from_bytes(data[i : i + 8], "little"))
            v2 = _round(v2, int.from_bytes(data[i + 8 : i + 16], "little"))
            v3 = _round(v3, int.from_bytes(data[i + 16 : i + 24], "little"))
            v4 = _round(v4, int.from_bytes(data[i + 24 : i + 32], "little"))
            i += 32
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & _M
        for v in (v1, v2, v3, v4):
            h = _merge_round(h, v)
    else:
        h = (seed + _P5) & _M
    h = (h + n) & _M
    while i <= n - 8:
        h = (_rotl(h ^ _round(0, int.from_bytes(data[i : i + 8], "little")), 27) * _P1 + _P4) & _M
        i += 8
    if i <= n - 4:
        h = (_rotl(h ^ (int.from_bytes(data[i : i + 4], "little") * _P1) & _M, 23) * _P2 + _P3) & _M
        i += 4
    while i < n:
        h = (_rotl(h ^ (data[i] * _P5) & _M, 11) * _P1) & _M
        i += 1
    h ^= h >> 33
    h = (h * _P2) & _M
    h ^= h >> 29
    h = (h * _P3) & _M
    h ^= h >> 32
    return h


# ---------------------------------------------------------------------------
# The simhash model — mirrors operators/dedup.py:simhash_frame exactly:
# tokens = split(lower(text), r"\s+") (Java limit=-1 semantics == re.split),
# every OCCURRENCE votes ±1 per bit, fingerprint bit i = (vote_i >= 0).
# ---------------------------------------------------------------------------

_VOTE_CACHE: dict[str, list[int]] = {}


def _token_votes(tok: str) -> list[int]:
    v = _VOTE_CACHE.get(tok)
    if v is None:
        h = xxh64(tok.encode("utf-8"))
        v = [1 if (h >> i) & 1 else -1 for i in range(64)]
        _VOTE_CACHE[tok] = v
    return v


def simhash64_py(text: str) -> int:
    votes = [0] * 64
    for tok, c in Counter(re.split(r"\s+", text.lower())).items():
        tv = _token_votes(tok)
        for i in range(64):
            votes[i] += c * tv[i]
    sim = 0
    for i in range(64):
        if votes[i] >= 0:
            sim |= 1 << i
    return sim


def band_skip_audit(texts: list[str], n_bands: int = 4, cap: int = 200):
    """Per-band (n_skipped_buckets, rows_in_skipped, pairs_skipped) —
    the _bucket_audit math (operators/dedup.py:200) in pure Python."""
    width = 64 // n_bands
    mask = (1 << width) - 1
    fp_cache: dict[str, int] = {}
    hist: list[Counter] = [Counter() for _ in range(n_bands)]
    for t in texts:
        sim = fp_cache.get(t)
        if sim is None:
            sim = simhash64_py(t)
            fp_cache[t] = sim
        for b in range(n_bands):
            hist[b][(sim >> (b * width)) & mask] += 1
    out = []
    for b in range(n_bands):
        over = [c for c in hist[b].values() if c > cap]
        out.append(
            (
                len(over),
                sum(over),
                sum(c * (c - 1) // 2 for c in over),
                sum(hist[b].values()),
            )
        )
    return out


def _augmented_texts(sf_dir: str) -> list[str]:
    """The _augmented_docs corpus (plans/llmdata.py:43) as a text
    multiset: documents ∪ (doc_id % 7 == 0) replicas.  Replica ids
    live in a disjoint namespace but the banding keys depend only on
    text, so the multiset is the whole model input."""
    import duckdb

    con = duckdb.connect()
    rows = con.execute(
        f"""
        SELECT text FROM '{sf_dir}/documents.parquet'
        UNION ALL
        SELECT text FROM '{sf_dir}/documents.parquet' WHERE doc_id % 7 = 0
        """
    ).fetchall()
    con.close()
    return [r[0] for r in rows]


# ---------------------------------------------------------------------------
# 1. Validate the primitive before trusting the model.
# ---------------------------------------------------------------------------


def test_xxh64_known_vector():
    # the one universally published vector: XXH64 of empty input, seed 0
    assert xxh64(b"", seed=0) == 0xEF46DB3751D8E999


# every tail-length class 0..7 plus stripe-loop (>=32B) inputs, ascii
# and multi-byte UTF-8
_XCHECK_TOKENS = [
    "",
    "a",
    "ab",
    "abc",
    "spark",
    "column",
    "filters",
    "shuffles!",
    "the quick brown fox jumps over the lazy dog",  # 43B: stripe + tail
    "x" * 32,
    "x" * 39,
    "naïve-ﬁngerprint",  # multi-byte utf-8
    "批量去重",
]


def test_xxh64_matches_spark(spark):
    """Cross-check the pure-Python XXH64 against Spark's F.xxhash64
    (seed 42) over all tail-length classes.  Spark returns a SIGNED
    long; the model keeps unsigned — compare mod 2^64."""
    df = spark.createDataFrame([(t,) for t in _XCHECK_TOKENS], "t string")
    got = {r["t"]: r["h"] & _M for r in df.select("t", F.xxhash64("t").alias("h")).collect()}
    for t in _XCHECK_TOKENS:
        assert got[t] == xxh64(t.encode("utf-8")), f"xxh64 mismatch on {t!r}"


def test_simhash_fingerprint_matches_spark(spark, sf_dir):
    """End-to-end model check: the pure-Python fingerprint equals
    simhash_frame's for every sf0.001 document."""
    from real_estate_etl_dev_spark.operators.dedup import simhash_frame
    from real_estate_etl_dev_spark.sources.readers import load_table

    docs = load_table(spark, sf_dir, "documents")
    rows = (
        simhash_frame(docs)
        .join(docs.select("doc_id", "text"), "doc_id")
        .select("text", "sim")
        .collect()
    )
    assert rows
    for r in rows:
        assert r["sim"] & _M == simhash64_py(r["text"])


# ---------------------------------------------------------------------------
# 2. The derivations the oracle branches pin (no Spark below this line).
# ---------------------------------------------------------------------------


# the committed fixture dirs, honoring the same env overrides the rest
# of the suite uses (conftest) plus bench's SF knob for the 0.1 branch;
# the in-test row-count precondition guards against a relocated env
# pointing at a DIFFERENT corpus than the one the constants pin
_SF_CERT = os.environ.get("SPARK_GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.01")
_SF_BENCH = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _require_fixture(sf_dir: str) -> None:
    if not os.path.exists(f"{sf_dir}/documents.parquet"):
        pytest.skip(f"no documents.parquet under {sf_dir}")


@pytest.mark.parametrize(
    "sf_dir,n_rows,expect_band2",
    [
        (_SF_CERT, 572, (0, 0, 0)),  # cert scale: zero skip
        (_SF_BENCH, 5715, (2, 417, 43320)),  # bench scale: the trio
    ],
)
def test_skip_trio_derived_from_fixture(sf_dir, n_rows, expect_band2):
    """Independently re-derive dedup_bucket_audit's simhash skip
    columns at both committed scales: zero-skip at the cert corpus;
    exactly (2 hot buckets, 417 rows, 43,320 pairs) in band 2 — and
    ONLY band 2 — at the bench corpus.  These are the constants the
    scale-aware oracle (plans/llmdata.py:234) pins."""
    _require_fixture(sf_dir)
    texts = _augmented_texts(sf_dir)
    assert len(texts) == n_rows
    audit = band_skip_audit(texts, n_bands=4, cap=200)
    for b, (nb, rows, pairs, banded) in enumerate(audit):
        assert banded == n_rows  # every doc lands in every band
        if b == 2:
            assert (nb, rows, pairs) == expect_band2
        else:
            assert (nb, rows, pairs) == (0, 0, 0)


# ---------------------------------------------------------------------------
# 3. The MinHash half of the audit, same treatment: the oracle's
# all-zero minhash skip columns (cap 500, 3 one-hash bands, 3-gram
# word shingles, seed 42) re-derived in pure Python at both scales.
# ---------------------------------------------------------------------------

_SIG_SEED = 42
_SIG_HASHES = 3
_SHINGLE_N = 3


def _shingles_py(text: str, n: int = _SHINGLE_N) -> list[str]:
    """operators/dedup.py:shingles in Python: word n-grams of
    split(lower(text), '\\s+'); tail grams shorten (concat_ws skips
    the past-the-end NULLs); keep max(len-n+1, 1); distinct."""
    toks = re.split(r"\s+", text.lower())
    keep = max(len(toks) - n + 1, 1)
    grams = [" ".join(toks[i : i + n]) for i in range(keep)]
    return list(dict.fromkeys(grams))


def _xxh64_int(value: int, seed: int) -> int:
    """F.xxhash64's fold step for a 4-byte int child: xxh64 of the
    little-endian int with the running hash as seed."""
    return xxh64((value & 0xFFFFFFFF).to_bytes(4, "little"), seed)


_SHINGLE_HASH_CACHE: dict[str, list[int]] = {}


def minhash_signature_py(text: str) -> list[int]:
    """minhash_signature in Python: element i = min over shingles of
    xxhash64(shingle, lit(seed+i)) — Spark folds the two children as
    xxh64_int(seed+i, xxh64(shingle_bytes, 42)) — with the min taken
    over SIGNED 64-bit values, as LongType array_min compares."""
    mins = [None] * _SIG_HASHES
    for sh in _shingles_py(text):
        hs = _SHINGLE_HASH_CACHE.get(sh)
        if hs is None:
            h0 = xxh64(sh.encode("utf-8"), _SIG_SEED)
            hs = []
            for i in range(_SIG_HASHES):
                h = _xxh64_int(_SIG_SEED + i, h0)
                hs.append(h - (1 << 64) if h >= (1 << 63) else h)
            _SHINGLE_HASH_CACHE[sh] = hs
        for i in range(_SIG_HASHES):
            if mins[i] is None or hs[i] < mins[i]:
                mins[i] = hs[i]
    return mins


def test_minhash_signature_matches_spark(spark, sf_dir):
    """End-to-end model check against the operator's own signature
    column on every sf0.001 document."""
    from real_estate_etl_dev_spark.operators.dedup import minhash_signature, shingles
    from real_estate_etl_dev_spark.sources.readers import load_table

    docs = load_table(spark, sf_dir, "documents")
    rows = docs.select(
        "text",
        minhash_signature(
            shingles("text", _SHINGLE_N), _SIG_HASHES, _SIG_SEED
        ).alias("sig"),
    ).collect()
    assert rows
    for r in rows:
        assert list(r["sig"]) == minhash_signature_py(r["text"]), r["text"][:60]


@pytest.mark.parametrize(
    "sf_dir,n_rows",
    [(_SF_CERT, 572), (_SF_BENCH, 5715)],
)
def test_minhash_zero_skip_derived_from_fixture(sf_dir, n_rows):
    """The audit's OTHER half: dedup_bucket_audit pins ALL-ZERO skip
    columns for the three minhash bands at cap 500 at both committed
    scales — re-derived here from the parquet fixture alone (band i's
    bucket key is signature element i)."""
    _require_fixture(sf_dir)
    texts = _augmented_texts(sf_dir)
    assert len(texts) == n_rows
    sig_cache: dict[str, list[int]] = {}
    hist = [Counter() for _ in range(_SIG_HASHES)]
    for t in texts:
        sig = sig_cache.get(t)
        if sig is None:
            sig = minhash_signature_py(t)
            sig_cache[t] = sig
        for i in range(_SIG_HASHES):
            hist[i][sig[i]] += 1
    for i in range(_SIG_HASHES):
        assert sum(hist[i].values()) == n_rows
        over = [c for c in hist[i].values() if c > 500]
        assert over == [], f"minhash band {i} unexpectedly over cap: {over}"
