"""Fuzzy (edit-distance) matching — the entity-resolution join tier:
find record pairs within Levenshtein distance 1 WITHOUT an all-pairs
comparison, via deletion-neighborhood blocking (the SymSpell insight:
two strings are within one edit iff they share a member of each
other's {self ∪ one-char-deletions} set — complete recall, no
probabilistic misses, unlike LSH tiers).

Scale posture mirrors the MinHash stage: candidates come from ONE
equality shuffle on the variant key (linear in bucket occupancy, not
|rows|²), pair expansion is capped per bucket with the same
log-what-you-drop discipline, and the exact Levenshtein runs as a
VERIFY step on candidates only.  Variant count per row is
len(field)+1 — bound the field (a title/prefix, not a document) to
bound the explode.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def deletion_variants(s: Column | str) -> Column:
    """{s} ∪ {s with position i deleted} as an array<string> — the
    complete edit-distance-1 blocking key set."""
    c = F.col(s) if isinstance(s, str) else s
    deletions = F.transform(
        F.sequence(F.lit(1), F.length(c)),
        lambda i: F.concat(
            F.substring(c, F.lit(1), i - 1),
            F.substring(c, i + 1, F.length(c)),
        ),
    )
    return F.array_distinct(F.concat(F.array(c), deletions))


def deletion_bucket_audit(
    df: DataFrame,
    field: str,
    id_col: str = "doc_id",
    max_bucket: int = 200,
) -> DataFrame:
    """The cap observable :func:`edit_distance_pairs` promises — the
    fuzzy tier's analog of the MinHash ``combined_bucket_audit``: same
    deletion-variant expansion, same occupancy grouping, one row of
    (rows_expanded, n_buckets, n_hot_buckets, rows_in_hot,
    pairs_skipped).  ``pairs_skipped`` is the candidate-pair mass
    Σ n·(n-1)/2 over buckets the ``max_bucket`` guard drops — when the
    cap bites (a near-constant field), this query is the alarm that the
    certified pair output is no longer recall-complete; when it reads
    all-zero, the cap is provably vacuous and the recall-completeness
    claim stands.  ONE occupancy shuffle on the variant key, scalar
    output — run it with the SAME (field, max_bucket) as the pair job.
    """
    base = df.select(
        F.col(id_col).alias("__id"), F.col(field).alias("__f")
    ).withColumn("__v", F.explode(deletion_variants(F.col("__f"))))
    occ = base.groupBy("__v").agg(F.count(F.lit(1)).alias("__n"))
    over = F.col("__n") > max_bucket
    pair_mass = (F.col("__n") * (F.col("__n") - 1) / 2).cast("long")
    return occ.agg(
        F.sum("__n").cast("long").alias("rows_expanded"),
        F.count(F.lit(1)).cast("long").alias("n_buckets"),
        F.sum(F.when(over, 1).otherwise(0)).cast("long").alias("n_hot_buckets"),
        F.sum(F.when(over, F.col("__n")).otherwise(0))
        .cast("long")
        .alias("rows_in_hot"),
        F.sum(F.when(over, pair_mass).otherwise(0))
        .cast("long")
        .alias("pairs_skipped"),
    )


def edit_distance_pairs(
    df: DataFrame,
    field: str,
    id_col: str = "doc_id",
    max_distance: int = 1,
    max_bucket: int = 200,
) -> DataFrame:
    """(id_a, id_b, dist) for all pairs with levenshtein(field) ≤
    ``max_distance`` (recall-complete for distance ≤ 1 — every such
    pair shares a deletion variant; higher distances would need the
    k-deletion generalization).

    One shuffle on the variant key; buckets above ``max_bucket`` are
    dropped (a hot variant means a near-constant field — cap-and-audit
    like the MinHash tier, never a silent quadratic).  Candidates are
    verified with the exact JVM ``levenshtein``."""
    base = df.select(
        F.col(id_col).alias("__id"), F.col(field).alias("__f")
    ).withColumn("__v", F.explode(deletion_variants(F.col("__f"))))
    a = base.select(
        F.col("__v"), F.col("__id").alias("id_a"), F.col("__f").alias("__fa")
    )
    b = base.select(
        F.col("__v"), F.col("__id").alias("id_b"), F.col("__f").alias("__fb")
    )
    hot = (
        base.groupBy("__v")
        .agg(F.count(F.lit(1)).alias("__occ"))
        .filter(F.col("__occ") > max_bucket)
        .select("__v")
    )
    cands = (
        a.join(F.broadcast(hot), "__v", "left_anti")
        .join(b, "__v")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "__fa", "__fb")
        .dropDuplicates(["id_a", "id_b"])
    )
    return (
        cands.withColumn("dist", F.levenshtein("__fa", "__fb").cast("long"))
        .filter(F.col("dist") <= max_distance)
        .select("id_a", "id_b", "dist")
    )
