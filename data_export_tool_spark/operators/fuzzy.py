"""Fuzzy string matching: edit-distance joins without the cross join.

Entity resolution (dedup of names, titles, product strings) needs
"all pairs within Levenshtein distance d" — the naive form is a
cartesian product, dead at any scale. This module uses the SymSpell
deletion-neighborhood bound instead: if ``lev(a, b) <= d`` then the
sets of strings obtainable by deleting at most ``d`` characters from
``a`` and from ``b`` intersect. So each side explodes its (bounded)
deletion neighborhood, candidates come from an equi-join on the
shared variant — a plain hash join on short strings — and one exact
``levenshtein`` evaluation per candidate pair kills false positives.
No cartesian anywhere; the join key cardinality is the variant space.

Neighborhood size is C(len, d)-ish (len²/2 for d=2) — fine for the
short keys entity resolution works on. Strings longer than
``max_len`` contribute their ``max_len``-prefix's neighborhood only:
still exact for pairs whose edits touch the prefix region, an
approximation for edits concentrated beyond it (documented contract;
raise ``max_len`` for longer keys).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _one_deletions(s: Column) -> Column:
    """Array of every single-character deletion of ``s`` (empty array
    for the empty string — Spark's sequence(1, 0) would count DOWN)."""
    n = F.length(s)
    idx = F.when(n >= 1, F.sequence(F.lit(1), n)).otherwise(
        F.array().cast("array<int>")
    )
    return F.transform(
        idx,
        lambda i: F.concat(
            s.substr(F.lit(1), i - 1), s.substr(i + 1, F.length(s))
        ),
    )


def deletion_neighborhood(s: Column, d: int, max_len: int = 64) -> Column:
    """Distinct strings reachable from ``s`` by at most ``d``
    deletions (``s`` included), over the ``max_len``-prefix."""
    if d < 0:
        raise ValueError(f"d must be >= 0: {d}")
    base = s.substr(1, max_len)
    out = F.array(base)
    cur = F.array(base)
    for _ in range(d):
        cur = F.array_distinct(
            F.flatten(F.transform(cur, lambda x: _one_deletions(x)))
        )
        out = F.array_distinct(F.concat(out, cur))
    return out


def fuzzy_pairs(
    left: DataFrame,
    right: DataFrame,
    max_distance: int = 1,
    left_id: str = "id",
    left_col: str = "name",
    right_id: str = "id",
    right_col: str = "name",
    max_len: int = 64,
) -> DataFrame:
    """All cross-side pairs with ``levenshtein <= max_distance``.
    Output ``(left_id, left_val, right_id, right_val, distance)``,
    deduplicated. NULL strings never match.

    Plan shape: two scan-side neighborhood explodes, one equi-join on
    the variant string, exact levenshtein on candidates only, distinct
    on the (ids, distance) scalars. The explode factor is the
    neighborhood size — bounded by ``max_len`` and ``max_distance``,
    independent of row count.
    """
    l = left.where(F.col(left_col).isNotNull()).select(
        F.col(left_id).alias("left_id"),
        F.col(left_col).alias("left_val"),
        F.explode(
            deletion_neighborhood(F.col(left_col), max_distance, max_len)
        ).alias("__v"),
    )
    r = right.where(F.col(right_col).isNotNull()).select(
        F.col(right_id).alias("right_id"),
        F.col(right_col).alias("right_val"),
        F.explode(
            deletion_neighborhood(F.col(right_col), max_distance, max_len)
        ).alias("__v"),
    )
    return (
        l.join(r, "__v")
        .drop("__v")
        .withColumn(
            "distance", F.levenshtein(F.col("left_val"), F.col("right_val"))
        )
        .where(F.col("distance") <= max_distance)
        .distinct()
    )


def fuzzy_dedup_pairs(
    df: DataFrame,
    max_distance: int = 1,
    id_col: str = "id",
    text_col: str = "name",
    max_len: int = 64,
) -> DataFrame:
    """Within-corpus near-match pairs (``id_a < id_b``) — the fuzzy
    counterpart of the exact/MinHash dedup tiers, for short key
    columns. Same neighborhood blocking as ``fuzzy_pairs``."""
    base = df.where(F.col(text_col).isNotNull()).select(
        F.col(id_col), F.col(text_col)
    )
    pairs = fuzzy_pairs(
        base, base, max_distance, id_col, text_col, id_col, text_col, max_len
    )
    return (
        pairs.where(F.col("left_id") < F.col("right_id"))
        .select(
            F.col("left_id").alias("id_a"),
            F.col("right_id").alias("id_b"),
            F.col("left_val").alias("val_a"),
            F.col("right_val").alias("val_b"),
            "distance",
        )
        .distinct()
    )
