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
``max_len`` contribute their ``max_len``-prefix's neighborhood only —
an approximation: exact for substitutions confined to the prefix,
but an insertion/deletion INSIDE the prefix shifts tail characters
across the prefix boundary (the two prefixes then differ by up to
d+1 edits), so a true distance-d pair whose edits are indels near
the boundary can be missed, as can pairs whose edits lie beyond the
prefix entirely. Raise ``max_len`` above the longest key for exact
behavior.
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
    max_variant_group: int | None = None,
) -> DataFrame:
    """All cross-side pairs with ``levenshtein <= max_distance``.
    Output ``(left_id, left_val, right_id, right_val, distance)``,
    deduplicated. NULL strings never match.

    Plan shape: two scan-side neighborhood explodes, one equi-join on
    the variant string with a length-band residual
    (``|len(a) − len(b)| <= d`` — a pair violating it cannot be within
    distance d, so the filter is free recall-neutral pruning applied
    BEFORE any levenshtein), then a groupBy on (left_id, right_id)
    that collapses the multi-variant candidate multiplicity — a
    distance-d pair shares up to the whole deletion neighborhood
    (~len²/2 variants at d=2), and evaluating levenshtein per shared
    variant was the dominant cost — and finally ONE bounded
    ``levenshtein(a, b, d)`` per unique candidate pair (the 3-arg form
    early-exits as soon as the running distance exceeds d, returning
    −1). The explode factor is the neighborhood size — bounded by
    ``max_len`` and ``max_distance``, independent of row count.

    ``max_variant_group``: optional hot-variant guard. A low-entropy
    key column can send a huge fraction of rows through ONE variant
    (every string of length ≤ d collides on ""), and within that
    colliding group the candidate join is inherently quadratic — the
    SymSpell bound degenerates, same as a hot LSH bucket. When set,
    variants shared by more than this many rows PER SIDE are dropped
    from candidate generation (pairs reachable only through dropped
    variants are missed — a documented recall trade, exactly the
    dedup-tier bucket-cap contract). Default None = exact.
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
    if max_variant_group is not None:
        l = _cap_variant_groups(l, max_variant_group)
        r = _cap_variant_groups(r, max_variant_group)
    la, ra = l.alias("L"), r.alias("R")
    cand = la.join(
        ra,
        on=[
            F.col("L.__v") == F.col("R.__v"),
            # length band: |len(a)-len(b)| > d ⇒ lev(a,b) > d
            F.abs(
                F.length(F.col("L.left_val")) - F.length(F.col("R.right_val"))
            )
            <= max_distance,
        ],
    ).select("L.left_id", "L.left_val", "R.right_id", "R.right_val")
    # one row per candidate pair BEFORE the levenshtein: left_val /
    # right_val are functions of their ids, so first() is
    # value-deterministic; the exchange hashes the two id scalars, not
    # the value strings, and partial aggregation collapses the variant
    # multiplicity map-side
    uniq = cand.groupBy("left_id", "right_id").agg(
        F.first("left_val").alias("left_val"),
        F.first("right_val").alias("right_val"),
    )
    return (
        uniq.withColumn(
            "distance",
            F.levenshtein(
                F.col("left_val"), F.col("right_val"), max_distance
            ),
        )
        .where(F.col("distance") >= 0)
        .select("left_id", "left_val", "right_id", "right_val", "distance")
    )


def _cap_variant_groups(side: DataFrame, cap: int) -> DataFrame:
    """Drop variants whose per-side group exceeds ``cap`` (two-phase
    count + join-back; the count exchange carries (variant, n) only)."""
    hot = (
        side.groupBy("__v")
        .agg(F.count(F.lit(1)).alias("__n"))
        .where(F.col("__n") > cap)
        .select("__v")
    )
    return side.join(hot, on="__v", how="left_anti")


def fuzzy_dedup_pairs(
    df: DataFrame,
    max_distance: int = 1,
    id_col: str = "id",
    text_col: str = "name",
    max_len: int = 64,
    max_variant_group: int | None = None,
) -> DataFrame:
    """Within-corpus near-match pairs (``id_a < id_b``) — the fuzzy
    counterpart of the exact/MinHash dedup tiers, for short key
    columns. Same neighborhood blocking as ``fuzzy_pairs`` (already
    unique per (id_a, id_b) — no extra distinct needed)."""
    base = df.where(F.col(text_col).isNotNull()).select(
        F.col(id_col), F.col(text_col)
    )
    pairs = fuzzy_pairs(
        base, base, max_distance, id_col, text_col, id_col, text_col,
        max_len, max_variant_group,
    )
    return pairs.where(F.col("left_id") < F.col("right_id")).select(
        F.col("left_id").alias("id_a"),
        F.col("right_id").alias("id_b"),
        F.col("left_val").alias("val_a"),
        F.col("right_val").alias("val_b"),
        "distance",
    )


def fuzzy_entity_clusters(
    df: DataFrame,
    max_distance: int = 1,
    id_col: str = "id",
    text_col: str = "name",
    max_len: int = 64,
    max_variant_group: int | None = None,
) -> DataFrame:
    """Entity resolution: transitive closure of the fuzzy near-match
    graph — the fuzzy tier composed with distributed connected
    components exactly the way the embedding tier composes into
    ``semantic_dedup``. "jonathan smith" ~ "jonathon smith" ~
    "jonathan smyth" all land in ONE cluster even when the outer pair
    is beyond ``max_distance``.

    Returns one row per entity that matched anything:
    ``(id_col, canonical_id, canonical_val, cluster_size)`` — the
    canonical representative is the min-id member (deterministic).
    Unmatched rows produce no output row; keep them unconditionally
    (or anti-join non-canonical members out of ``df``).

    Scale shape: SymSpell-blocked pair generation (no cartesian) →
    O(log n)-round pointer-jumping CC on (id, id) scalars → one
    broadcast-size-independent join back to ``df`` for the canonical
    value. Same hot-variant guard pass-through as ``fuzzy_pairs``.
    """
    from data_export_tool_spark.operators.graph import duplicate_clusters

    pairs = fuzzy_dedup_pairs(
        df, max_distance, id_col, text_col, max_len, max_variant_group
    )
    clusters = duplicate_clusters(
        pairs.select("id_a", "id_b"), id_out=id_col
    ).withColumnRenamed("component_id", "canonical_id")
    canon_val = df.select(
        F.col(id_col).alias("canonical_id"),
        F.col(text_col).alias("canonical_val"),
    )
    return clusters.join(canon_val, on="canonical_id").select(
        id_col, "canonical_id", "canonical_val", "cluster_size"
    )
