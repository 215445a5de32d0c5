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


def py_jaro_winkler(a: str, b: str, prefix_scale: float = 0.1) -> float:
    """Jaro-Winkler similarity (Winkler 1990) — ONE shared
    implementation (executors and the test oracle import this, the
    py_viterbi convention). Standard form: Jaro from the match window
    ⌊max(|a|,|b|)/2⌋−1 with half-weighted transpositions, then the
    common-prefix bonus (≤ 4 chars, scale 0.1)."""
    if a == b:
        return 1.0
    la, lb = len(a), len(b)
    if la == 0 or lb == 0:
        return 0.0
    win = max(la, lb) // 2 - 1
    if win < 0:
        win = 0
    ma = [False] * la
    mb = [False] * lb
    m = 0
    for i, ca in enumerate(a):
        lo = max(0, i - win)
        hi = min(lb, i + win + 1)
        for j in range(lo, hi):
            if not mb[j] and b[j] == ca:
                ma[i] = mb[j] = True
                m += 1
                break
    if m == 0:
        return 0.0
    # transpositions: matched chars out of order, halved
    bj = [b[j] for j in range(lb) if mb[j]]
    t = sum(1 for ai, bc in zip((a[i] for i in range(la) if ma[i]), bj) if ai != bc) / 2
    jaro = (m / la + m / lb + (m - t) / m) / 3
    p = 0
    for ca, cb in zip(a[:4], b[:4]):
        if ca != cb:
            break
        p += 1
    return jaro + p * prefix_scale * (1 - jaro)


def jaro_winkler_dedup_pairs(
    df: DataFrame,
    threshold: float = 0.9,
    id_col: str = "doc_id",
    text_col: str = "name",
    block_prefix: int = 2,
    band_width: int = 2,
    max_block: int = 10_000,
) -> DataFrame:
    """All id pairs with Jaro-Winkler similarity ≥ ``threshold`` —
    the similarity-scored sibling of :func:`fuzzy_dedup_pairs` for
    name-grade keys where a FIXED edit budget misreads length (a
    1-edit typo in a 4-char name is severe; in a 40-char title it is
    noise). JW normalizes by length and rewards the shared prefix —
    the classic census/record-linkage scorer.

    Scale shape — PREFIX BLOCKING, the standard JW trade: candidates
    share their lowercased first ``block_prefix`` characters AND a
    ``band_width``-wide length band (high-threshold JW pairs almost
    always share a prefix — the Winkler bonus exists because prefixes
    are where names agree; pairs DIFFERING in the first characters
    are missed BY CONSTRUCTION, recall < 1 like the LSH tier,
    documented). Block → equi-join → one Arrow-batched scorer per
    candidate (python JW per DISTINCT pair, memoized within batch).
    ``max_block`` caps a degenerate block (single-char names flood
    one key) with a readable error instead of a silent quadratic.

    Output: ``(id_a, id_b, jw)`` with id_a < id_b, similarity ≥
    threshold, NULL/empty keys excluded.
    """
    if not 0 < threshold <= 1:
        raise ValueError(f"threshold must be in (0, 1]: {threshold}")
    if block_prefix < 1:
        raise ValueError(f"block_prefix must be >= 1: {block_prefix}")
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    base = df.select(
        F.col(id_col).alias("__id"),
        F.lower(F.trim(F.col(text_col))).alias("__t"),
    ).where(F.col("__t").isNotNull() & (F.length("__t") > 0))
    blocked = base.select(
        "__id",
        "__t",
        F.substring("__t", 1, block_prefix).alias("__blk"),
        F.floor(F.length("__t") / band_width).alias("__band"),
    )
    # block-size guard: a flooded block is a data-quality signal, not
    # something to grind through quadratically
    sizes = blocked.groupBy("__blk", "__band").agg(
        F.count(F.lit(1)).alias("__n")
    ).where(F.col("__n") > max_block)
    bad = sizes.limit(1).collect()
    if bad:
        r = bad[0]
        raise ValueError(
            f"block ({r['__blk']!r}, band {r['__band']}) has {r['__n']} rows"
            f" > max_block={max_block}: key quality too low for prefix"
            f" blocking — normalize keys or raise max_block explicitly"
        )
    # the band is part of the EQUI-JOIN key (the guard above bounds
    # (blk, band) blocks; a blk-only join could still flood): each
    # left row probes its own and both neighbor bands (the geo-join
    # neighbor-cell trick)
    a = blocked.select(
        F.col("__id").alias("id_a"), F.col("__t").alias("__ta"),
        "__blk",
        F.explode(
            F.array(F.col("__band") - 1, F.col("__band"), F.col("__band") + 1)
        ).alias("__band"),
    )
    b = blocked.select(
        F.col("__id").alias("id_b"), F.col("__t").alias("__tb"),
        "__blk", "__band",
    )
    cand = a.join(b, on=["__blk", "__band"]).where(
        F.col("id_a") < F.col("id_b")
    )

    def _score(ta, tb):
        memo: dict[tuple, float] = {}
        out = []
        for x, y in zip(ta, tb):
            k = (x, y)
            v = memo.get(k)
            if v is None:
                v = py_jaro_winkler(x, y)
                memo[k] = v
            out.append(v)
        return pd.Series(out)

    _score.__annotations__ = {"ta": pd.Series, "tb": pd.Series,
                              "return": pd.Series}
    score = pandas_udf(_score, "double")
    return (
        cand.withColumn("jw", F.round(score(F.col("__ta"), F.col("__tb")), 6))
        .where(F.col("jw") >= threshold)
        .select("id_a", "id_b", "jw")
        .distinct()
    )
