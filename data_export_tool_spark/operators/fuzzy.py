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


def np_jaro_winkler_batch(a_list, b_list, prefix_scale: float = 0.1):
    """Vectorized Jaro-Winkler over a batch of string pairs — numpy
    uint32 code matrices, one float64 result per pair. Exactly the
    arithmetic of :func:`py_jaro_winkler` (same IEEE expression
    order), vectorized ACROSS pairs: the greedy match loop runs over
    char positions (≤ max_len² steps of O(batch) bool algebra), not
    over pairs, so a 10k-pair batch of 12-char names is ~10⁷ numpy
    element-ops instead of 10⁷ Python interpreter steps (~30× in the
    b101 bench). ``py_jaro_winkler`` stays the oracle — the
    hypothesis test pins bit-equality after round(6)."""
    import numpy as np

    n = len(a_list)
    out = np.zeros(n, dtype=np.float64)
    if n == 0:
        return out
    la = np.fromiter((len(x) for x in a_list), np.int64, n)
    lb = np.fromiter((len(x) for x in b_list), np.int64, n)
    # py_jaro_winkler's a == b early return covers "" == "" (scores 1);
    # nonempty equal pairs fall out of the match loop as 1.0 naturally
    out[(la == 0) & (lb == 0)] = 1.0
    La = int(la.max())
    Lb = int(lb.max())
    if La == 0 or Lb == 0:
        return out  # empty vs nonempty scores 0
    # codepoint+1 codes, 0 = padding (so NUL chars in data stay distinct
    # from the pad)
    A = np.zeros((n, La), dtype=np.uint32)
    B = np.zeros((n, Lb), dtype=np.uint32)
    for i, s in enumerate(a_list):
        if s:
            A[i, : len(s)] = (
                np.frombuffer(s.encode("utf-32-le"), dtype=np.uint32) + 1
            )
    for i, s in enumerate(b_list):
        if s:
            B[i, : len(s)] = (
                np.frombuffer(s.encode("utf-32-le"), dtype=np.uint32) + 1
            )
    win = np.maximum(np.maximum(la, lb) // 2 - 1, 0)
    ma = np.zeros((n, La), dtype=bool)
    mb = np.zeros((n, Lb), dtype=bool)
    for i in range(La):
        ai = A[:, i]
        lo = i - win
        hi = np.minimum(lb, i + win + 1)
        found = np.zeros(n, dtype=bool)
        for j in range(Lb):
            cond = (
                (ai != 0)
                & ~found
                & (j >= lo)
                & (j < hi)
                & ~mb[:, j]
                & (B[:, j] == ai)
            )
            mb[:, j] |= cond
            found |= cond
        ma[:, i] = found
    m = ma.sum(axis=1)
    # compact matched chars in order (ragged → padded via match ranks)
    mx = int(m.max())
    if mx == 0:
        return out  # every pair has zero matches (and the a==b case
        # always matches, so exact-equal pairs never land here)
    Am = np.zeros((n, mx), dtype=np.uint32)
    Bm = np.zeros((n, mx), dtype=np.uint32)
    ra = np.cumsum(ma, axis=1) - 1
    rb = np.cumsum(mb, axis=1) - 1
    rows, cols = np.nonzero(ma)
    Am[rows, ra[rows, cols]] = A[rows, cols]
    rows, cols = np.nonzero(mb)
    Bm[rows, rb[rows, cols]] = B[rows, cols]
    t = ((Am != Bm) & (Am != 0)).sum(axis=1) / 2
    ok = (m > 0) & (la > 0) & (lb > 0)
    mf = m.astype(np.float64)
    laf = la.astype(np.float64)
    lbf = lb.astype(np.float64)
    with np.errstate(divide="ignore", invalid="ignore"):
        jaro = np.where(ok, (mf / laf + mf / lbf + (mf - t) / mf) / 3, 0.0)
    k = min(4, La, Lb)
    eq = (A[:, :k] == B[:, :k]) & (A[:, :k] != 0)
    p = np.cumprod(eq, axis=1).sum(axis=1)
    # exact-equal NONEMPTY pairs yield 1.0 from the loop itself (full
    # window match, t=0); the empty-equal 1.0 set above must survive
    # the m>0 mask
    out = np.where(ok, jaro + p * prefix_scale * (1 - jaro), out)
    return out


def char_bag_tags(s: Column) -> Column:
    """Occurrence-tagged characters of ``s``: the k-th occurrence of
    char c becomes the string ``c || k``, so the char MULTISET becomes
    a plain SET — ``array_intersect(tags_a, tags_b)`` then has size
    ``Σ_c min(cnt_a(c), cnt_b(c))``, the exact bag intersection (c's
    k-th tag is shared iff both sides hold ≥ k copies of c).

    This is the SCAN-SIDE companion of :func:`jw_upper_bound`:
    compute it once per input row, never per candidate pair — the
    index-lambda transform and the O(len²) per-run counting are
    higher-order functions (interpreted, outside whole-stage codegen)
    and priced accordingly, while the per-pair probe stays one native
    array_intersect of short arrays."""
    sc = F.array_sort(F.filter(F.split(s, ""), lambda c: F.length(c) > 0))
    # sorted ⇒ equal chars are adjacent ⇒ occurrence index of element
    # i is the count of equal elements in the prefix before i
    return F.transform(
        sc,
        lambda x, i: F.concat(
            x, F.size(F.filter(F.slice(sc, 1, i), lambda y: y == x)).cast("string")
        ),
    )


def jw_upper_bound(
    ta: Column,
    tb: Column,
    tags_a: Column | None = None,
    tags_b: Column | None = None,
    prefix_scale: float = 0.1,
) -> Column:
    """A provable JVM-side upper bound on Jaro-Winkler(ta, tb) — the
    prefilter that lets the Arrow scorer skip most sub-threshold
    candidates without any Python. The per-pair cost is ONE native
    ``array_intersect`` + scalar algebra; the per-row tagging
    (:func:`char_bag_tags`) is hoisted to the scan side. (A first cut
    computed the bag with per-PAIR aggregate()+replace() lambdas —
    higher-order functions are interpreted, outside whole-stage
    codegen, and cost ~0.3 ms/pair, slower than the Python scorer it
    was guarding.)

    Bound: Jaro matches ``m`` cannot exceed the character-BAG
    intersection size ``B = Σ_c min(cnt_a(c), cnt_b(c))`` — every
    matched char pair consumes one occurrence on each side; the
    window constraint only shrinks m further. Transpositions only
    subtract, so ``jaro ≤ (B/|a| + B/|b| + 1)/3`` (0 when B = 0,
    matching the m = 0 branch). The Winkler bonus uses the EXACT
    common-prefix length p (≤ 4, computed here), and
    ``jw = jaro + p·s·(1−jaro)`` is increasing in jaro for
    ``p·s < 1``, so substituting the jaro bound is sound.

    ``tags_a``/``tags_b``: precomputed :func:`char_bag_tags` columns —
    pass them when the inputs sit behind a join so the tagging happens
    scan-side once per row; omitted, they are derived inline. NULL
    in → NULL out (callers drop NULL keys upstream)."""
    la, lb = F.length(ta), F.length(tb)
    if tags_a is None:
        tags_a = char_bag_tags(ta)
    if tags_b is None:
        tags_b = char_bag_tags(tb)
    mub = F.array_size(F.array_intersect(tags_a, tags_b))
    jaro_ub = F.when(ta == tb, F.lit(1.0)).when(
        (mub <= 0) | (la == 0) | (lb == 0), F.lit(0.0)
    ).otherwise((mub / la + mub / lb + 1) / 3)
    p = _common_prefix_len(ta, tb, la, lb)
    return jaro_ub + p * F.lit(prefix_scale) * (1 - jaro_ub)


def _common_prefix_len(ta: Column, tb: Column, la: Column, lb: Column) -> Column:
    """Exact common-prefix length, capped at 4 (the Winkler window),
    as a cascaded codegen CASE chain."""
    p = F.lit(0)
    cond = F.lit(True)
    for i in range(1, 5):
        cond = cond & (
            F.substring(ta, i, 1) == F.substring(tb, i, 1)
        ) & (la >= i) & (lb >= i)
        p = p + F.when(cond, 1).otherwise(0)
    return p


def jw_prefilter(
    ta: Column,
    tb: Column,
    tags_a: Column,
    tags_b: Column,
    threshold: float,
    prefix_scale: float = 0.1,
) -> Column:
    """Boolean form of ``jw_upper_bound(...) >= threshold``, algebraically
    rearranged so the (relatively) expensive ``array_intersect`` appears
    exactly ONCE — as a join condition the bound expression is not
    subexpression-eliminated, so the value form would intersect three
    times per probed pair.

    Derivation (soundness inherits from :func:`jw_upper_bound`):
    ``ub = j + s·p·(1−j) ≥ T  ⟺  j ≥ (T − s·p)/(1 − s·p) =: X`` (the
    division is safe: s·p ≤ 0.4 < 1), and for nonempty unequal strings
    ``j = (B/|a| + B/|b| + 1)/3 ≥ X ⟺ B ≥ (3X−1)·|a|·|b|/(|a|+|b|)``.
    A 1e-9 slack absorbs the float rearrangement at exact-threshold
    boundaries (recall-neutral: it only ever ADMITS extra candidates).
    Callers guarantee nonempty non-NULL keys."""
    la, lb = F.length(ta), F.length(tb)
    p = _common_prefix_len(ta, tb, la, lb)
    sp = p * F.lit(prefix_scale)
    x = (F.lit(threshold) - sp) / (F.lit(1.0) - sp)
    need = (3 * x - 1) * la * lb / (la + lb) - F.lit(1e-9)
    return (ta == tb) | (
        F.array_size(F.array_intersect(tags_a, tags_b)) >= need
    )


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
        char_bag_tags(F.col("__t")).alias("__s"),
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
        F.col("__s").alias("__sa"),
        "__blk",
        F.explode(
            F.array(F.col("__band") - 1, F.col("__band"), F.col("__band") + 1)
        ).alias("__band"),
    )
    b = blocked.select(
        F.col("__id").alias("id_b"), F.col("__t").alias("__tb"),
        F.col("__s").alias("__sb"),
        "__blk", "__band",
    )
    # spread the probe side across the session's parallelism: the
    # build side broadcasts, so without this the whole candidate
    # pipeline (join condition + scorer) inherits the INPUT partition
    # count — a single small parquet file would run it on one core
    a = a.repartition(_parallelism(df))
    cand = a.join(b, on=["__blk", "__band"]).where(
        F.col("id_a") < F.col("id_b")
    )
    return _jw_score_candidates(cand, threshold)


def _parallelism(df: DataFrame) -> int:
    try:
        return max(
            1, int(df.sparkSession.conf.get("spark.sql.shuffle.partitions"))
        )
    except Exception:
        return 32


def _jw_score_candidates(cand: DataFrame, threshold: float) -> DataFrame:
    """Shared scoring tail of the JW blockers: JVM prefilter → Arrow
    numpy scorer → distinct → threshold. ``cand`` carries
    ``(id_a, id_b, __ta, __tb, __sa, __sb)``.

    The prefilter is a provable JW upper bound (char-bag match bound +
    exact prefix) as pure codegen column algebra — most sub-threshold
    candidates never reach the Arrow scorer. Recall neutral:
    equivalent (with admit-only slack) to jw_upper_bound >= threshold,
    which dominates the true JW (hypothesis-pinned vs
    py_jaro_winkler).

    The scorer is marked NON-DETERMINISTIC (guide §4.4) so the
    threshold filter right above it plans as one Filter over ONE
    ArrowEvalPython — without the marker Catalyst duplicates the UDF
    below the pushed filter and every surviving row pays it twice.
    r10 shipped a ``.distinct()`` as the dedup-aggregate barrier
    achieving the same single evaluation; both blockers are
    duplicate-free by construction (prefix: a pair shares one __blk
    and exactly ONE of the three exploded band probes equals the right
    row's band; phonetic: one Soundex block key per row), so the
    distinct was pure barrier — and its full exchange of every scored
    pair cost 2.8× the filter path at sf0.1 (23.4 → 8.3 s on b101's
    1.94 M surviving pairs, row-identical)."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    cand = cand.where(
        jw_prefilter(
            F.col("__ta"), F.col("__tb"), F.col("__sa"), F.col("__sb"),
            threshold,
        )
    )

    def _score(ta, tb):
        return pd.Series(np_jaro_winkler_batch(ta.tolist(), tb.tolist()))

    _score.__annotations__ = {"ta": pd.Series, "tb": pd.Series,
                              "return": pd.Series}
    score = pandas_udf(_score, "double").asNondeterministic()
    return (
        cand.withColumn("jw", F.round(score(F.col("__ta"), F.col("__tb")), 6))
        .where(F.col("jw") >= threshold)
        .select("id_a", "id_b", "jw")
    )


def phonetic_dedup_pairs(
    df: DataFrame,
    threshold: float = 0.9,
    id_col: str = "doc_id",
    text_col: str = "name",
    max_block: int = 10_000,
) -> DataFrame:
    """Jaro-Winkler pairs under PHONETIC (Soundex) blocking — the
    recall complement of :func:`jaro_winkler_dedup_pairs`'s prefix
    blocking for name-grade keys: candidates share the Soundex codes
    of their first two lowercased tokens, so spelling variants that
    DIVERGE after the first letter but sound alike ("jonathan" /
    "jhonathan" → both J535; prefix-2 blocking splits them at
    'jo'/'jh') land in one block. Misses BY CONSTRUCTION: pairs whose
    first letter differs (Soundex keeps it — "catherine"/"kathryn"
    stay apart; union with the prefix blocker if that matters) or
    whose second-token codes differ. Same flood guard, same JVM
    upper-bound prefilter, same Arrow numpy scorer, same output
    contract ``(id_a, id_b, jw)`` as the prefix blocker.

    Blocking runs on Spark's builtin ``soundex`` (commons-codec
    US-English rules, JVM codegen); non-alphabetic tokens pass
    through as their own literal block keys — deterministic, and a
    numeric token blocks exactly."""
    if not 0 < threshold <= 1:
        raise ValueError(f"threshold must be in (0, 1]: {threshold}")
    base = df.select(
        F.col(id_col).alias("__id"),
        F.lower(F.trim(F.col(text_col))).alias("__t"),
    ).where(F.col("__t").isNotNull() & (F.length("__t") > 0))
    toks = F.split(F.col("__t"), r"\s+")
    blocked = base.select(
        "__id",
        "__t",
        char_bag_tags(F.col("__t")).alias("__s"),
        F.concat_ws(
            "|",
            F.soundex(F.coalesce(F.try_element_at(toks, F.lit(1)), F.lit(""))),
            F.soundex(F.coalesce(F.try_element_at(toks, F.lit(2)), F.lit(""))),
        ).alias("__blk"),
    )
    sizes = blocked.groupBy("__blk").agg(
        F.count(F.lit(1)).alias("__n")
    ).where(F.col("__n") > max_block)
    bad = sizes.limit(1).collect()
    if bad:
        r = bad[0]
        raise ValueError(
            f"phonetic block {r['__blk']!r} has {r['__n']} rows"
            f" > max_block={max_block}: key quality too low for Soundex"
            f" blocking — normalize keys or raise max_block explicitly"
        )
    a = blocked.select(
        F.col("__id").alias("id_a"), F.col("__t").alias("__ta"),
        F.col("__s").alias("__sa"), "__blk",
    ).repartition(_parallelism(df))
    b = blocked.select(
        F.col("__id").alias("id_b"), F.col("__t").alias("__tb"),
        F.col("__s").alias("__sb"), "__blk",
    )
    cand = a.join(b, on="__blk").where(F.col("id_a") < F.col("id_b"))
    return _jw_score_candidates(cand, threshold)
