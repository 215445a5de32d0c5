"""Approximate sketches for 100 TB-scale profiling passes.

Exact COUNT(DISTINCT) and exact percentiles are shuffle-expensive at
scale: distinct carries every key to a reducer, exact percentile sorts
the column. These wrappers expose Spark's mergeable one-pass sketches
— HyperLogLog++ (`approx_count_distinct`) and the Greenwald-Khanna
quantile summary (`percentile_approx`) — as the default profiling
tier, with the exact forms kept alongside for the (small) final
aggregates where exactness is worth the shuffle.

Both sketches are associative/commutative, so they partial-aggregate
map-side and merge in one reduction — a single narrow shuffle of
sketch bytes, independent of cardinality. Accuracy contracts are
pinned by tests (tests/test_sketch.py), not assumed.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window, functions as F


def approx_distinct(
    df: DataFrame,
    col: str,
    by: Sequence[str] = (),
    rsd: float = 0.02,
    out_col: str | None = None,
) -> DataFrame:
    """HLL++ distinct count of ``col`` (optionally grouped by ``by``).
    ``rsd`` is the target relative standard deviation; 0.02 ≈ the
    default sketch of ~1.5 KB per group regardless of cardinality."""
    if isinstance(by, str):  # a bare string would group per CHARACTER
        by = [by]
    out = out_col or f"approx_distinct_{col}"
    agg = F.approx_count_distinct(col, rsd=rsd).alias(out)
    return df.groupBy(*by).agg(agg) if by else df.agg(agg)


def approx_quantiles(
    df: DataFrame,
    col: str,
    probabilities: Sequence[float] = (0.25, 0.5, 0.75, 0.9, 0.99),
    by: Sequence[str] = (),
    relative_error: float = 0.001,
    out_col: str | None = None,
) -> DataFrame:
    """Greenwald-Khanna approximate quantiles of ``col``; guaranteed
    rank error ≤ ``relative_error``·N. Returns one array column in
    probability order."""
    import math

    if isinstance(by, str):
        by = [by]
    if not 0 < relative_error <= 1:
        raise ValueError(f"relative_error must be in (0, 1]: {relative_error}")
    out = out_col or f"approx_q_{col}"
    # ceil, not truncate: accuracy=int(1/0.003)=333 would guarantee
    # only 1/333 > 0.003 rank error, breaking the documented bound
    agg = F.percentile_approx(
        col, list(probabilities), math.ceil(1.0 / relative_error)
    ).alias(out)
    return df.groupBy(*by).agg(agg) if by else df.agg(agg)


def exact_quantiles(
    col: str, probabilities: Sequence[float]
) -> Column:
    """Exact linear-interpolation percentiles (SQL PERCENTILE_CONT
    semantics, matching DuckDB's quantile_cont) — the full-sort tier;
    use only on already-reduced groups."""
    probs = ", ".join(repr(float(p)) + "D" for p in probabilities)
    return F.expr(f"percentile({col}, array({probs}))")


# ---------------------------------------------------------------------------
# Heavy hitters / frequent items
#
# "Top domains", "most repeated boilerplate", "hottest join keys" are
# the questions a corpus triage pass asks first. Two tiers:
#
# - exact_topk: groupBy + count + take-ordered. Partial aggregation
#   absorbs the skew map-side (the hottest key combines within each
#   task before the exchange), and the final LIMIT k is a
#   TakeOrderedAndProject — no global sort materializes.
# - Misra-Gries candidates + exact recount (topk_two_pass): when the
#   column's cardinality is so large that even the (key,count)
#   aggregate is a heavy shuffle (e.g. URL or shingle columns at
#   100 TB), a per-partition Misra-Gries summary of capacity m bounds
#   the exchange to ≤ m rows PER PARTITION regardless of cardinality.
#   Merging per-partition summaries by summing weights preserves the
#   classic guarantee: any item with true count > N/(m+1) survives,
#   and merged weights undercount by at most N/(m+1)  [Misra & Gries
#   1982; merge property per Agarwal et al., "Mergeable Summaries",
#   PODS 2012]. A second pass recounts ONLY the ≤ m candidates via a
#   broadcast semi-join — so the reported counts are EXACT while the
#   full-cardinality shuffle never happens.
# ---------------------------------------------------------------------------


def exact_topk(
    df: DataFrame, col: str, k: int, by: Sequence[str] = (), n_salts: int = 16
) -> DataFrame:
    """Exact top-``k`` most frequent values of ``col`` (optionally per
    ``by`` group), ties broken by item value ascending so the result
    is deterministic. Nulls are excluded. Output:
    ``(*by, item string, cnt long)``.

    The grouped trim is SALTED two-stage: a window over the bare
    ``by`` partition would put ALL of a group's distinct items on one
    task (a URL column grouped by language = millions of rows on the
    'en' task). Stage 1 ranks within ``(by, crc32(item) % n_salts)``
    cells — bounded partitions — and keeps k per cell; stage 2 ranks
    the surviving ≤ n_salts·k rows per group. Exact: a group's true
    top-k item is by definition in its salt cell's top-k. Output is
    identical for any ``n_salts``.
    """
    if isinstance(by, str):
        by = [by]
    counted = (
        df.where(F.col(col).isNotNull())
        .groupBy(*by, F.col(col).cast("string").alias("item"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    if by:
        from pyspark.sql import Window

        w1 = Window.partitionBy(*by, "__salt").orderBy(
            F.desc("cnt"), F.asc("item")
        )
        w2 = Window.partitionBy(*by).orderBy(F.desc("cnt"), F.asc("item"))
        return (
            counted.withColumn("__salt", F.crc32(F.col("item")) % n_salts)
            .withColumn("__rn1", F.row_number().over(w1))
            .where(F.col("__rn1") <= k)
            .withColumn("__rn", F.row_number().over(w2))
            .where(F.col("__rn") <= k)
            .drop("__salt", "__rn1", "__rn")
        )
    return counted.orderBy(F.desc("cnt"), F.asc("item")).limit(k)


def mg_candidates(df: DataFrame, col: str, capacity: int) -> DataFrame:
    """One-pass per-partition Misra-Gries summaries, merged by a
    (small) sum aggregation. Output ``(item string, weight long)``
    with ≤ ``capacity`` rows; ``weight`` UNDERCOUNTS the true
    frequency by at most N/(capacity+1). Every item whose true count
    exceeds that bound is guaranteed present.

    The per-partition pass is an Arrow-batched ``mapInPandas`` (state
    carries across the partition's batches); the merge shuffles at
    most capacity rows per partition — cardinality-independent."""
    import pandas as pd

    if capacity < 1:
        raise ValueError(f"capacity must be >= 1: {capacity}")

    def summarize(batches):
        # batched Misra-Gries merge (Agarwal et al. 2012, §3): add the
        # batch's exact value_counts into the summary, then restore
        # capacity by subtracting the (m+1)-th largest weight from all
        # and dropping non-positive entries. Fully vectorized — a
        # per-row Python MG loop would put the slow path back into a
        # 100 TB scan; this form is one C-speed value_counts + Series
        # add per Arrow batch. Total undercount stays ≤ N/(m+1): each
        # shrink subtracts its threshold from > m entries at once,
        # spending weight m+1 times faster than it accumulates.
        acc = pd.Series(dtype="int64")
        for pdf in batches:
            vc = pdf.iloc[:, 0].dropna().astype(str).value_counts()
            if vc.empty:
                continue
            acc = vc.copy() if acc.empty else acc.add(vc, fill_value=0)
            if len(acc) > capacity:
                thresh = acc.nlargest(capacity + 1).iloc[-1]
                acc = acc - thresh
                acc = acc[acc > 0]
        if len(acc):
            yield pd.DataFrame(
                {"item": acc.index, "weight": acc.astype("int64").to_numpy()}
            )

    summaries = df.select(F.col(col).cast("string")).mapInPandas(
        summarize, schema="item string, weight long"
    )
    return (
        summaries.groupBy("item")
        .agg(F.sum("weight").alias("weight"))
        .orderBy(F.desc("weight"), F.asc("item"))
        .limit(capacity)
    )


#: composite-key encoding for the grouped MG pass: the group value is
#: BASE64-encoded (output alphabet A-Za-z0-9+/= — provably
#: separator-free, so the composite's first '\x1f' always sits at the
#: group/item boundary and any byte sequence round-trips), with a lone
#: '\x00' marking NULL (not a base64 string, so no real value can
#: collide). An escape-char scheme was tried first and property
#: testing falsified it: escaping '\x1f' as '\x10\x1f' leaves the raw
#: separator byte inside the encoded value, and two-pass global
#: replaces cannot decode escape/substitute boundaries unambiguously.
_G_SEP, _G_NULL = "\x1f", "\x00"


def _enc_group(g):
    return F.when(g.isNull(), F.lit(_G_NULL)).otherwise(
        F.base64(g.cast("binary"))
    )


def _dec_group(g):
    return F.when(g == _G_NULL, F.lit(None).cast("string")).otherwise(
        F.unbase64(g).cast("string")
    )


def grouped_topk_two_pass(
    df: DataFrame,
    col: str,
    k: int,
    by: str,
    capacity: int | None = None,
    n_groups_hint: int | None = None,
) -> DataFrame:
    """Per-group heavy hitters WITHOUT a full-cardinality shuffle:
    Misra-Gries candidates over the composite ``(group, item)`` key,
    exact recount of only those candidates, then the salted per-group
    trim. Output ``(by, item string, cnt long)``.

    Guarantee: the MG pass retains any composite whose count exceeds
    N_total/(capacity+1). Default capacity scales with the group count
    (``n_groups_hint``, or one cheap distinct-count job when absent):
    ``G·(8k+64)``, which makes the per-group retention threshold
    ≈ (N/G)/(8k+64) — the ungrouped bound applied to an average-sized
    group. SMALL groups in a skewed group-size distribution see a
    weaker bound (their hitters compete against the global N); for
    exact results on such groups use ``exact_topk``, which pays the
    full (group,item) aggregate instead. Reported counts are always
    exact; the approximation only affects which items make the
    candidate set.
    """
    sep = _G_SEP
    composite = F.concat_ws(
        sep, _enc_group(F.col(by).cast("string")), F.col(col).cast("string")
    )
    if capacity is None:
        g = n_groups_hint
        if g is None:
            g = df.select(by).distinct().count()
        capacity = max(1, int(g)) * (8 * k + 64)
    cands = (
        mg_candidates(
            df.where(F.col(col).isNotNull()).select(composite.alias("item")),
            "item",
            capacity,
        )
        .select(
            # limit=2: an item containing the separator keeps its tail
            F.split(F.col("item"), sep, 2).getItem(0).alias("__g"),
            F.split(F.col("item"), sep, 2).getItem(1).alias("item"),
        )
    )
    joined = (
        df.where(F.col(col).isNotNull())
        .select(
            _enc_group(F.col(by).cast("string")).alias("__g"),
            F.col(col).cast("string").alias("item"),
        )
        .join(F.broadcast(cands), ["__g", "item"])
        .groupBy("__g", "item")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    from pyspark.sql import Window

    w1 = Window.partitionBy("__g", "__salt").orderBy(F.desc("cnt"), F.asc("item"))
    w2 = Window.partitionBy("__g").orderBy(F.desc("cnt"), F.asc("item"))
    out = (
        joined.withColumn("__salt", F.crc32(F.col("item")) % 16)
        .withColumn("__rn1", F.row_number().over(w1))
        .where(F.col("__rn1") <= k)
        .withColumn("__rn", F.row_number().over(w2))
        .where(F.col("__rn") <= k)
    )
    return out.select(
        _dec_group(F.col("__g")).alias(by),
        "item",
        "cnt",
    )


def topk_two_pass(
    df: DataFrame, col: str, k: int, capacity: int | None = None
) -> DataFrame:
    """Exact counts for the top-``k`` hitters WITHOUT a
    full-cardinality shuffle: Misra-Gries candidates (pass 1), then an
    exact recount of only those candidates via broadcast semi-join
    (pass 2; the per-item partial aggregate absorbs the hitters'
    skew map-side). Correct whenever the k-th hitter's true count
    exceeds N/(capacity+1) — at the default capacity 8·k+64 that
    covers any realistically skewed distribution; for a near-uniform
    column use ``exact_topk``. Output ``(item string, cnt long)``,
    count-desc then item-asc."""
    cap = capacity if capacity is not None else 8 * k + 64
    cands = mg_candidates(df, col, cap).select("item")
    return (
        df.select(F.col(col).cast("string").alias("item"))
        .where(F.col("item").isNotNull())
        .join(F.broadcast(cands), "item")
        .groupBy("item")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc("item"))
        .limit(k)
    )


# ---------------------------------------------------------------------------
# Stored sketches (Apache DataSketches via Spark SQL): HLL / Theta
#
# The incremental-analytics pattern exact aggregates can't give: sketch
# each partition (day, source, shard) ONCE into a storable binary
# column, then answer distinct-count questions across arbitrary
# partition subsets by MERGING sketches — kilobytes moved instead of a
# rescan of raw data. Theta sketches additionally support set algebra
# (union/intersection/difference estimates), i.e. audience overlap
# without a join.
# ---------------------------------------------------------------------------


def _quote(name: str) -> str:
    return "`" + name.replace("`", "``") + "`"


def distinct_sketch(
    df: DataFrame,
    col: str,
    by: Sequence[str] = (),
    kind: str = "hll",
    lg_k: int = 12,
) -> DataFrame:
    """Per-group serialized distinct-count sketch of ``col`` —
    ``(*by, sketch binary)``. ``kind`` 'hll' (smallest) or 'theta'
    (supports set algebra downstream). The binary column round-trips
    through parquet: persist per-partition sketches once, merge
    forever."""
    if kind not in ("hll", "theta"):
        raise ValueError(f"kind must be hll|theta: {kind}")
    if isinstance(by, str):
        by = [by]
    agg = F.expr(
        f"{kind}_sketch_agg({_quote(col)}, {int(lg_k)})"
    ).alias("sketch")
    return df.groupBy(*by).agg(agg) if by else df.agg(agg)


def merge_distinct_estimate(
    sketches: DataFrame,
    by: Sequence[str] = (),
    sketch_col: str = "sketch",
    kind: str = "hll",
    out_col: str = "n_distinct_est",
) -> DataFrame:
    """Merge stored sketches (optionally per ``by`` group) and estimate
    the distinct count — the cross-partition rollup that never touches
    raw data. One tiny aggregation of kilobyte values."""
    if kind not in ("hll", "theta"):
        raise ValueError(f"kind must be hll|theta: {kind}")
    if isinstance(by, str):
        by = [by]
    merged = F.expr(
        f"{kind}_sketch_estimate({kind}_union_agg({_quote(sketch_col)}))"
    ).cast("long").alias(out_col)
    return (
        sketches.groupBy(*by).agg(merged) if by else sketches.agg(merged)
    )


def topk_sketch(
    df: DataFrame, col: str, by: Sequence[str] = ()
) -> DataFrame:
    """Per-group serialized frequent-items sketch of ``col``
    (DataSketches ``approx_top_k_accumulate``) — ``(*by, sketch)``.
    Same stored-partials pattern as ``distinct_sketch``: persist per
    partition, combine across any subset later."""
    if isinstance(by, str):
        by = [by]
    agg = F.expr(f"approx_top_k_accumulate({_quote(col)})").alias("sketch")
    return df.groupBy(*by).agg(agg) if by else df.agg(agg)


def merge_topk_estimate(
    sketches: DataFrame,
    k: int,
    by: Sequence[str] = (),
    sketch_col: str = "sketch",
) -> DataFrame:
    """Combine stored top-k sketches and emit the estimated top ``k``
    as one row per item: ``(*by, item, est_count)``, count-desc then
    item-asc."""
    if isinstance(by, str):
        by = [by]
    merged = F.expr(
        f"approx_top_k_estimate(approx_top_k_combine({_quote(sketch_col)}),"
        f" {int(k)})"
    ).alias("__top")
    base = (
        sketches.groupBy(*by).agg(merged) if by else sketches.agg(merged)
    )
    return base.select(
        *by,
        F.explode("__top").alias("__e"),
    ).select(
        *by,
        F.col("__e.item").alias("item"),
        F.col("__e.count").alias("est_count"),
    ).orderBy(*by, F.desc("est_count"), F.asc("item"))


def theta_overlap(
    df: DataFrame,
    col: str,
    label_col: str,
    label_a,
    label_b,
    lg_k: int = 12,
) -> DataFrame:
    """Audience-overlap estimates WITHOUT a join: one row with
    ``n_a, n_b, n_union, n_intersection, n_only_a`` distinct-count
    estimates of ``col`` between the two ``label_col`` segments. Two
    theta sketches built in one pass (conditional aggregation), set
    algebra on the sketch pair."""
    # labels are DATA values: route them through the DSL (typed
    # literals), never into an interpolated SQL string
    prep = df.select(
        F.when(F.col(label_col) == F.lit(label_a), F.col(col)).alias("__xa"),
        F.when(F.col(label_col) == F.lit(label_b), F.col(col)).alias("__xb"),
    )
    la, lb = F.lit(label_a), F.lit(label_b)
    pair = prep.agg(
        F.expr(f"theta_sketch_agg(__xa, {int(lg_k)})").alias("__a"),
        F.expr(f"theta_sketch_agg(__xb, {int(lg_k)})").alias("__b"),
    )
    est = lambda e: F.expr(f"theta_sketch_estimate({e})").cast("long")
    return pair.select(
        la.alias("label_a"),
        lb.alias("label_b"),
        est("__a").alias("n_a"),
        est("__b").alias("n_b"),
        est("theta_union(__a, __b)").alias("n_union"),
        est("theta_intersection(__a, __b)").alias("n_intersection"),
        est("theta_difference(__a, __b)").alias("n_only_a"),
    )


_KLL_SUFFIXES = ("double", "float", "bigint")


def quantile_sketch(
    df: DataFrame,
    col: str,
    by: Sequence[str] = (),
    k: int = 200,
    dtype: str = "double",
) -> DataFrame:
    """Per-group serialized KLL quantile sketch of ``col`` —
    ``(*by, sketch binary)`` (DataSketches KLL via Spark SQL; Karnin,
    Lall & Liberty 2016). The quantile member of the stored-sketch
    family (`distinct_sketch`/`topk_sketch`): persist per-partition
    or per-day sketches through parquet once, then answer ANY
    quantile/rank question over any subset later by merging
    kilobyte-sized values — no rescan of raw data, the thing
    ``percentile_approx`` can't do across stored runs.

    ``dtype`` selects the typed KLL family (double/float/bigint) and
    must match at merge time; the default double exactly represents
    integers up to 2⁵³ — pass 'bigint' for exact larger ids. ``k``
    trades size for accuracy (k=200 ≈ 1.65% rank error, the library
    default). NULLs are ignored by the aggregate. KLL compaction is
    randomized, so two sketches of the same data may differ by a few
    ranks — bound-based checks, not equality, downstream."""
    if dtype not in _KLL_SUFFIXES:
        raise ValueError(f"dtype must be one of {_KLL_SUFFIXES}: {dtype}")
    if isinstance(by, str):
        by = [by]
    agg = F.expr(
        f"kll_sketch_agg_{dtype}(CAST({_quote(col)} AS {dtype}), {int(k)})"
    ).alias("sketch")
    return df.groupBy(*by).agg(agg) if by else df.agg(agg)


def merge_quantile_estimate(
    sketches: DataFrame,
    probs: Sequence[float],
    by: Sequence[str] = (),
    sketch_col: str = "sketch",
    dtype: str = "double",
) -> DataFrame:
    """Merge stored KLL sketches (optionally per ``by`` group) and
    read the requested quantiles: ``(*by, n long, quantiles array)``
    with ``quantiles[i]`` the value at rank ``probs[i]``. One tiny
    aggregation over kilobyte values — the rollup never touches raw
    rows."""
    if dtype not in _KLL_SUFFIXES:
        raise ValueError(f"dtype must be one of {_KLL_SUFFIXES}: {dtype}")
    if isinstance(by, str):
        by = [by]
    ps = [float(p) for p in probs]
    if not ps or not all(0.0 <= p <= 1.0 for p in ps):
        raise ValueError(f"probs must be non-empty fractions in [0,1]: {probs}")
    arr = ", ".join(repr(p) for p in ps)
    merged = F.expr(f"kll_merge_agg_{dtype}({_quote(sketch_col)})").alias(
        "__m"
    )
    base = sketches.groupBy(*by).agg(merged) if by else sketches.agg(merged)
    return base.select(
        *by,
        F.expr(f"kll_sketch_get_n_{dtype}(__m)").alias("n"),
        F.expr(
            f"kll_sketch_get_quantile_{dtype}(__m, array({arr}))"
        ).alias("quantiles"),
    )


def merge_rank_estimate(
    sketches: DataFrame,
    value,
    by: Sequence[str] = (),
    sketch_col: str = "sketch",
    dtype: str = "double",
) -> DataFrame:
    """The inverse read: merge stored KLL sketches and estimate the
    RANK of ``value`` (fraction of observations ≤ it) per group —
    'what percentile is a 4 096-token document' without a scan."""
    if dtype not in _KLL_SUFFIXES:
        raise ValueError(f"dtype must be one of {_KLL_SUFFIXES}: {dtype}")
    if isinstance(by, str):
        by = [by]
    merged = F.expr(f"kll_merge_agg_{dtype}({_quote(sketch_col)})").alias(
        "__m"
    )
    base = sketches.groupBy(*by).agg(merged) if by else sketches.agg(merged)
    return base.select(
        *by,
        F.expr(
            f"kll_sketch_get_rank_{dtype}(__m, CAST({float(value)!r} AS {dtype}))"
        ).alias("rank_est"),
    )


# ---------------------------------------------------------------------------
# Count-Min sketch (relational representation)
# ---------------------------------------------------------------------------


def _cms_bucket(col: Column, row_idx: Column, width: int) -> Column:
    """Kirsch-Mitzenmacher double hashing (the bloom filter's scheme,
    contamination.py): bucket_i = (h1 + i·h2) mod width with two
    independent xxhash64 streams — JVM-side, no Python."""
    w = F.lit(int(width))
    # reduce BEFORE combining: h1 + i*h2 overflows long under ANSI;
    # (h1 mod w + i·(h2 mod w)) mod w is identical and overflow-free
    # (i ≤ depth, w ≤ 2^20 ⇒ the sum stays far below 2^63)
    h1 = F.pmod(F.xxhash64(col), w)
    h2 = F.pmod(F.xxhash64(col, F.lit(0x5EED)), w)
    return F.pmod(h1 + row_idx * h2, w)


def cms_build(
    df: DataFrame,
    col: str,
    depth: int = 4,
    width: int = 1024,
    by: Sequence[str] = (),
) -> DataFrame:
    """Count-Min sketch (Cormode & Muthukrishnan 2005) as a RELATIONAL
    sketch: ``(*by, row, bucket, cnt)`` — one row per touched cell,
    sparse. Completes the sketch family (HLL/Theta distinct, KLL
    quantiles, MG heavy hitters) with point FREQUENCY estimates:
    est(x) = min over d rows of cell(row, h_row(x)), never an
    underestimate, overestimate ≤ ε·N with ε = e/width at depth
    ln(1/δ).

    Why relational instead of a binary blob: cells merge by PLAIN SUM
    (``cms_merge`` is one partial-aggregable groupBy — per-day/
    per-partition sketches stored as parquet combine across any
    subset), the representation is engine-portable, and the sparse
    form costs only touched cells. Build is one posexplode (d rows per
    input row) + one map-side-combinable count; the exchange carries
    ≤ d·width rows per group regardless of input size.
    """
    if depth < 1 or width < 2:
        raise ValueError(f"depth >= 1 and width >= 2 required: {depth}, {width}")
    if isinstance(by, str):
        by = [by]
    base = df.where(F.col(col).isNotNull())
    rows = base.select(
        *by,
        F.posexplode(
            F.array(*[
                _cms_bucket(F.col(col).cast("string"), F.lit(i), width)
                for i in range(depth)
            ])
        ).alias("row", "bucket"),
    )
    return rows.groupBy(*by, "row", "bucket").agg(
        F.count(F.lit(1)).alias("cnt")
    )


def cms_merge(
    sketches: DataFrame, by: Sequence[str] = ()
) -> DataFrame:
    """Sum stored cell frames (same depth/width by contract) —
    ONE partial-aggregable groupBy."""
    if isinstance(by, str):
        by = [by]
    return sketches.groupBy(*by, "row", "bucket").agg(
        F.sum("cnt").alias("cnt")
    )


def cms_estimate(
    sketch: DataFrame,
    items: DataFrame,
    item_col: str,
    depth: int = 4,
    width: int = 1024,
    by: Sequence[str] = (),
) -> DataFrame:
    """Point-query a cell frame: ``(*by, item, est)`` with
    est = min over rows (absent cell ⇒ 0 — the sparse form's honest
    floor). ``items`` is the (small) query set; it broadcasts. depth/
    width MUST match the build — they parameterize the hash layout."""
    if isinstance(by, str):
        by = [by]
    probes = items.where(F.col(item_col).isNotNull()).select(
        *by,
        F.col(item_col).alias("item"),
        F.posexplode(
            F.array(*[
                _cms_bucket(F.col(item_col).cast("string"), F.lit(i), width)
                for i in range(depth)
            ])
        ).alias("row", "bucket"),
    )
    joined = F.broadcast(probes).join(sketch, [*by, "row", "bucket"], "left")
    return (
        joined.groupBy(*by, "item")
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("est"))
    )


def weighted_quantiles(
    df: DataFrame,
    value_col: str,
    weight_col: str,
    probabilities: Sequence[float],
    by: Sequence[str] = (),
) -> DataFrame:
    """EXACT weighted quantiles per group — the survey/importance-
    weighted statistic (median income under raked weights (X201),
    p95 latency weighted by request volume) that `percentile()` and
    every sketch get wrong the moment rows carry weights.

    Definition: the weighted LOWER quantile (left-continuous inverse
    CDF) — the smallest value v whose cumulative weight reaches
    ``q · total_weight``. Deterministic, no interpolation (the value
    returned is always an observed value — the convention that
    composes with categorical-coded numerics).

    Scale shape — the ``rank_transform`` value-grain discipline:
    rows first collapse to (group, value) with summed weight (ONE
    map-side-combining groupBy; a 90%-constant column becomes one
    row, never a mega-tie sort), the cumulative weight is a window
    over that VALUE-grain frame (grouped: partitioned by the group
    keys; global by=(): range-split via approx-quantile cuts so no
    single partition ever sees the whole value domain), and each
    requested quantile is a conditional MIN aggregate — one pass for
    all probabilities.
    Rows with NULL value or non-positive/NULL weight are excluded
    (documented; a zero-weight observation carries no mass).

    Output: one row per group with ``prob, value`` (long form via
    Expand — the ``melt`` shape). Oracle: python replay
    (tests/test_weighted_quantiles.py → OPCHECK
    ``weighted_quantiles``).

    The global path (``by=()``) is EAGER: computing the range cuts is
    an ``approxQuantile`` action over the value grain, so the input
    scan runs at call time. The value grain is localCheckpoint'ed
    first, so the main query reuses that materialization instead of
    re-running the scan. Grouped calls (``by`` non-empty) stay fully
    lazy.
    """
    probs = [float(p) for p in probabilities]
    if not probs or any(not 0.0 < p <= 1.0 for p in probs):
        raise ValueError(
            f"probabilities must be in (0, 1], got {probabilities}"
        )
    if isinstance(by, str):
        by = [by]
    by = list(by)
    v = F.col(value_col).cast("double")
    w = F.col(weight_col).cast("double")
    base = df.where(v.isNotNull() & w.isNotNull() & (w > 0)).select(
        *by, v.alias("__v"), w.alias("__w")
    )
    vg = base.groupBy(*by, "__v").agg(F.sum("__w").alias("__w"))
    if by:
        # grouped: groups themselves partition the cumulative-weight
        # window — per-group value grains are bounded by the group.
        win = (
            Window.partitionBy(*by)
            .orderBy("__v")
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        tot = Window.partitionBy(*by)
        cum = vg.withColumn("__cw", F.sum("__w").over(win)).withColumn(
            "__tot", F.sum("__w").over(tot)
        )
    else:
        # global (by=()): a keyless Window would funnel the ENTIRE
        # value-grain frame through one partition. Reuse the
        # rank_transform range-split discipline instead: approx-quantile
        # cuts split the value domain (cut quality only affects load
        # balance, never the result — cumulative weight is range offset
        # + within-range running sum), per-range running sums keep range
        # parallelism, and range totals prefix-sum in a ≤num_ranges
        # metadata window.
        #
        # NOTE: this path is EAGER — approxQuantile is an action, so the
        # scan + filter + value-grain groupBy run at CALL time, not at
        # the caller's first action. localCheckpoint materializes the
        # value grain so that one pass pays for both the cut computation
        # and the main query (without it, vg's lineage would be
        # recomputed from the source a second time).
        vg = vg.localCheckpoint(eager=True)
        num_ranges = 64
        cut_probs = [i / num_ranges for i in range(1, num_ranges)]
        bounds = sorted(set(vg.stat.approxQuantile("__v", cut_probs, 0.01)))
        if bounds:
            cuts = F.array(*[F.lit(float(b)) for b in bounds])
            rng = F.size(F.filter(cuts, lambda b: F.col("__v") > b))
        else:
            rng = F.lit(0)
        marked = vg.withColumn("__rng", rng)
        w_in = (
            Window.partitionBy("__rng")
            .orderBy("__v")
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        within = marked.withColumn("__icw", F.sum("__w").over(w_in))
        totals = marked.groupBy("__rng").agg(F.sum("__w").alias("__rw"))
        w_off = Window.orderBy("__rng").rowsBetween(
            Window.unboundedPreceding, -1
        )
        offsets = totals.withColumn(
            "__off", F.coalesce(F.sum("__rw").over(w_off), F.lit(0.0))
        ).withColumn(
            "__tot",
            F.sum("__rw").over(
                Window.orderBy("__rng").rowsBetween(
                    Window.unboundedPreceding, Window.unboundedFollowing
                )
            ),
        )
        cum = within.join(
            F.broadcast(offsets.select("__rng", "__off", "__tot")),
            "__rng",
            "left",
        ).select(
            "__v",
            "__w",
            (F.col("__off") + F.col("__icw")).alias("__cw"),
            "__tot",
        )
    aggs = [
        F.min(
            F.when(
                F.col("__cw") >= F.lit(p) * F.col("__tot") - F.lit(1e-12),
                F.col("__v"),
            )
        ).alias(f"__q{i}")
        for i, p in enumerate(probs)
    ]
    wide = cum.groupBy(*by).agg(*aggs)
    pairs = F.array(
        *[
            F.struct(
                F.lit(p).alias("prob"), F.col(f"__q{i}").alias("value")
            )
            for i, p in enumerate(probs)
        ]
    )
    return wide.select(*by, F.explode(pairs).alias("__pv")).select(
        *by, F.col("__pv.prob").alias("prob"),
        F.col("__pv.value").alias("value"),
    )
