"""Deterministic sampling and shard packing (training-data pipeline).

A 100 TB corpus is never trained on wholesale: pipelines down-sample
per-source/per-language to a target *mixture*, then pack the survivors
into fixed-token-budget shards. Both steps here are deterministic
functions of the row key — no RNG state, so re-runs, retries and
incremental backfills all select the same rows (the property
``df.sample()`` cannot give you across jobs).

Everything is pure column algebra (md5 + integer arithmetic + window
sums) — JVM-side, codegen-friendly, reproducible bit-for-bit in any
engine with md5 (the DuckDB oracles replay the same expressions).
"""

from __future__ import annotations

from collections.abc import Mapping

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

#: resolution of sampling rates: rate is quantized to 1/1e6
SAMPLE_MOD = 1_000_000


def sample_bucket(key: Column, mod: int = SAMPLE_MOD) -> Column:
    """Uniform deterministic bucket in [0, mod) from a row key: the low
    32 bits of md5(key), mod ``mod``. Positive in 64-bit arithmetic, so
    the same expression reproduces anywhere (DuckDB:
    ``('0x' || substring(md5(k), 9, 8))::UBIGINT % mod``). Uses the
    conv-free ascii fold (``functions.hashing``) — this is the
    primitive under leakage-safe splits and mixtures, where a silently
    corrupted ``conv`` would be invisible."""
    from data_export_tool_spark.functions.hashing import md5_long

    return md5_long(key.cast("string"), 9, 8) % F.lit(mod)


def deterministic_sample(
    df: DataFrame,
    key_col: str,
    rate: float | None = None,
    *,
    strata_col: str | None = None,
    rates: Mapping[str, float] | None = None,
    default_rate: float = 0.0,
    mod: int = SAMPLE_MOD,
) -> DataFrame:
    """Keep a deterministic ``rate`` fraction of rows (optionally a
    different rate per stratum — the "data mixture" operator).

    ``rates`` maps stratum value → keep-rate; strata not listed get
    ``default_rate``. Selection is ``sample_bucket(key) < rate*mod`` —
    a scan-level filter with no shuffle, no RNG, and nested sampling:
    the 10% sample is a superset of the 5% sample, so mixtures can be
    re-weighted without re-selecting disjoint rows.

    Scale: embarrassingly parallel (per-row filter on the scan); the
    only cost is one md5 per row.
    """
    if (rate is None) == (rates is None):
        raise ValueError("pass exactly one of rate= or rates=")
    bucket = sample_bucket(F.col(key_col), mod)
    # round, don't truncate: 0.3 * 1e6 is 299999.99…, and the threshold
    # must equal the integer an oracle writes as a literal
    if rates is None:
        return df.filter(bucket < int(round(rate * mod)))
    if strata_col is None:
        raise ValueError("rates= requires strata_col=")
    thresh: Column = F.lit(int(round(default_rate * mod)))
    for value, r in sorted(rates.items()):
        thresh = F.when(
            F.col(strata_col) == value, int(round(r * mod))
        ).otherwise(thresh)
    return df.filter(bucket < thresh)


def group_split(
    df: DataFrame,
    group_col: str,
    fractions: Mapping[str, float],
    out_col: str = "split",
    mod: int = SAMPLE_MOD,
) -> DataFrame:
    """Leakage-safe train/valid/test assignment: EVERY row of a group
    lands in the same split, because the split is a pure function of
    ``md5(group)`` — the property row-level ``df.randomSplit`` cannot
    give. Split eval sets by the DEDUP CLUSTER (``component_id`` from
    ``duplicate_clusters``/``canonical_by_score``) or by registered
    domain so near-duplicates and same-site pages never straddle the
    train/test boundary — the standard contamination control.

    ``fractions`` maps split name → fraction; they must sum to ≤ 1
    (any remainder falls into the LAST split in sorted-name order, so
    the assignment is total and deterministic). Assignment: the
    group's ``sample_bucket`` is compared against cumulative fraction
    boundaries in sorted-name order — same quantization (1/mod) and
    md5 convention as ``deterministic_sample``, so a DuckDB oracle
    replays it as a CASE over the same integer thresholds.

    Scale: a per-row md5 + CASE at scan level — no shuffle, no count
    job. Stability under re-tuning: growing one split's fraction
    shifts every LATER boundary (sorted-name order) up by the same
    delta, so each group either keeps its split or moves exactly one
    split earlier in that order — never an arbitrary reshuffle, and
    splits named before the grown one are untouched.
    """
    if not fractions:
        raise ValueError("fractions must not be empty")
    total = sum(fractions.values())
    if total > 1.0 + 1e-9:
        raise ValueError(f"fractions sum to {total} > 1")
    names = sorted(fractions)
    bucket = sample_bucket(F.col(group_col), mod)
    boundaries = []
    cum = 0.0
    for name in names:
        cum += fractions[name]
        boundaries.append((name, int(round(cum * mod))))
    # ordered CASE: the first boundary the bucket falls under wins;
    # the last split absorbs its own band plus any rounding remainder
    case: Column | None = None
    for name, bound in boundaries[:-1]:
        cond = bucket < bound
        case = F.when(cond, F.lit(name)) if case is None else case.when(cond, F.lit(name))
    out = case.otherwise(F.lit(names[-1])) if case is not None else F.lit(names[-1])
    return df.withColumn(out_col, out)


def pack_token_shards(
    df: DataFrame,
    token_col: str,
    budget: int,
    order_col: str = "doc_id",
    strata_col: str | None = None,
    num_ranges: int = 32,
    range_bounds: list | None = None,
    bounds_df: DataFrame | None = None,
) -> DataFrame:
    """Assign each row to a fixed-token-budget training shard.

    Rows are laid out in ``order_col`` order (within ``strata_col`` if
    given); a running token sum places each row at a byte-offset-like
    position, and the shard id is ``start_offset // budget`` — i.e.
    contiguous token ranges, deterministic, documents never split (a
    row straddling a boundary belongs to the shard its first token
    falls in). Adds ``cum_tokens`` and ``shard_id``.

    Scale — TWO-PHASE PREFIX SUM (the r2 fix): a plain
    ``Window.partitionBy(stratum).orderBy(order)`` serializes each
    stratum onto ONE task (an 80%-English corpus sorts 80 TB on one
    executor; with no stratum it is a global single-partition sort).
    Instead the order domain is pre-split into ``num_ranges``
    contiguous ranges; phase 1 computes within-range running sums with
    stratum×range parallelism, phase 2 aggregates one total per range
    (reusing phase 1's shuffle via ReusedExchange — the expensive
    upstream is computed once), prefix-sums those metadata-sized
    totals, and broadcast-joins the per-range offsets back. Identical
    output to the single-window form for ANY choice of ranges, because
    ranges partition the order domain contiguously.

    Range boundaries (which never affect output values, only balance):
    ``range_bounds`` if given, else approx quantiles of ``order_col``
    over ``bounds_df`` (pass a cheap relation, e.g. the raw table, so
    planning doesn't execute an expensive upstream) or ``df`` itself.
    ``num_ranges=1`` keeps the classic one-window form.
    """
    strata = [strata_col] if strata_col is not None else []

    if num_ranges <= 1:
        w = (
            Window.partitionBy(*strata).orderBy(order_col)
            if strata
            else Window.orderBy(order_col)
        )
        cum = F.sum(token_col).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        return df.withColumn("cum_tokens", cum).withColumn(
            "shard_id",
            F.floor(
                (F.col("cum_tokens") - F.col(token_col)) / F.lit(budget)
            ).cast("long"),
        )

    if range_bounds is None:
        src = bounds_df if bounds_df is not None else df
        probs = [i / num_ranges for i in range(1, num_ranges)]
        range_bounds = src.stat.approxQuantile(order_col, probs, 0.01)
    # contiguous, order-monotone range id: how many cut points this key
    # exceeds (a higher-order count over ≤num_ranges-1 literals —
    # JVM-side, no shuffle)
    cuts = F.array(*[F.lit(b) for b in sorted(range_bounds)])
    rng = F.size(F.filter(cuts, lambda b: F.col(order_col) > b))

    w_range = Window.partitionBy(*strata, "__rng").orderBy(order_col)
    within = df.withColumn("__rng", rng).withColumn(
        "__wc",
        F.sum(token_col).over(
            w_range.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    # one row per (stratum, range): the range total is the LAST running
    # sum, so the aggregate consumes phase 1's exchange (same clustering
    # keys → no new shuffle, and the join side below reuses the same
    # shuffle files via ReusedExchange)
    totals = within.groupBy(*strata, "__rng").agg(F.max("__wc").alias("__tot"))
    w_off = (
        Window.partitionBy(*strata).orderBy("__rng")
        if strata
        else Window.orderBy("__rng")
    )
    offsets = totals.withColumn(
        "__off",
        F.coalesce(
            F.sum("__tot").over(w_off.rowsBetween(Window.unboundedPreceding, -1)),
            F.lit(0).cast("long"),
        ),
    ).drop("__tot")
    out = within.join(F.broadcast(offsets), on=strata + ["__rng"])
    return (
        out.withColumn("cum_tokens", F.col("__wc") + F.col("__off"))
        .withColumn(
            "shard_id",
            F.floor(
                (F.col("cum_tokens") - F.col(token_col)) / F.lit(budget)
            ).cast("long"),
        )
        .drop("__rng", "__wc", "__off")
    )


def stratified_sample_k(
    df: DataFrame,
    key_col: str,
    strata_col: str,
    k: int,
    mod: int = SAMPLE_MOD,
) -> DataFrame:
    """EXACTLY ``min(k, stratum size)`` deterministic rows per stratum
    (the "give me 10k eval docs per language" operator), without ever
    running a per-stratum window over the full corpus.

    The naive form — ``row_number() OVER (PARTITION BY stratum ORDER
    BY hash)`` ≤ k — serializes each stratum onto one task: a 40%-of-
    corpus stratum means a 40 TB task. Instead:

    1. per-stratum counts (map-side-combined aggregate over a
       column-pruned scan);
    2. oversampled hash filter: keep ``bucket < mod·(k+slack)/n`` with
       ``slack = 6·√k + 64`` — survivors per stratum concentrate at
       k+slack (>6σ margin), so the corpus collapses to ~k rows per
       stratum BEFORE any window runs;
    3. exact trim: ``row_number`` over the (tiny) survivor set;
    4. declarative rescue: strata whose survivors undershot
       ``min(k, n)`` (probability < 1e-9 each, but "exact" must mean
       exact) are re-selected from the base table with the full
       window — the rescue branch is part of the plan but processes
       zero rows unless the bound actually failed.

    Selection is a pure function of ``md5(key)`` — re-runs and
    incremental backfills pick identical rows. NULL strata form their
    own stratum (null-safe joins throughout). Output: the original
    columns of the selected rows.
    """
    import math

    if k < 1:
        raise ValueError(f"k must be >= 1: {k}")
    slack = int(6 * math.sqrt(k)) + 64
    cols = list(df.columns)
    withb = df.withColumn("__b", sample_bucket(F.col(key_col), mod))

    counts = (
        df.groupBy(F.col(strata_col).alias("__s"))
        .agg(F.count(F.lit(1)).alias("__n"))
        .withColumn(
            "__t",
            F.least(
                F.lit(mod).cast("long"),
                F.ceil(F.lit(float(mod)) * F.lit(k + slack) / F.col("__n")).cast(
                    "long"
                ),
            ),
        )
    )
    on_s = F.col(strata_col).eqNullSafe(F.col("__s"))
    surv = withb.join(F.broadcast(counts), on_s).where(F.col("__b") < F.col("__t"))

    surv_counts = surv.groupBy(F.col("__s").alias("__s2")).agg(
        F.count(F.lit(1)).alias("__sc")
    )
    status = F.broadcast(
        counts.join(
            surv_counts, F.col("__s").eqNullSafe(F.col("__s2")), "left"
        ).select(
            "__s",
            (
                F.coalesce(F.col("__sc"), F.lit(0))
                >= F.least(F.lit(k).cast("long"), F.col("__n"))
            ).alias("__ok"),
        )
    )

    w = Window.partitionBy(strata_col).orderBy("__b", key_col)
    trimmed = (
        surv.drop("__s", "__n", "__t")
        .join(status.where(F.col("__ok")), on_s, "left_semi")
        .withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= k)
        .select(*cols)
    )
    rescued = (
        withb.join(status.where(~F.col("__ok")), on_s, "left_semi")
        .withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= k)
        .select(*cols)
    )
    return trimmed.unionByName(rescued)


def weighted_sample_k(
    df: DataFrame,
    key_col: str,
    weight_col: str,
    k: int,
    mod: int = SAMPLE_MOD,
) -> DataFrame:
    """Deterministic weighted sampling WITHOUT replacement: ``k`` rows
    drawn with probability proportional to ``weight_col``, reproducible
    across re-runs (the weighted analog of ``deterministic_sample``).

    Efraimidis–Spirakis A-ES keys (public algorithm): each row gets
    ``u^(1/w)`` for a uniform ``u`` — here the md5 bucket mapped to
    (0,1] — and the k LARGEST keys are the sample. Computed in log
    space (``ln(u)/w``, taking the k largest, i.e. closest to zero)
    for numerical stability. Non-positive / NULL weights are excluded
    (they have zero probability by definition).

    Scale shape: a pure scan-side projection for the key plus ONE
    TakeOrdered (no global sort materializes). Determinism: the key
    is a pure function of (row key, weight), so re-runs and backfills
    select identical rows.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1: {k}")
    # u strictly inside (0, 1): the midpoint shift keeps u < 1 — at
    # u == 1 the key log(1)/w = 0 is the MAXIMUM for every weight, so
    # the ~n/mod rows landing on the top bucket would fill the sample
    # regardless of their weights
    u = (sample_bucket(F.col(key_col), mod) + 0.5).cast("double") / F.lit(
        float(mod)
    )
    es_key = F.log(u) / F.col(weight_col).cast("double")
    return (
        df.where(
            F.col(weight_col).isNotNull() & (F.col(weight_col) > 0)
        )
        .withColumn("__es", es_key)
        .orderBy(F.desc("__es"), F.asc(key_col))
        .limit(k)
        .drop("__es")
    )


def negative_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    k: int = 4,
    bucket_size: int = 32,
    dup_pairs: DataFrame | None = None,
    n_rows: int | None = None,
) -> DataFrame:
    """Deterministic contrastive NEGATIVE sampling: for every anchor
    row, up to ``k`` pseudo-random partner rows that are provably not
    its near-duplicates — the (anchor, negative) pairs a contrastive
    embedding / reranker trainer consumes alongside the dedup tiers'
    positives.

    Scheme (pure md5 arithmetic, bit-replayable by any engine): every
    row hashes into one of ``B ≈ n/bucket_size`` buckets; each anchor
    requests ``k`` slot buckets ``md5(anchor '#' j) mod B`` and takes,
    per slot, the bucket member minimizing ``md5(anchor '|' member)``
    — a deterministic draw that needs no RNG state, is stable under
    reruns/backfills, and never depends on partitioning. Self-pairs
    drop; pass ``dup_pairs`` (any (id_a, id_b) pair frame from the
    dedup tiers) to anti-join same-cluster partners out — the step
    that makes the negatives HONEST.

    Scale shape: one k-way slot explode over the anchors, a hash join
    on the bucket key (both sides ~bucket_size rows per key — no hot
    bucket by construction of the hash), then ONE partial-aggregable
    ``min_by`` per (anchor, slot); the optional dup anti-join is
    id-keyed. ``n_rows`` skips the driver count when the caller
    already knows it. Collisions (two slots drawing the same partner)
    dedup, so an anchor may yield < k pairs; empty buckets likewise —
    the documented trade for determinism with zero shuffles beyond
    the two above.

    Output: ``(anchor_id, negative_id, slot)``.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1: {k}")
    if bucket_size < 2:
        raise ValueError(f"bucket_size must be >= 2: {bucket_size}")
    n = n_rows if n_rows is not None else df.count()
    n_buckets = max(1, n // bucket_size)

    def _h(col: Column) -> Column:
        # first 15 hex chars of md5 → bigint (< 2^60): the same value
        # int(md5hex[:15], 16) yields in python (conv-free fold)
        from data_export_tool_spark.functions.hashing import md5_long

        return md5_long(col, 1, 15)

    ids = df.select(F.col(id_col))
    members = ids.select(
        F.col(id_col).alias("negative_id"),
        F.pmod(_h(F.col(id_col).cast("string")), F.lit(n_buckets)).alias(
            "__b"
        ),
    )
    slots = ids.select(
        F.col(id_col).alias("anchor_id"),
        F.explode(F.array(*[F.lit(j) for j in range(k)])).alias("slot"),
    ).select(
        "anchor_id",
        "slot",
        F.pmod(
            _h(
                F.concat(
                    F.col("anchor_id").cast("string"),
                    F.lit("#"),
                    F.col("slot").cast("string"),
                )
            ),
            F.lit(n_buckets),
        ).alias("__b"),
    )
    cand = slots.join(members, "__b").where(
        F.col("negative_id") != F.col("anchor_id")
    )
    draw_key = _h(
        F.concat(
            F.col("anchor_id").cast("string"),
            F.lit("|"),
            F.col("negative_id").cast("string"),
        )
    )
    picked = (
        cand.groupBy("anchor_id", "slot")
        .agg(
            F.min_by(
                F.col("negative_id"),
                F.struct(draw_key.alias("h"), F.col("negative_id")),
            ).alias("negative_id")
        )
        .dropDuplicates(["anchor_id", "negative_id"])
    )
    if dup_pairs is not None:
        a, b = dup_pairs.columns[0], dup_pairs.columns[1]
        # symmetrize with ONE explode instead of a self-union: the union
        # referenced dup_pairs twice, so an expensive candidate pipeline
        # (e.g. MinHash-LSH) executed twice per action (r10; measured
        # ~1.7 s of b43's 4.7 s warm runtime)
        both = dup_pairs.select(
            F.explode(
                F.array(
                    F.struct(
                        F.col(a).alias("anchor_id"),
                        F.col(b).alias("negative_id"),
                    ),
                    F.struct(
                        F.col(b).alias("anchor_id"),
                        F.col(a).alias("negative_id"),
                    ),
                )
            ).alias("__p")
        ).select("__p.anchor_id", "__p.negative_id")
        picked = picked.join(
            both, ["anchor_id", "negative_id"], "left_anti"
        )
    return picked.select("anchor_id", "negative_id", "slot")


def temperature_mixture_rates(
    df: DataFrame,
    strata_col: str,
    alpha: float = 0.3,
    cap: float = 1.0,
) -> dict:
    """Per-stratum keep-rates that re-shape the corpus toward the
    temperature-sampled mixture ``q_s ∝ p_s^alpha`` (the multilingual
    LM convention — Conneau & Lample 2019 / mT5's α≈0.3: downweight
    head languages, lift the tail without exploding it; ``alpha=1``
    keeps natural proportions, ``alpha=0`` fully balances).

    Down-sampling only (rates ≤ ``cap`` ≤ 1, no row duplication):
    expected kept mass n_s·r_s must be ∝ p_s^alpha, so
    ``r_s = cap · (p_s/p_min)^(alpha−1)`` — the RAREST stratum keeps
    ``cap`` and every larger one keeps proportionally less. One
    map-side-combined count per stratum; the returned dict (stratum →
    rate, driver-sized at stratum cardinality) plugs straight into
    :func:`deterministic_sample` ``rates=``/``strata_col=`` for the
    scan-level, shuffle-free selection. NULL strata are skipped (give
    them an explicit ``default_rate`` at sample time).
    """
    if not 0.0 <= alpha <= 1.0:
        raise ValueError(f"alpha must be in [0, 1]: {alpha}")
    if not 0.0 < cap <= 1.0:
        raise ValueError(f"cap must be in (0, 1]: {cap}")
    counts = {
        r["__s"]: r["__n"]
        for r in df.where(F.col(strata_col).isNotNull())
        .groupBy(F.col(strata_col).alias("__s"))
        .agg(F.count(F.lit(1)).alias("__n"))
        .collect()
    }
    if not counts:
        raise ValueError(f"no non-NULL values in stratum column {strata_col!r}")
    n_min = min(counts.values())
    return {
        s: cap * (n / n_min) ** (alpha - 1.0) for s, n in counts.items()
    }


def temperature_mixture_sample(
    df: DataFrame,
    key_col: str,
    strata_col: str,
    alpha: float = 0.3,
    cap: float = 1.0,
) -> DataFrame:
    """:func:`temperature_mixture_rates` composed with
    :func:`deterministic_sample` — one counting pass, then the
    deterministic scan-level mixture filter (nested-sample property
    preserved: raising ``cap`` only ADDS rows)."""
    rates = temperature_mixture_rates(df, strata_col, alpha, cap)
    return deterministic_sample(
        df, key_col, strata_col=strata_col, rates=rates, default_rate=0.0
    )
