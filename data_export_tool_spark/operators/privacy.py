"""Re-identification risk audits: k-anonymity and l-diversity.

The reference is a health-facility data-export tool
(`/root/reference/export.py` ships patient-level line lists to CSV);
before such an export leaves the building, the standard disclosure
check is k-anonymity [Sweeney 2002]: every combination of
quasi-identifier values (region + birth year + sex, ...) must be shared
by at least k exported rows, else the rare combination re-identifies a
person. l-diversity [Machanavelli et al. 2007] strengthens it: each
such equivalence class must also contain at least l distinct values of
every sensitive attribute, else membership alone discloses the
sensitive value.

Shapes (all scale-safe, one key-hash exchange each):

- ``equivalence_classes``: one groupBy on the quasi columns — partial
  aggregation absorbs hot classes map-side; per-class ``countDistinct``
  of each sensitive column rides the same aggregate.
- ``k_anonymity_report``: driver-sized second aggregate over the
  class-grain frame (one row out).
- ``risky_classes``: the class-grain frame filtered to violations —
  the review list, already smallest-first.
- ``suppress_small_classes``: a left-semi join of the input against
  the compliant classes on the quasi key — the classic "suppress
  outlier cells" release step. The class frame is aggregated (≤ one
  row per class), so AQE sizes/broadcasts the join; rows never pass
  through a window.

NULL policy: GROUP BY treats NULL as a value (a class of its own —
matching DuckDB/ANSI, so the oracles replay 1:1); ``countDistinct``
ignores NULL sensitive values, so an all-NULL class has diversity 0
and always fails an l ≥ 1 check — the conservative reading.
Generalization (coarsening a column until classes merge) composes from
existing pieces: bin numerics with ``features.fit_quantile_bins`` /
``apply_quantile_bins`` and re-audit.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "equivalence_classes",
    "k_anonymity_report",
    "risky_classes",
    "suppress_small_classes",
    "dp_release_counts",
]


def _cols(cols: Sequence[str] | str) -> list[str]:
    return [cols] if isinstance(cols, str) else list(cols)


def equivalence_classes(
    df: DataFrame,
    quasi_cols: Sequence[str] | str,
    sensitive_cols: Sequence[str] | str = (),
) -> DataFrame:
    """Class-grain frame: one row per distinct quasi-identifier
    combination with ``class_size`` and, per sensitive column, the
    distinct-value count ``distinct_<col>`` (its l-diversity)."""
    quasi = _cols(quasi_cols)
    if not quasi:
        raise ValueError("quasi_cols must name at least one column")
    aggs = [F.count(F.lit(1)).alias("class_size")]
    for s in _cols(sensitive_cols):
        aggs.append(F.countDistinct(F.col(s)).alias(f"distinct_{s}"))
    return df.groupBy(*quasi).agg(*aggs)


def k_anonymity_report(
    df: DataFrame,
    quasi_cols: Sequence[str] | str,
    k: int,
    sensitive_cols: Sequence[str] | str = (),
    l: int = 2,
) -> DataFrame:
    """One-row disclosure summary of a prospective export:
    ``n_rows``, ``n_classes``, ``min_class_size`` (the dataset's
    actual k-anonymity), ``classes_below_k`` / ``rows_below_k``
    (suppression cost of enforcing ``k``), and per sensitive column
    ``min_diversity_<col>`` + ``classes_below_l_<col>``.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1: {k}")
    if l < 1:
        raise ValueError(f"l must be >= 1: {l}")
    classes = equivalence_classes(df, quasi_cols, sensitive_cols)
    sz = F.col("class_size")
    aggs = [
        F.sum(sz).alias("n_rows"),
        F.count(F.lit(1)).alias("n_classes"),
        F.min(sz).alias("min_class_size"),
        F.sum(F.when(sz < k, 1).otherwise(0)).alias("classes_below_k"),
        F.sum(F.when(sz < k, sz).otherwise(0)).alias("rows_below_k"),
    ]
    for s in _cols(sensitive_cols):
        dv = F.col(f"distinct_{s}")
        aggs.append(F.min(dv).alias(f"min_diversity_{s}"))
        aggs.append(
            F.sum(F.when(dv < l, 1).otherwise(0)).alias(f"classes_below_l_{s}")
        )
    return classes.agg(*aggs)


def risky_classes(
    df: DataFrame,
    quasi_cols: Sequence[str] | str,
    k: int,
    sensitive_cols: Sequence[str] | str = (),
    l: int = 2,
) -> DataFrame:
    """The violation list: classes with ``class_size < k`` or any
    sensitive diversity < ``l``, smallest classes first — what a
    reviewer actually reads before deciding to generalize or
    suppress."""
    classes = equivalence_classes(df, quasi_cols, sensitive_cols)
    cond = F.col("class_size") < k
    for s in _cols(sensitive_cols):
        cond = cond | (F.col(f"distinct_{s}") < l)
    return classes.where(cond).orderBy("class_size", *_cols(quasi_cols))


def suppress_small_classes(
    df: DataFrame,
    quasi_cols: Sequence[str] | str,
    k: int,
    sensitive_cols: Sequence[str] | str = (),
    l: int = 2,
) -> DataFrame:
    """Release-ready subset: only rows whose quasi-identifier class
    satisfies both thresholds survive (cell suppression). Exactly the
    complement of ``risky_classes``' membership — the tests pin
    ``suppressed ∪ risky-class rows == input``."""
    classes = equivalence_classes(df, quasi_cols, sensitive_cols)
    cond = F.col("class_size") >= k
    for s in _cols(sensitive_cols):
        cond = cond & (F.col(f"distinct_{s}") >= l)
    keep = classes.where(cond).select(*_cols(quasi_cols))
    # NULL-safe key equality: NULL quasi values form real classes, and
    # a plain equi-join would drop their rows even when compliant
    join_cond = None
    for q in _cols(quasi_cols):
        c = df[q].eqNullSafe(keep[q])
        join_cond = c if join_cond is None else (join_cond & c)
    return df.join(keep, join_cond, "left_semi")


def dp_release_counts(
    df: DataFrame,
    group_cols: Sequence[str] | str,
    epsilon: float,
    user_col: str | None = None,
    max_contributions: int = 1,
    seed: int = 42,
    clamp_nonnegative: bool = True,
) -> DataFrame:
    """ε-differentially-private group counts (Laplace mechanism,
    Dwork et al. 2006) with USER-LEVEL contribution bounding — the
    release step when even suppressed k-anonymous aggregates are too
    disclosive (k-anonymity composes badly across releases; DP's
    guarantee survives composition with a budget).

    Mechanism: count per group, add Laplace(Δ/ε) noise where the
    sensitivity Δ = ``max_contributions`` — enforced, not assumed:
    when ``user_col`` is given, each user's contribution to a group's
    count is capped at ``max_contributions`` (per-(user, group)
    pre-count, then ``least(count, cap)`` summed — for a COUNT release
    this is exactly "keep at most cap rows per user per group",
    without the window a row-level cap would need), so one person
    entering or leaving the data changes any count by at most Δ — the
    promise ε-DP is about. Without ``user_col`` the unit of privacy is
    the row (event-level DP) and Δ = 1.

    Scale: bounding is a two-phase partial-aggregable groupBy chain
    (no window, no skew cliff — a bot user's million rows collapse
    map-side); noise is pure column arithmetic (md5 → uniform →
    inverse-CDF Laplace), one value per RELEASED CELL.

    REPRODUCIBILITY vs SECRECY — read before production use: noise is
    derived deterministically from ``seed`` + the group key (the
    repo-wide replayable-oracle convention, and what makes the tests
    exact). The DP guarantee holds only against an adversary who does
    NOT know the noise; a production release must draw ``seed`` from a
    secret entropy source and never publish or reuse it (reusing one
    seed across releases also burns the budget silently). The
    mechanism's math is unchanged either way.

    Output: ``(*group_cols, n_true_bounded, n_released)`` —
    ``n_true_bounded`` is the pre-noise bounded count (keep it
    INTERNAL; publishing it defeats the mechanism — it rides here for
    audit pipelines and tests), ``n_released`` the noisy integer
    (clamped at 0 unless ``clamp_nonnegative=False``; clamping is
    post-processing, which DP permits).
    """
    from data_export_tool_spark.functions.hashing import md5_long

    groups = _cols(group_cols)
    if not groups:
        raise ValueError("group_cols must name at least one column")
    if not epsilon > 0:
        raise ValueError(f"epsilon must be > 0: {epsilon}")
    if max_contributions < 1:
        raise ValueError(f"max_contributions must be >= 1: {max_contributions}")

    if user_col is not None:
        delta = max_contributions
        per_user = (
            df.where(F.col(user_col).isNotNull())
            .groupBy(user_col, *groups)
            .agg(F.count(F.lit(1)).alias("__c"))
        )
        counts = per_user.groupBy(*groups).agg(
            F.sum(F.least(F.col("__c"), F.lit(max_contributions))).alias(
                "n_true_bounded"
            )
        )
    else:
        delta = 1
        counts = df.groupBy(*groups).agg(
            F.count(F.lit(1)).alias("n_true_bounded")
        )
    # seeded Laplace via inverse CDF of an md5 uniform in (0, 1):
    # u = (h + 0.5) / 2^32 can never hit 0/0.5/1 exactly, so the logs
    # below are finite
    key = F.concat_ws(
        "␟", F.lit(str(seed)), *[F.col(g).cast("string") for g in groups]
    )
    u = (md5_long(key, 9, 8) + F.lit(0.5)) / F.lit(float(1 << 32))
    b = float(delta) / float(epsilon)
    centered = u - F.lit(0.5)
    lap = (
        -F.lit(b)
        * F.signum(centered)
        * F.log(1.0 - 2.0 * F.abs(centered))
    )
    released = F.round(F.col("n_true_bounded") + lap).cast("long")
    if clamp_nonnegative:
        released = F.greatest(released, F.lit(0).cast("long"))
    return counts.withColumn("n_released", released)


def dp_release_quantiles(
    df: DataFrame,
    value_col: str,
    probs: Sequence[float],
    epsilon: float,
    lo: float,
    hi: float,
    n_bins: int = 64,
    group_cols: Sequence[str] | str = (),
    user_col: str | None = None,
    max_contributions: int = 1,
    seed: int = 42,
) -> DataFrame:
    """ε-differentially-private quantile release via a NOISED HISTOGRAM
    + CDF-inversion post-processing — the DP family's answer for
    "median latency per region" when even the k-anonymous aggregate is
    too disclosive.

    Mechanism: values clamp into the PUBLIC range [``lo``, ``hi``]
    (DP needs data-independent bounds — passing data-derived bounds
    leaks; that is the caller's contract, stated loudly here), bucket
    into ``n_bins`` equal-width bins, per-(group, bin) counts get
    Laplace(Δ₁/ε) noise where the L1 sensitivity Δ₁ is ENFORCED
    user-level contribution bounding (each user keeps at most
    ``max_contributions`` rows per group — a deterministic
    first-m-units cap over the user's per-bin counts, computed with a
    window over ≤ n_bins pre-aggregated rows per (user, group), so no
    skew cliff: a bot user's million rows collapse in the partial
    aggregate first). Without ``user_col`` the row is the privacy unit
    and Δ₁ = 1. Noised bins clamp at 0, then every requested quantile
    reads the noisy CDF: smallest bin whose cumulative share ≥ p,
    released value = that bin's midpoint (half-bin-width resolution;
    post-processing, which DP permits — the histogram is the one
    ε-budget spend regardless of how many quantiles are read).

    Same REPRODUCIBILITY vs SECRECY contract as ``dp_release_counts``:
    noise derives deterministically from ``seed`` + group + bin for
    replayable oracles; production must use a secret, unpublished,
    per-release seed.

    Output: ``(*group_cols, p, value_released, n_released_total)`` —
    one row per (group, requested quantile); groups whose noisy total
    is ≤ 0 answer NULL (no signal survived the noise — the honest
    answer, not bin 0's midpoint).
    """
    from data_export_tool_spark.functions.hashing import md5_long

    groups = _cols(group_cols)
    probs = [float(p) for p in probs]
    if not probs or not all(0 < p <= 1 for p in probs):
        raise ValueError(f"probs must be in (0, 1]: {probs}")
    if not epsilon > 0:
        raise ValueError(f"epsilon must be > 0: {epsilon}")
    if not hi > lo:
        raise ValueError(f"need hi > lo: {lo}, {hi}")
    if n_bins < 2:
        raise ValueError(f"n_bins must be >= 2: {n_bins}")
    if max_contributions < 1:
        raise ValueError(f"max_contributions must be >= 1: {max_contributions}")
    x = F.col(value_col).cast("double")
    w = (float(hi) - float(lo)) / n_bins
    clamped = F.least(F.greatest(x, F.lit(float(lo))), F.lit(float(hi)))
    bin_idx = F.least(
        F.floor((clamped - F.lit(float(lo))) / F.lit(w)).cast("int"),
        F.lit(n_bins - 1),
    )
    base = df.where(x.isNotNull()).select(
        *groups, *( [F.col(user_col)] if user_col else [] ),
        bin_idx.alias("__bin"),
    )
    if user_col is not None:
        delta = float(max_contributions)
        per = (
            base.where(F.col(user_col).isNotNull())
            .groupBy(user_col, *groups, "__bin")
            .agg(F.count(F.lit(1)).alias("__c"))
        )
        # first-m-units cap per (user, group), deterministic bin order;
        # the window sees <= n_bins pre-aggregated rows per key
        from pyspark.sql import Window

        win = (
            Window.partitionBy(user_col, *groups)
            .orderBy("__bin")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        cum = F.sum("__c").over(win)
        kept = F.greatest(
            F.least(
                F.col("__c"),
                F.lit(max_contributions) - (cum - F.col("__c")),
            ),
            F.lit(0),
        )
        cells = (
            per.select(*groups, "__bin", kept.alias("__k"))
            .groupBy(*groups, "__bin")
            .agg(F.sum("__k").alias("n_true"))
            # capping can zero a cell entirely; the release is SPARSE
            # (only touched cells carry noise — the cms_build
            # convention, and what the replay oracle builds), so a
            # capped-to-zero cell must not linger and attract noise
            .where(F.col("n_true") > 0)
        )
    else:
        delta = 1.0
        cells = base.groupBy(*groups, "__bin").agg(
            F.count(F.lit(1)).alias("n_true")
        )
    key = F.concat_ws(
        "␟",
        F.lit(str(seed)),
        *[F.col(g).cast("string") for g in groups],
        F.col("__bin").cast("string"),
    )
    u = (md5_long(key, 9, 8) + F.lit(0.5)) / F.lit(float(1 << 32))
    b = delta / float(epsilon)
    centered = u - F.lit(0.5)
    lap = -F.lit(b) * F.signum(centered) * F.log(1.0 - 2.0 * F.abs(centered))
    noisy = cells.select(
        *groups,
        "__bin",
        F.greatest(
            F.round(F.col("n_true") + lap), F.lit(0.0)
        ).alias("__n"),
    )
    # CDF inversion as bounded column algebra: fold the <= n_bins cells
    # of each group into a sorted array (bin, n) and read every
    # requested quantile from it — no second shuffle, no window
    folded = noisy.groupBy(*groups).agg(
        F.sort_array(
            F.collect_list(F.struct(F.col("__bin"), F.col("__n")))
        ).alias("__cells"),
        F.sum("__n").alias("n_released_total"),
    )
    out_rows = []
    tot = F.col("n_released_total")
    for p in probs:
        target = F.lit(p) * tot
        # running cumulative over the sorted cells; first bin where
        # cum >= target (aggregate carries (cum, answer))
        acc0 = F.struct(
            F.lit(0.0).alias("cum"), F.lit(None).cast("int").alias("bin")
        )
        picked = F.aggregate(
            F.col("__cells"),
            acc0,
            lambda acc, c: F.struct(
                (acc["cum"] + c["__n"]).alias("cum"),
                F.when(
                    acc["bin"].isNull()
                    & (acc["cum"] + c["__n"] >= target),
                    c["__bin"],
                ).otherwise(acc["bin"]).alias("bin"),
            ),
        )["bin"]
        val = F.when(
            tot > 0,
            F.lit(float(lo)) + (picked + F.lit(0.5)) * F.lit(w),
        )
        out_rows.append(
            folded.select(
                *groups,
                F.lit(p).alias("p"),
                F.round(val, 9).alias("value_released"),
                tot.cast("long").alias("n_released_total"),
            )
        )
    out = out_rows[0]
    for extra in out_rows[1:]:
        out = out.unionByName(extra)
    return out
