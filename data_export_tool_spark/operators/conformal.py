"""Split-conformal prediction intervals — distribution-free error bars
for the regression stack (ridge/Huber corpus-quality fits).

Vovk et al. / Lei et al.: hold out a calibration set, compute absolute
residuals r_i = |y_i − ŷ_i|, take q̂ = the k-th smallest residual with
k = ⌈(n+1)(1−α)⌉; then [ŷ − q̂, ŷ + q̂] covers the true y of a NEW
exchangeable row with probability ≥ 1−α — no distributional
assumptions, any underlying model.

The exact order statistic at scale WITHOUT a global sort: the k-th
smallest of n residuals is the minimum of the m = n−k+1 largest, and
m ≈ α·(n+1) is SMALL by construction (the miscoverage budget), so
``orderBy(desc).limit(m)`` is a TakeOrdered of α·n rows — exact,
deterministic, no full-data exchange. (Compare: percentile()
interpolation is approximate at FP fraction boundaries; a full sort is
a global exchange. This is the rare quantile that is cheap exactly
BECAUSE it is extreme.)

Calibration rows with NULL y or ŷ are excluded by contract. If
k > n (α too small for the calibration size) the interval is honestly
infinite — the standard conformal degenerate case, surfaced as
``float('inf')`` rather than an error so pipelines can gate on it.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "conformal_fit",
    "conformal_apply",
    "conformal_fit_grouped",
    "conformal_apply_grouped",
]


def conformal_fit(
    cal_df: DataFrame, y_col: str, pred_col: str, alpha: float = 0.1
) -> dict:
    """Fit q̂ on the calibration frame. Returns the plain-dict model
    ``{qhat, n_cal, k, alpha}`` (portable, JSON-able, like the linear
    models)."""
    if not 0 < alpha < 1:
        raise ValueError(f"alpha must be in (0, 1): {alpha}")
    res = cal_df.where(
        F.col(y_col).isNotNull() & F.col(pred_col).isNotNull()
    ).select(F.abs(F.col(y_col) - F.col(pred_col)).alias("__r"))
    n = res.count()
    if n == 0:
        raise ValueError("conformal_fit: empty calibration set")
    k = math.ceil((n + 1) * (1 - alpha))
    if k > n:
        return {"qhat": float("inf"), "n_cal": n, "k": k, "alpha": float(alpha)}
    m = n - k + 1  # ~ alpha*(n+1) rows: the cheap extreme tail
    qhat = res.orderBy(F.desc("__r")).limit(m).agg(F.min("__r")).collect()[0][0]
    return {"qhat": float(qhat), "n_cal": n, "k": k, "alpha": float(alpha)}


def conformal_apply(df: DataFrame, pred_col: str, model: dict) -> DataFrame:
    """Attach ``pi_lo``/``pi_hi`` = ŷ ∓ q̂ — a pure projection, no
    shuffle; NULL predictions yield NULL bounds."""
    q = F.lit(model["qhat"])
    return df.withColumn("pi_lo", F.col(pred_col) - q).withColumn(
        "pi_hi", F.col(pred_col) + q
    )


def conformal_fit_grouped(
    cal_df: DataFrame,
    y_col: str,
    pred_col: str,
    group_col: str,
    alpha: float = 0.1,
) -> DataFrame:
    """Mondrian (group-conditional) conformal: one q̂ PER GROUP, so
    coverage holds within every stratum (per language, per source
    domain) instead of only marginally — the fairness-grade guarantee.

    q̂_g is each group's k_g-th smallest residual (k_g from that
    group's own n_g), read off ONE (group, residual) exchange with a
    per-group rank window. The window sorts the whole group — honestly
    a per-group sort, acceptable here because the CALIBRATION frame is
    the small holdout split by construction, never the corpus (the
    evalmetrics bounded-frame argument; row_number among tied
    residuals is arbitrary but the k-th order VALUE is well-defined).
    Groups where k_g > n_g get an infinite q̂ row (the small-stratum
    degenerate case, surfaced per group).

    Returns (group_col, qhat, n_cal, k) — join it back and build the
    bounds with ``pi_lo = pred − qhat`` downstream, or feed
    :func:`conformal_apply_grouped`.
    """
    if not 0 < alpha < 1:
        raise ValueError(f"alpha must be in (0, 1): {alpha}")
    from pyspark.sql import Window

    res = cal_df.where(
        F.col(y_col).isNotNull()
        & F.col(pred_col).isNotNull()
        & F.col(group_col).isNotNull()
    ).select(
        F.col(group_col),
        F.abs(F.col(y_col) - F.col(pred_col)).alias("__r"),
    )
    w = Window.partitionBy(group_col)
    ranked = res.withColumn("__n", F.count(F.lit(1)).over(w)).withColumn(
        "__rk",
        F.row_number().over(w.orderBy(F.asc("__r"))),
    )
    k = F.ceil((F.col("__n") + 1) * F.lit(1.0 - alpha)).cast("long")
    picked = ranked.withColumn("__k", k).where(
        (F.col("__rk") == F.col("__k")) | ((F.col("__k") > F.col("__n")) & (F.col("__rk") == 1))
    )
    return picked.select(
        group_col,
        F.when(F.col("__k") > F.col("__n"), F.lit(float("inf")))
        .otherwise(F.col("__r"))
        .alias("qhat"),
        F.col("__n").alias("n_cal"),
        F.col("__k").alias("k"),
    )


def conformal_apply_grouped(
    df: DataFrame, pred_col: str, group_col: str, qhat_df: DataFrame
) -> DataFrame:
    """Attach per-group bounds: broadcast join on the (small) group
    frame, then the same pure projection. Rows whose group has no
    calibration q̂ get NULL bounds (surfaced, not guessed)."""
    q = F.broadcast(qhat_df.select(group_col, "qhat"))
    return (
        df.join(q, group_col, "left")
        .withColumn("pi_lo", F.col(pred_col) - F.col("qhat"))
        .withColumn("pi_hi", F.col(pred_col) + F.col("qhat"))
    )
