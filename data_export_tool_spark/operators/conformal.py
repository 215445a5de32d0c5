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

__all__ = ["conformal_fit", "conformal_apply"]


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
