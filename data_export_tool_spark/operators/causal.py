"""Observational causal-effect estimators: difference-in-differences
and inverse-propensity-weighted ATE.

The questions an event lake gets asked when randomization was NOT
available (the ``experiment.py`` tier assumes it was): "the feature
rolled out to region X on date D — what did it do to spend?" (DiD) and
"users who adopted the feature differ from those who didn't — what is
the adoption effect net of those differences?" (IPW / doubly-robust
AIPW).

Reference scope note: the reference tool (/root/reference/export.py)
has no statistics at all — its 12 SQL line-lists stop at row listings
and one counter report (Tx_Curr_OutComeList.sql). This module is part
of the extended analytics surface (SURVEY.md §2k).

Scale shapes
------------
* ``did_estimate``: ONE conditional-aggregation scan produces the four
  cells' (n, mean, variance) sufficient statistics — map-side combine
  reduces every task to 12 floats — and the driver does closed-form
  arithmetic. Identical discipline to ``experiment.ab_test``.
* ``ipw_ate``: scoring is a broadcast-coefficient column projection
  (no Python in the hot path when ``propensity_col`` is precomputed);
  the estimator is ONE partial-aggregable scan over the weighted
  moments. The optional internal propensity/outcome fits delegate to
  ``linear.logreg_fit`` / ``linear.ridge_fit`` (bounded-round
  metadata-sized Gram/IRLS partials, their own contract).

Estimator conventions (the replay oracle pins these exactly)
-----------------------------------------------------------
* DiD point estimate: (mean_t_post − mean_t_pre) − (mean_c_post −
  mean_c_pre); SE treats the four cells as independent samples,
  se² = Σ var_i/n_i (the standard 2×2 normal approximation); two-sided
  normal p via ``math.erfc``.
* IPW uses the Hájek (self-normalized) form — weights are normalized
  within each arm, so the estimate is invariant to weight scale and
  far more stable under extreme propensities than Horvitz-Thompson.
  Propensities are clipped to [trim, 1−trim] BEFORE weighting
  (overlap trimming, the standard guard against e→0/1 blowing up the
  variance); ``ess_*`` (Kish effective sample size (Σw)²/Σw²) is
  reported so the caller can see how much trimming/imbalance cost.
* AIPW (doubly robust) when both outcome-model columns are supplied:
  mean over all rows of m1 − m0 + t·(y−m1)/e − (1−t)·(y−m0)/(1−e),
  with its influence-function SE = stddev of that row term / √n —
  consistent if EITHER the propensity or the outcome model is right.
"""

from __future__ import annotations

import math
from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = ["did_estimate", "parallel_trends_check", "ipw_ate"]


_DID_SCHEMA = T.StructType(
    [
        T.StructField("n_t_pre", T.LongType()),
        T.StructField("n_t_post", T.LongType()),
        T.StructField("n_c_pre", T.LongType()),
        T.StructField("n_c_post", T.LongType()),
        T.StructField("mean_t_pre", T.DoubleType()),
        T.StructField("mean_t_post", T.DoubleType()),
        T.StructField("mean_c_pre", T.DoubleType()),
        T.StructField("mean_c_post", T.DoubleType()),
        T.StructField("diff_treated", T.DoubleType()),
        T.StructField("diff_control", T.DoubleType()),
        T.StructField("did", T.DoubleType()),
        T.StructField("se", T.DoubleType()),
        T.StructField("z", T.DoubleType()),
        T.StructField("p_value", T.DoubleType()),
        T.StructField("significant", T.BooleanType()),
    ]
)


def _cell_stats(df: DataFrame, metric, cells: dict) -> dict:
    """One conditional-aggregation scan: (n, mean, var) per named
    boolean cell expression. Returns {name: (n, mean, var)}."""
    aggs = []
    for name, cond in cells.items():
        x = F.when(cond, metric)
        aggs += [
            F.count(x).alias(f"__n_{name}"),
            F.avg(x).alias(f"__m_{name}"),
            F.var_samp(x).alias(f"__v_{name}"),
        ]
    row = df.agg(*aggs).first()
    return {
        name: (int(row[f"__n_{name}"]), row[f"__m_{name}"], row[f"__v_{name}"])
        for name in cells
    }


def _did_arithmetic(cells: dict, alpha: float) -> tuple:
    """Closed-form 2×2 DiD from {(arm,period): (n, mean, var)} —
    exposed shape the tests replay bit-for-bit."""
    (n_tp, m_tp, v_tp) = cells["t_pre"]
    (n_tq, m_tq, v_tq) = cells["t_post"]
    (n_cp, m_cp, v_cp) = cells["c_pre"]
    (n_cq, m_cq, v_cq) = cells["c_post"]
    diff_t = diff_c = did = se = z = p = sig = None
    if all(x is not None for x in (m_tp, m_tq)):
        diff_t = m_tq - m_tp
    if all(x is not None for x in (m_cp, m_cq)):
        diff_c = m_cq - m_cp
    if diff_t is not None and diff_c is not None:
        did = diff_t - diff_c
        if all(n >= 2 for n in (n_tp, n_tq, n_cp, n_cq)) and all(
            v is not None for v in (v_tp, v_tq, v_cp, v_cq)
        ):
            se2 = v_tp / n_tp + v_tq / n_tq + v_cp / n_cp + v_cq / n_cq
            if se2 > 0.0:
                se = math.sqrt(se2)
                z = did / se
                p = math.erfc(abs(z) / math.sqrt(2.0))
                sig = bool(p < alpha)
    return (diff_t, diff_c, did, se, z, p, sig)


def did_estimate(
    df: DataFrame,
    group_col: str,
    period_col: str,
    metric_col: str,
    treated,
    control,
    pre,
    post,
    alpha: float = 0.05,
) -> DataFrame:
    """2×2 difference-in-differences readout, one tiny row:
    the four cells' (n, mean), both within-arm post−pre diffs, the
    DiD point estimate, its normal-approx SE/z/p, and ``significant``.

    Rows outside the four (group, period) cells and NULL metrics are
    excluded per cell. Cost: one conditional-aggregation scan.
    """
    metric = F.col(metric_col).cast("double")
    g, q = F.col(group_col), F.col(period_col)
    cells = _cell_stats(
        df,
        metric,
        {
            "t_pre": (g == F.lit(treated)) & (q == F.lit(pre)),
            "t_post": (g == F.lit(treated)) & (q == F.lit(post)),
            "c_pre": (g == F.lit(control)) & (q == F.lit(pre)),
            "c_post": (g == F.lit(control)) & (q == F.lit(post)),
        },
    )
    diff_t, diff_c, did, se, z, p, sig = _did_arithmetic(cells, alpha)
    row = (
        cells["t_pre"][0],
        cells["t_post"][0],
        cells["c_pre"][0],
        cells["c_post"][0],
        cells["t_pre"][1],
        cells["t_post"][1],
        cells["c_pre"][1],
        cells["c_post"][1],
        diff_t,
        diff_c,
        did,
        se,
        z,
        p,
        sig,
    )
    return df.sparkSession.createDataFrame([row], _DID_SCHEMA)


def parallel_trends_check(
    df: DataFrame,
    group_col: str,
    period_col: str,
    metric_col: str,
    treated,
    control,
    pre_periods: Sequence,
    alpha: float = 0.05,
) -> DataFrame:
    """The identification check DiD rests on: placebo DiD between each
    ADJACENT pair of pre-treatment periods. If arms were trending in
    parallel before treatment, every placebo effect should be ≈0; a
    significant row here means the headline ``did_estimate`` readout
    is confounded by a pre-existing differential trend.

    Output: one row per adjacent pre-period pair ``(period_pre,
    period_post, did, se, z, p_value, significant)``. Cost: one
    conditional-aggregation scan covering ALL pairs (every pre-period
    cell is aggregated once and reused for both pairs it belongs to).
    """
    pre_periods = list(pre_periods)
    if len(pre_periods) < 2:
        raise ValueError("parallel_trends_check needs >= 2 pre_periods")
    metric = F.col(metric_col).cast("double")
    g, q = F.col(group_col), F.col(period_col)
    cells = {}
    for i, per in enumerate(pre_periods):
        cells[f"t_{i}"] = (g == F.lit(treated)) & (q == F.lit(per))
        cells[f"c_{i}"] = (g == F.lit(control)) & (q == F.lit(per))
    stats = _cell_stats(df, metric, cells)
    out = []
    for i in range(len(pre_periods) - 1):
        pair = {
            "t_pre": stats[f"t_{i}"],
            "t_post": stats[f"t_{i + 1}"],
            "c_pre": stats[f"c_{i}"],
            "c_post": stats[f"c_{i + 1}"],
        }
        _, _, did, se, z, p, sig = _did_arithmetic(pair, alpha)
        out.append(
            (str(pre_periods[i]), str(pre_periods[i + 1]), did, se, z, p, sig)
        )
    schema = T.StructType(
        [
            T.StructField("period_pre", T.StringType()),
            T.StructField("period_post", T.StringType()),
            T.StructField("did", T.DoubleType()),
            T.StructField("se", T.DoubleType()),
            T.StructField("z", T.DoubleType()),
            T.StructField("p_value", T.DoubleType()),
            T.StructField("significant", T.BooleanType()),
        ]
    )
    return df.sparkSession.createDataFrame(out, schema)


_IPW_SCHEMA = T.StructType(
    [
        T.StructField("estimator", T.StringType()),
        T.StructField("n", T.LongType()),
        T.StructField("n_treated", T.LongType()),
        T.StructField("n_control", T.LongType()),
        T.StructField("mean_treated", T.DoubleType()),
        T.StructField("mean_control", T.DoubleType()),
        T.StructField("ate", T.DoubleType()),
        T.StructField("se", T.DoubleType()),
        T.StructField("z", T.DoubleType()),
        T.StructField("p_value", T.DoubleType()),
        T.StructField("significant", T.BooleanType()),
        T.StructField("ess_treated", T.DoubleType()),
        T.StructField("ess_control", T.DoubleType()),
        T.StructField("n_trimmed", T.LongType()),
    ]
)


def ipw_ate(
    df: DataFrame,
    treatment_col: str,
    outcome_col: str,
    propensity_col: str | None = None,
    vec_col: str | None = None,
    mu1_col: str | None = None,
    mu0_col: str | None = None,
    trim: float = 0.01,
    alpha: float = 0.05,
    reg: float = 1e-3,
) -> DataFrame:
    """Average-treatment-effect readout under unconfoundedness, one
    tiny row (schema above).

    Propensity source, in precedence order: ``propensity_col`` (a
    precomputed P(T=1|X) column — the zero-Python fast path, and the
    path the replay oracle pins), else an internal
    ``linear.logreg_fit(df, treatment_col, vec_col)`` fit + broadcast-
    coefficient scoring over the ``array<double>`` features.

    Estimator: Hájek IPW by default. If BOTH ``mu1_col`` and
    ``mu0_col`` (outcome-model predictions per arm) are present, the
    doubly-robust AIPW form instead, with influence-function SE.
    ``trim`` clips e to [trim, 1−trim]; ``n_trimmed`` counts clipped
    rows. NULL treatment/outcome/propensity rows are excluded.
    """
    if not 0.0 <= trim < 0.5:
        raise ValueError(f"trim must be in [0, 0.5): {trim}")
    t = F.col(treatment_col).cast("double")
    y = F.col(outcome_col).cast("double")
    if propensity_col is not None:
        e_raw = F.col(propensity_col).cast("double")
    elif vec_col is not None:
        from .linear import logreg_fit

        model = logreg_fit(df, treatment_col, vec_col=vec_col, reg=reg)
        w = model["weights"]
        lin = F.lit(float(model["intercept"]))
        for i, wi in enumerate(w):
            lin = lin + F.lit(float(wi)) * F.col(vec_col)[i]
        # the same ±35 clamp logreg_fit trains with
        lin = F.greatest(F.lit(-35.0), F.least(F.lit(35.0), lin))
        e_raw = F.lit(1.0) / (F.lit(1.0) + F.exp(-lin))
    else:
        raise ValueError("ipw_ate needs propensity_col or vec_col")

    base = df.where(t.isNotNull() & y.isNotNull() & e_raw.isNotNull())
    lo, hi = F.lit(float(trim)), F.lit(1.0 - float(trim))
    e = F.greatest(lo, F.least(hi, e_raw))
    trimmed = (e_raw < lo) | (e_raw > hi)

    doubly = mu1_col is not None and mu0_col is not None
    if doubly:
        m1 = F.col(mu1_col).cast("double")
        m0 = F.col(mu0_col).cast("double")
        base = base.where(m1.isNotNull() & m0.isNotNull())
        phi = (
            m1
            - m0
            + t * (y - m1) / e
            - (F.lit(1.0) - t) * (y - m0) / (F.lit(1.0) - e)
        )
        row = base.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(t).alias("nt"),
            F.avg(phi).alias("ate"),
            F.var_samp(phi).alias("vphi"),
            F.sum(F.when(t == 1.0, y) / e).alias("sy1"),
            F.sum(F.when(t == 1.0, F.lit(1.0)) / e).alias("sw1"),
            F.sum((F.when(t == 1.0, F.lit(1.0)) / e) ** 2).alias("sw1sq"),
            F.sum(F.when(t == 0.0, y) / (F.lit(1.0) - e)).alias("sy0"),
            F.sum(F.when(t == 0.0, F.lit(1.0)) / (F.lit(1.0) - e)).alias("sw0"),
            F.sum((F.when(t == 0.0, F.lit(1.0)) / (F.lit(1.0) - e)) ** 2).alias(
                "sw0sq"
            ),
            F.sum(trimmed.cast("long")).alias("ntrim"),
        ).first()
        n = int(row["n"])
        ate, se = row["ate"], None
        if n >= 2 and row["vphi"] is not None and row["vphi"] >= 0.0:
            se = math.sqrt(row["vphi"] / n)
        estimator = "aipw"
    else:
        w1 = F.when(t == 1.0, F.lit(1.0)) / e
        w0 = F.when(t == 0.0, F.lit(1.0)) / (F.lit(1.0) - e)
        row = base.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(t).alias("nt"),
            F.sum(w1 * y).alias("sy1"),
            F.sum(w1).alias("sw1"),
            F.sum(w1 * w1).alias("sw1sq"),
            F.sum(w1 * y * y).alias("syy1"),
            F.sum(w0 * y).alias("sy0"),
            F.sum(w0).alias("sw0"),
            F.sum(w0 * w0).alias("sw0sq"),
            F.sum(w0 * y * y).alias("syy0"),
            F.sum(trimmed.cast("long")).alias("ntrim"),
        ).first()
        n = int(row["n"])
        ate = se = None
        estimator = "ipw"

    nt = int(row["nt"] or 0)
    nc = n - nt
    mean_t = mean_c = None
    if row["sw1"] and row["sw1"] > 0.0:
        mean_t = row["sy1"] / row["sw1"]
    if row["sw0"] and row["sw0"] > 0.0:
        mean_c = row["sy0"] / row["sw0"]
    if not doubly and mean_t is not None and mean_c is not None:
        ate = mean_t - mean_c
        # weighted-variance SE of each Hájek arm mean, combined
        se2 = 0.0
        ok = True
        for sy, sw, swsq, syy, m in (
            (row["sy1"], row["sw1"], row["sw1sq"], row["syy1"], mean_t),
            (row["sy0"], row["sw0"], row["sw0sq"], row["syy0"], mean_c),
        ):
            ess = sw * sw / swsq if swsq and swsq > 0.0 else 0.0
            if ess <= 1.0:
                ok = False
                break
            # weighted sample variance around the weighted mean
            wvar = (syy - 2.0 * m * sy + m * m * sw) / sw
            if wvar < 0.0:
                wvar = 0.0
            se2 += wvar / ess
        if ok and se2 > 0.0:
            se = math.sqrt(se2)
    z = p = sig = None
    if ate is not None and se is not None and se > 0.0:
        z = ate / se
        p = math.erfc(abs(z) / math.sqrt(2.0))
        sig = bool(p < alpha)
    ess_t = (
        row["sw1"] ** 2 / row["sw1sq"]
        if row["sw1sq"] and row["sw1sq"] > 0.0
        else None
    )
    ess_c = (
        row["sw0"] ** 2 / row["sw0sq"]
        if row["sw0sq"] and row["sw0sq"] > 0.0
        else None
    )
    out = (
        estimator,
        n,
        nt,
        nc,
        mean_t,
        mean_c,
        ate,
        se,
        z,
        p,
        sig,
        ess_t,
        ess_c,
        int(row["ntrim"] or 0),
    )
    return df.sparkSession.createDataFrame([out], _IPW_SCHEMA)
