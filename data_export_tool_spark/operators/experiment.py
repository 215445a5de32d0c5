"""A/B experiment readout: Welch's two-sample test per metric.

The decision table an experimentation platform derives from an event
lake: for each metric, the two groups' sizes/means, the relative lift,
Welch's t statistic (unequal variances — the safe default; Welch
1947), and a two-sided p-value. At experiment scale (thousands-to-
millions of units per arm) the t statistic's null distribution is
indistinguishable from normal, so the p-value uses the normal
approximation — dependency-free (``math.erfc``) and replayable by any
oracle; below ~30 units per arm read it as approximate.

Scale shape: ONE partial-aggregable conditional-aggregation pass
computes every (group × metric) count/mean/variance — map-side combine
reduces each task to 6·m floats before the single-row exchange; the
driver then does closed-form arithmetic on that row. Nothing else
touches the data.
"""

from __future__ import annotations

import math
from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = ["ab_test", "py_welch", "fdr_correct", "bayes_ab", "py_prob_b_beats_a"]


def py_welch(
    n_a: int, mean_a: float, var_a: float, n_b: int, mean_b: float, var_b: float
) -> tuple[float | None, float | None]:
    """(t statistic, two-sided normal-approx p-value) from the two
    arms' sufficient statistics — the exact arithmetic ``ab_test``
    applies, exposed so oracles replay it bit-for-bit."""
    if n_a < 2 or n_b < 2 or var_a is None or var_b is None:
        return None, None
    se2 = var_a / n_a + var_b / n_b
    if se2 <= 0.0:
        return None, None
    t = (mean_b - mean_a) / math.sqrt(se2)
    p = math.erfc(abs(t) / math.sqrt(2.0))
    return t, p


def ab_test(
    df: DataFrame,
    group_col: str,
    metric_cols: Sequence[str],
    group_a,
    group_b,
    alpha: float = 0.05,
) -> DataFrame:
    """Per-metric Welch test between ``group_a`` (control) and
    ``group_b`` (treatment) rows of ``df``. Output, one tiny row per
    metric: ``(metric, n_a, n_b, mean_a, mean_b, lift, t_stat,
    p_value, significant)`` where ``lift = (mean_b − mean_a)/mean_a``
    (NULL when the control mean is 0) and ``significant = p_value <
    alpha``. NULL metric values are excluded per metric (each metric
    keeps its own n). Cost: one conditional-aggregation scan.
    """
    metric_cols = [metric_cols] if isinstance(metric_cols, str) else list(metric_cols)
    if not metric_cols:
        raise ValueError("ab_test needs at least one metric column")
    ga, gb = F.lit(group_a), F.lit(group_b)
    aggs = []
    for m in metric_cols:
        x = F.col(m).cast("double")
        xa = F.when(F.col(group_col) == ga, x)
        xb = F.when(F.col(group_col) == gb, x)
        aggs += [
            F.count(xa).alias(f"__na_{m}"),
            F.avg(xa).alias(f"__ma_{m}"),
            F.var_samp(xa).alias(f"__va_{m}"),
            F.count(xb).alias(f"__nb_{m}"),
            F.avg(xb).alias(f"__mb_{m}"),
            F.var_samp(xb).alias(f"__vb_{m}"),
        ]
    row = df.agg(*aggs).first()
    out = []
    for m in metric_cols:
        n_a, mean_a, var_a = row[f"__na_{m}"], row[f"__ma_{m}"], row[f"__va_{m}"]
        n_b, mean_b, var_b = row[f"__nb_{m}"], row[f"__mb_{m}"], row[f"__vb_{m}"]
        t = p = lift = None
        if mean_a is not None and mean_b is not None and mean_a != 0.0:
            lift = (mean_b - mean_a) / mean_a
        if n_a >= 2 and n_b >= 2:
            t, p = py_welch(n_a, mean_a, var_a, n_b, mean_b, var_b)
        out.append(
            (
                m,
                int(n_a),
                int(n_b),
                mean_a,
                mean_b,
                lift,
                t,
                p,
                None if p is None else bool(p < alpha),
            )
        )
    schema = T.StructType(
        [
            T.StructField("metric", T.StringType()),
            T.StructField("n_a", T.LongType()),
            T.StructField("n_b", T.LongType()),
            T.StructField("mean_a", T.DoubleType()),
            T.StructField("mean_b", T.DoubleType()),
            T.StructField("lift", T.DoubleType()),
            T.StructField("t_stat", T.DoubleType()),
            T.StructField("p_value", T.DoubleType()),
            T.StructField("significant", T.BooleanType()),
        ]
    )
    return df.sparkSession.createDataFrame(out, schema)


def fdr_correct(
    df,
    p_col: str = "p_value",
    alpha: float = 0.05,
    by: tuple = (),
):
    """Benjamini-Hochberg step-up FDR control over a frame of test
    p-values — the missing piece when :func:`ab_test` reads out MANY
    metrics at once: per-test α=0.05 significance inflates family-wise
    false discoveries; BH bounds the EXPECTED false-discovery RATE at
    α instead.

    Adds ``p_rank`` (ascending p, ties to input order of p then
    row-stability via p itself), ``p_adj`` (the standard adjusted
    p-value: monotone right-to-left running min of m·p_(i)/i, capped
    at 1) and ``reject_fdr`` (step-up rule: reject all i ≤ k where
    k = max{i : p_(i) ≤ i·α/m} — equivalently p_adj ≤ α). NULL
    p-values are excluded (they were never tested).

    Scale: the frame is metric-grain (one row per test) — bounded by
    the metric count, the evalmetrics bounded-frame argument; with
    ``by`` the windows partition per family (per experiment). All
    window algebra; DuckDB-replayable.
    """
    from pyspark.sql import Window

    if not 0 < alpha < 1:
        raise ValueError(f"alpha must be in (0, 1): {alpha}")
    keys = list(by) if not isinstance(by, str) else [by]
    base = df.where(F.col(p_col).isNotNull())
    wp = Window.partitionBy(*keys) if keys else Window.partitionBy()
    w_rank = wp.orderBy(F.asc(p_col))
    out = base.withColumn("p_rank", F.row_number().over(w_rank)).withColumn(
        "__m", F.count(F.lit(1)).over(wp.rowsBetween(
            Window.unboundedPreceding, Window.unboundedFollowing))
    )
    # adjusted p: running min of m*p/i from the LARGEST p downward.
    # Tie-break DESC on p_rank so within a tied-p group the larger rank
    # (smaller m*p/rank term) is seen first — every tied row then picks
    # up its twin's smaller term, giving the textbook
    # p_adj(i) = min_{j>=i} m*p_(j)/j (a desc-p-only ROWS frame is both
    # nondeterministic under ties and misses the twin's term: BH on
    # p=[0.01, 0.01] must yield p_adj=[0.01, 0.01], not [0.02, 0.01]).
    w_rev = wp.orderBy(F.desc(p_col), F.desc("p_rank")).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    out = out.withColumn(
        "p_adj",
        F.least(
            F.lit(1.0),
            F.min(F.col("__m") * F.col(p_col) / F.col("p_rank")).over(w_rev),
        ),
    )
    return out.withColumn(
        "reject_fdr", F.col("p_adj") <= F.lit(float(alpha))
    ).drop("__m")


def mann_whitney(
    df: DataFrame,
    value_col: str,
    group_col: str,
    group_a,
    group_b,
    num_ranges: int = 64,
) -> DataFrame:
    """Exact Mann-Whitney U / Wilcoxon rank-sum with midrank tie
    handling, plus Cliff's delta — the DISTRIBUTION-FREE sibling of
    ``ab_test`` for skewed metrics (latency, spend, token counts)
    where Welch's mean comparison answers the wrong question. Cliff's
    delta = P(a > b) − P(a < b) = 2U_a/(n_a·n_b) − 1 is the robust
    effect size readers actually want (−1..1, 0 = stochastic
    equality).

    Scale shape: ranks come from the two-phase value-grain
    ``features.rank_transform`` (min-rank; midrank = min_rank +
    (tie_count − 1)/2 via one per-value count join), so mega-ties
    collapse map-side and no row-grain global window exists; the rank
    SUM per arm, the tie-correction term Σ(t³ − t), and the arm sizes
    are three partial-aggregable aggregates; the z statistic uses the
    tie-corrected normal approximation (exact small-sample tables are
    a lookup, not a data operation — below ~20 per arm read p as
    approximate).

    Output: one row ``(n_a, n_b, u_a, cliffs_delta, z, p_value,
    direction)`` — direction in up/down/none at p < 0.05 (up = group_b
    stochastically larger).
    """
    from data_export_tool_spark.operators.features import rank_transform

    x = F.col(value_col).cast("double")
    g = F.col(group_col)
    base = df.where(
        x.isNotNull() & (g.eqNullSafe(group_a) | g.eqNullSafe(group_b))
    ).select(g.alias("__g"), x.alias("__x"))
    ranked = rank_transform(
        base, "__x", method="rank", out_col="__rk", num_ranges=num_ranges
    )
    vc = base.groupBy("__x").agg(F.count(F.lit(1)).alias("__tc"))
    mid = ranked.join(vc, "__x").select(
        "__g", (F.col("__rk") + (F.col("__tc") - 1) / 2.0).alias("__mr")
    )
    stats = mid.groupBy().agg(
        F.sum(F.when(F.col("__g").eqNullSafe(group_a), F.col("__mr"))).alias("ra"),
        F.sum(F.when(F.col("__g").eqNullSafe(group_a), 1).otherwise(0)).alias("na"),
        F.sum(F.when(F.col("__g").eqNullSafe(group_b), 1).otherwise(0)).alias("nb"),
    ).first()
    ties = vc.agg(
        F.sum(F.col("__tc") * F.col("__tc") * F.col("__tc") - F.col("__tc")).alias(
            "t3"
        )
    ).first()
    import math

    n_a = int(stats["na"] or 0)
    n_b = int(stats["nb"] or 0)
    spark = df.sparkSession
    schema = (
        "n_a long, n_b long, u_a double, cliffs_delta double, z double,"
        " p_value double, direction string"
    )
    if n_a == 0 or n_b == 0:
        return spark.createDataFrame(
            [(n_a, n_b, None, None, None, None, None)], schema
        )
    r_a = float(stats["ra"])
    u_a = r_a - n_a * (n_a + 1) / 2.0
    delta = 2.0 * u_a / (n_a * n_b) - 1.0
    n = n_a + n_b
    tie_term = float(ties["t3"] or 0.0)
    var_u = n_a * n_b / 12.0 * ((n + 1) - tie_term / (n * (n - 1.0)))
    if var_u <= 0:  # every value identical
        z = None
        p = None
        direction = "none"
    else:
        z = (u_a - n_a * n_b / 2.0) / math.sqrt(var_u)
        p = math.erfc(abs(z) / math.sqrt(2.0))
        # u_a large ⇒ group_a larger ⇒ group_b smaller ⇒ "down"
        direction = (
            "none" if p >= 0.05 else ("down" if z > 0 else "up")
        )
    return spark.createDataFrame(
        [(
            n_a, n_b, round(u_a, 6), round(delta, 9),
            round(z, 9) if z is not None else None,
            round(p, 12) if p is not None else None,
            direction,
        )],
        schema,
    )


def proportion_test(
    df: DataFrame,
    flag_col: str,
    group_col: str,
    group_a,
    group_b,
    alpha: float = 0.05,
) -> DataFrame:
    """Two-proportion z-test — the conversion-rate readout (the most
    common A/B decision is a RATE, not a mean): pooled-variance z on
    ``P(flag)`` between the two arms, with the absolute and relative
    lift. ``flag_col`` is any boolean/0-1 column; NULL flags are
    excluded (disclosed via the arm sizes). One conditional-aggregation
    scan → driver closed form; normal approximation is exact territory
    at experiment scale (np ≥ ~10 per cell; below that read p as
    approximate).

    Output: one row ``(n_a, n_b, rate_a, rate_b, abs_lift, rel_lift,
    z, p_value, significant)``.
    """
    f = F.col(flag_col).cast("double")
    ga, gb = F.lit(group_a), F.lit(group_b)
    row = df.where(f.isNotNull()).agg(
        F.count(F.when(F.col(group_col) == ga, f)).alias("na"),
        F.sum(F.when(F.col(group_col) == ga, f)).alias("ka"),
        F.count(F.when(F.col(group_col) == gb, f)).alias("nb"),
        F.sum(F.when(F.col(group_col) == gb, f)).alias("kb"),
    ).first()
    import math

    n_a, n_b = int(row["na"] or 0), int(row["nb"] or 0)
    spark = df.sparkSession
    schema = (
        "n_a long, n_b long, rate_a double, rate_b double, abs_lift double,"
        " rel_lift double, z double, p_value double, significant boolean"
    )
    if n_a == 0 or n_b == 0:
        return spark.createDataFrame(
            [(n_a, n_b, None, None, None, None, None, None, None)], schema
        )
    k_a, k_b = float(row["ka"] or 0.0), float(row["kb"] or 0.0)
    p_a, p_b = k_a / n_a, k_b / n_b
    pooled = (k_a + k_b) / (n_a + n_b)
    se2 = pooled * (1 - pooled) * (1 / n_a + 1 / n_b)
    if se2 <= 0:  # all-converted or none-converted in both arms
        z = p = None
        sig = None
    else:
        z = (p_b - p_a) / math.sqrt(se2)
        p = math.erfc(abs(z) / math.sqrt(2.0))
        sig = bool(p < alpha)
    rel = (p_b - p_a) / p_a if p_a > 0 else None
    return spark.createDataFrame(
        [(
            n_a, n_b, round(p_a, 9), round(p_b, 9),
            round(p_b - p_a, 9),
            round(rel, 9) if rel is not None else None,
            round(z, 9) if z is not None else None,
            round(p, 12) if p is not None else None,
            sig,
        )],
        schema,
    )


def cuped_adjust(
    df: DataFrame,
    metric_col: str,
    covariate_col: str,
    out_col: str | None = None,
) -> DataFrame:
    """CUPED variance reduction (Deng, Xu, Kohavi & Walker, WSDM'13
    "Improving the Sensitivity of Online Controlled Experiments"):
    replace the experiment metric with
    ``y − θ·(x − mean(x))`` where ``x`` is a PRE-EXPERIMENT covariate
    (last month's spend, pre-period activity) and
    ``θ = cov(x, y)/var(x)`` — the regression adjustment that removes
    the covariate-explained variance (factor 1 − ρ²) WITHOUT biasing
    the treatment effect, because the pre-period covariate is
    independent of assignment. Run ``ab_test`` on the adjusted column
    and detect the same lift with far fewer units.

    θ is fit on the POOLED data (both arms — the standard, bias-free
    choice). One covariance aggregate + a pure scan projection; rows
    with a NULL covariate keep their raw metric (θ adjustment needs
    x; the honest fallback is no adjustment, not a silent drop).

    Appends ``out_col`` (default ``{metric_col}_cuped``).
    """
    out_col = out_col or f"{metric_col}_cuped"
    y = F.col(metric_col).cast("double")
    x = F.col(covariate_col).cast("double")
    row = df.where(x.isNotNull() & y.isNotNull()).agg(
        F.covar_samp(x, y).alias("cxy"),
        F.var_samp(x).alias("vx"),
        F.avg(x).alias("mx"),
    ).first()
    cxy, vx, mx = row["cxy"], row["vx"], row["mx"]
    if not vx or vx <= 0 or cxy is None:
        theta = 0.0  # constant covariate: nothing to remove
        mx = mx or 0.0
    else:
        theta = cxy / vx
    adj = F.when(
        x.isNotNull() & y.isNotNull(),
        y - F.lit(float(theta)) * (x - F.lit(float(mx))),
    ).otherwise(y)
    return df.withColumn(out_col, adj)


def py_chi2_sf(x: float, dof: int) -> float:
    """Chi-square survival function Q(dof/2, x/2) via the regularized
    upper incomplete gamma (series for x < a+1, Lentz continued
    fraction otherwise — the classic Numerical-Recipes-style pair),
    exposed so oracles replay the exact arithmetic. Accurate to ~1e-12
    over the experimentation range (tests pin the published 0.05
    quantiles)."""
    if x <= 0:
        return 1.0
    a = dof / 2.0
    xx = x / 2.0
    if xx < a + 1.0:
        # lower series P(a, x), then Q = 1 - P
        term = 1.0 / a
        total = term
        n = a
        for _ in range(500):
            n += 1.0
            term *= xx / n
            total += term
            if abs(term) < abs(total) * 1e-16:
                break
        ln_pref = a * math.log(xx) - xx - math.lgamma(a)
        return max(0.0, min(1.0, 1.0 - total * math.exp(ln_pref)))
    # Lentz continued fraction for Q(a, x)
    tiny = 1e-300
    b = xx + 1.0 - a
    c = 1.0 / tiny
    d = 1.0 / b
    h = d
    for i in range(1, 500):
        an = -i * (i - a)
        b += 2.0
        d = an * d + b
        if abs(d) < tiny:
            d = tiny
        c = b + an / c
        if abs(c) < tiny:
            c = tiny
        d = 1.0 / d
        delta = d * c
        h *= delta
        if abs(delta - 1.0) < 1e-16:
            break
    ln_pref = a * math.log(xx) - xx - math.lgamma(a)
    return max(0.0, min(1.0, math.exp(ln_pref) * h))


def srm_check(
    df: DataFrame,
    group_col: str,
    expected: dict,
    alpha: float = 1e-3,
) -> DataFrame:
    """Sample-ratio mismatch guardrail — the FIRST check any A/B
    readout must pass: a chi-square goodness-of-fit of the observed
    arm counts against the DESIGNED assignment shares. An SRM means
    the randomization itself broke (bot filtering, logging loss,
    redirect asymmetry) and every downstream metric comparison is
    biased regardless of its p-value — which is why the conventional
    threshold is a paranoid 1e-3, not 0.05. Rows in arms absent from
    ``expected`` are counted and disclosed (``n_unexpected``) but
    excluded from the statistic; an UNEXPECTED arm appearing at all is
    usually itself the bug.

    One count aggregate → driver closed form (``py_chi2_sf``).
    Output: one row ``(n_total, n_unexpected, chi2, dof, p_value,
    srm_detected, arms)`` with ``arms`` an array of
    ``(arm, n, expected_share, observed_share)`` structs.
    """
    if not expected:
        raise ValueError("expected must map arm -> designed share")
    tot_share = sum(expected.values())
    if not math.isclose(tot_share, 1.0, abs_tol=1e-9):
        raise ValueError(f"expected shares must sum to 1: {tot_share}")
    counts = {
        r["g"]: r["n"]
        for r in df.where(F.col(group_col).isNotNull())
        .groupBy(F.col(group_col).cast("string").alias("g"))
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    exp = {str(k): v for k, v in expected.items()}
    n_in = sum(counts.get(k, 0) for k in exp)
    n_unexpected = sum(v for k, v in counts.items() if k not in exp)
    spark = df.sparkSession
    schema = (
        "n_total long, n_unexpected long, chi2 double, dof int,"
        " p_value double, srm_detected boolean,"
        " arms array<struct<arm:string,n:long,expected_share:double,"
        "observed_share:double>>"
    )
    arms = [
        (
            k,
            int(counts.get(k, 0)),
            float(exp[k]),
            (counts.get(k, 0) / n_in) if n_in else None,
        )
        for k in sorted(exp)
    ]
    if n_in == 0:
        return spark.createDataFrame(
            [(0, n_unexpected, None, len(exp) - 1, None, None, arms)], schema
        )
    chi2 = sum(
        (counts.get(k, 0) - n_in * s) ** 2 / (n_in * s)
        for k, s in exp.items()
        if s > 0
    )
    dof = len(exp) - 1
    p = py_chi2_sf(chi2, dof) if dof >= 1 else None
    return spark.createDataFrame(
        [(
            n_in, n_unexpected, round(chi2, 9), dof,
            round(p, 15) if p is not None else None,
            bool(p < alpha) if p is not None else None,
            arms,
        )],
        schema,
    )


def _py_probit(p: float) -> float:
    """Φ⁻¹(p) — Acklam's rational approximation (|ε| < 1.15e-9), the
    scalar twin of features._probit for driver-side closed forms."""
    if not 0.0 < p < 1.0:
        raise ValueError(f"p must be in (0, 1): {p}")
    a = [-3.969683028665376e+01, 2.209460984245205e+02,
         -2.759285104469687e+02, 1.383577518672690e+02,
         -3.066479806614716e+01, 2.506628277459239e+00]
    b = [-5.447609879822406e+01, 1.615858368580409e+02,
         -1.556989798598866e+02, 6.680131188771972e+01,
         -1.328068155288572e+01]
    c = [-7.784894002430293e-03, -3.223964580411365e-01,
         -2.400758277161838e+00, -2.549732539343734e+00,
         4.374664141464968e+00, 2.938163982698783e+00]
    d = [7.784695709041462e-03, 3.224671290700398e-01,
         2.445134137142996e+00, 3.754408661907416e+00]
    plow, phigh = 0.02425, 1 - 0.02425
    if p < plow:
        q = math.sqrt(-2 * math.log(p))
        return (((((c[0] * q + c[1]) * q + c[2]) * q + c[3]) * q + c[4]) * q + c[5]) / \
               ((((d[0] * q + d[1]) * q + d[2]) * q + d[3]) * q + 1)
    if p > phigh:
        q = math.sqrt(-2 * math.log(1 - p))
        return -(((((c[0] * q + c[1]) * q + c[2]) * q + c[3]) * q + c[4]) * q + c[5]) / \
               ((((d[0] * q + d[1]) * q + d[2]) * q + d[3]) * q + 1)
    q = p - 0.5
    r = q * q
    return (((((a[0] * r + a[1]) * r + a[2]) * r + a[3]) * r + a[4]) * r + a[5]) * q / \
           (((((b[0] * r + b[1]) * r + b[2]) * r + b[3]) * r + b[4]) * r + 1)


def experiment_power(
    df: DataFrame,
    metric_col: str,
    mde: float | None = None,
    n_per_arm: int | None = None,
    alpha: float = 0.05,
    power: float = 0.8,
) -> DataFrame:
    """Experiment PLANNING from pilot data: with the metric's variance
    measured on ``df`` (the pre-experiment population), answer either
    "how many units per arm to detect ``mde``?" (absolute effect) or
    "what MDE does ``n_per_arm`` buy?" — the two-sample normal
    closed forms ``n = 2σ²(z_{1−α/2} + z_{power})²/δ²`` and its
    inversion. Pass one of ``mde`` / ``n_per_arm`` (or both: each
    answers independently).

    One variance aggregate → driver closed form. Output one row:
    ``(n_pilot, metric_mean, metric_var, alpha, power, mde,
    n_per_arm_required, n_per_arm, mde_detectable)``."""
    if mde is None and n_per_arm is None:
        raise ValueError("pass mde and/or n_per_arm")
    if mde is not None and not mde > 0:
        raise ValueError(f"mde must be > 0: {mde}")
    if n_per_arm is not None and n_per_arm < 2:
        raise ValueError(f"n_per_arm must be >= 2: {n_per_arm}")
    x = F.col(metric_col).cast("double")
    row = df.where(x.isNotNull()).agg(
        F.count(F.lit(1)).alias("n"),
        F.avg(x).alias("m"),
        F.var_samp(x).alias("v"),
    ).first()
    n_pilot = int(row["n"] or 0)
    var = row["v"]
    z = (_py_probit(1 - alpha / 2) + _py_probit(power)) ** 2
    n_req = mde_det = None
    if var is not None and var > 0:
        if mde is not None:
            n_req = int(math.ceil(2.0 * var * z / (mde * mde)))
        if n_per_arm is not None:
            mde_det = math.sqrt(2.0 * var * z / n_per_arm)
    return df.sparkSession.createDataFrame(
        [(
            n_pilot, row["m"], var, alpha, power, mde,
            n_req, n_per_arm,
            round(mde_det, 9) if mde_det is not None else None,
        )],
        "n_pilot long, metric_mean double, metric_var double, alpha double,"
        " power double, mde double, n_per_arm_required long, n_per_arm long,"
        " mde_detectable double",
    )


def msprt_always_valid(
    df: DataFrame,
    metric_col: str,
    group_col: str,
    group_a,
    group_b,
    tau: float | None = None,
    alpha: float = 0.05,
) -> DataFrame:
    """Mixture sequential probability ratio test (mSPRT — Johari,
    Koomen, Pekelis & Walsh, "Peeking at A/B Tests", KDD'17): the
    ALWAYS-VALID p-value that stays correct under continuous
    monitoring, unlike the fixed-horizon Welch p that inflates to
    ~100% false positives when peeked at daily. Normal mixture with
    prior scale ``tau`` (default: the observed pooled standard error —
    the paper's practical choice):

        Λ = sqrt(2σ̂²/n̄ / (2σ̂²/n̄ + τ²))
            · exp(Δ̄² · τ² / (2·(2σ̂²/n̄)·(2σ̂²/n̄ + τ²)))
        p_always_valid = min(1, 1/Λ)

    where Δ̄ is the arm-mean difference, σ̂² the pooled variance and
    n̄ the harmonic arm size. One conditional-aggregation scan →
    driver closed form; replayable by any oracle.

    Output: one row ``(n_a, n_b, mean_a, mean_b, diff, tau, lambda_,
    p_always_valid, significant)``."""
    ga, gb = F.lit(group_a), F.lit(group_b)
    x = F.col(metric_col).cast("double")
    xa = F.when(F.col(group_col) == ga, x)
    xb = F.when(F.col(group_col) == gb, x)
    row = df.agg(
        F.count(xa).alias("na"), F.avg(xa).alias("ma"), F.var_samp(xa).alias("va"),
        F.count(xb).alias("nb"), F.avg(xb).alias("mb"), F.var_samp(xb).alias("vb"),
    ).first()
    n_a, n_b = int(row["na"] or 0), int(row["nb"] or 0)
    spark = df.sparkSession
    schema = (
        "n_a long, n_b long, mean_a double, mean_b double, diff double,"
        " tau double, lambda_ double, p_always_valid double,"
        " significant boolean"
    )
    if n_a < 2 or n_b < 2 or row["va"] is None or row["vb"] is None:
        return spark.createDataFrame(
            [(n_a, n_b, row["ma"], row["mb"], None, tau, None, None, None)],
            schema,
        )
    # pooled variance; V = var of the mean difference
    s2 = ((n_a - 1) * row["va"] + (n_b - 1) * row["vb"]) / (n_a + n_b - 2)
    V = s2 * (1.0 / n_a + 1.0 / n_b)
    if V <= 0:
        return spark.createDataFrame(
            [(n_a, n_b, row["ma"], row["mb"], 0.0, tau, None, None, None)],
            schema,
        )
    diff = row["mb"] - row["ma"]
    t2 = (tau * tau) if tau is not None else V  # paper's practical default
    lam = math.sqrt(V / (V + t2)) * math.exp(
        diff * diff * t2 / (2.0 * V * (V + t2))
    )
    p = min(1.0, 1.0 / lam)
    return spark.createDataFrame(
        [(
            n_a, n_b, row["ma"], row["mb"], round(diff, 9),
            round(math.sqrt(t2), 9), round(lam, 9), round(p, 12),
            bool(p < alpha),
        )],
        schema,
    )


def py_prob_b_beats_a(
    a_a: float, b_a: float, a_b: float, b_b: float
) -> float:
    """Exact P(p_B > p_A) for independent Beta posteriors via the
    standard lgamma sum (Cook 2005 "Numerical computation of stochastic
    inequality probabilities"; the closed form every Bayesian A/B
    calculator uses):

        P = Σ_{i=0}^{α_B−1} exp( lnB(α_A+i, β_A+β_B) − ln(β_B+i)
                                − lnB(1+i, β_B) − lnB(α_A, β_A) )

    Requires integer ``a_b`` (true for integer priors + counts; the
    caller falls back to the normal approximation otherwise).
    """
    lg = math.lgamma

    def lbeta(x, y):
        return lg(x) + lg(y) - lg(x + y)

    total = 0.0
    for i in range(int(a_b)):
        total += math.exp(
            lbeta(a_a + i, b_a + b_b)
            - math.log(b_b + i)
            - lbeta(1.0 + i, b_b)
            - lbeta(a_a, b_a)
        )
    return total


def _prob_and_method(a_a, b_a, a_b, b_b, exact_limit):
    """P(p_B > p_A) + which path computed it. Exact when α_B is an
    integer within the loop budget, else the moment-matched normal
    approximation (difference of Beta means/variances)."""
    if float(a_b).is_integer() and a_b <= exact_limit:
        return py_prob_b_beats_a(a_a, b_a, a_b, b_b), "exact"
    mu_a, mu_b = a_a / (a_a + b_a), a_b / (a_b + b_b)
    va = a_a * b_a / ((a_a + b_a) ** 2 * (a_a + b_a + 1.0))
    vb = a_b * b_b / ((a_b + b_b) ** 2 * (a_b + b_b + 1.0))
    if va + vb <= 0.0:
        return (0.5 if mu_a == mu_b else float(mu_b > mu_a)), "normal"
    z = (mu_b - mu_a) / math.sqrt(va + vb)
    return 0.5 * math.erfc(-z / math.sqrt(2.0)), "normal"


def bayes_ab(
    df: DataFrame,
    flag_col: str,
    group_col: str,
    group_a,
    group_b,
    alpha_prior: float = 1.0,
    beta_prior: float = 1.0,
    exact_limit: int = 50_000,
) -> DataFrame:
    """Bayesian conversion-rate A/B readout (Beta-Binomial): the
    decision quantities a peeking-safe dashboard shows INSTEAD of a
    p-value — ``prob_b_beats_a`` and the expected losses of shipping
    either arm (Stucchio 2014's VWO decision rule: ship when the
    chosen arm's expected loss drops below the caring threshold).

    One conditional-aggregation scan yields (n, conversions) per arm;
    posteriors are Beta(prior α + k, prior β + n − k); P(B > A) is the
    EXACT lgamma sum when the posterior α_B is an integer within
    ``exact_limit`` loop steps, else the moment-matched normal tail
    (``method`` column discloses which ran). Expected losses use the
    exact identity

        E[max(p_A − p_B, 0)] = μ_A·(1 − P(B>A | α_A+1))
                             − μ_B·(1 − P(B>A | α_B+1))

    (and symmetrically for choosing A) — each a shifted-parameter call
    of the same P function. Output, one tiny row: ``(n_a, k_a, rate_a,
    n_b, k_b, rate_b, prob_b_beats_a, expected_loss_b, expected_loss_a,
    method)`` where ``expected_loss_b`` is the risk of SHIPPING B.
    NULL flags are excluded; empty arms answer honest NULLs.
    """
    if alpha_prior <= 0 or beta_prior <= 0:
        raise ValueError(
            f"priors must be > 0: {alpha_prior}, {beta_prior}"
        )
    flag = F.col(flag_col).cast("double")
    g = F.col(group_col)
    row = df.agg(
        F.count(F.when(g == F.lit(group_a), flag)).alias("n_a"),
        F.sum(F.when(g == F.lit(group_a), flag)).alias("k_a"),
        F.count(F.when(g == F.lit(group_b), flag)).alias("n_b"),
        F.sum(F.when(g == F.lit(group_b), flag)).alias("k_b"),
    ).first()
    n_a, n_b = int(row["n_a"]), int(row["n_b"])
    out_schema = (
        "n_a long, k_a long, rate_a double, n_b long, k_b long, "
        "rate_b double, prob_b_beats_a double, expected_loss_b double, "
        "expected_loss_a double, method string"
    )
    if n_a == 0 or n_b == 0:
        return df.sparkSession.createDataFrame(
            [(n_a, int(row["k_a"] or 0), None, n_b, int(row["k_b"] or 0),
              None, None, None, None, None)],
            out_schema,
        )
    k_a, k_b = float(row["k_a"]), float(row["k_b"])
    a_a, b_a = alpha_prior + k_a, beta_prior + n_a - k_a
    a_b, b_b = alpha_prior + k_b, beta_prior + n_b - k_b
    p_b, method = _prob_and_method(a_a, b_a, a_b, b_b, exact_limit)
    mu_a, mu_b = a_a / (a_a + b_a), a_b / (a_b + b_b)
    # E[max(p_A − p_B, 0)]: risk of shipping B
    p_shift_a, m1 = _prob_and_method(a_a + 1.0, b_a, a_b, b_b, exact_limit)
    p_shift_b, m2 = _prob_and_method(a_a, b_a, a_b + 1.0, b_b, exact_limit)
    loss_b = mu_a * (1.0 - p_shift_a) - mu_b * (1.0 - p_shift_b)
    # E[max(p_B − p_A, 0)]: risk of shipping A — same identity mirrored
    loss_a = mu_b * p_shift_b - mu_a * p_shift_a
    if "normal" in (method, m1, m2):
        method = "normal"
    return df.sparkSession.createDataFrame(
        [(n_a, int(k_a), k_a / n_a, n_b, int(k_b), k_b / n_b,
          p_b, max(loss_b, 0.0), max(loss_a, 0.0), method)],
        out_schema,
    )


def py_kruskal(groups: dict) -> tuple:
    """Reference Kruskal-Wallis over ``{group: [values]}`` with
    midrank ties and tie correction: returns ``(h, h_corrected,
    dof, p_value)`` — the exact arithmetic ``kruskal_wallis``
    distributes."""
    import math

    all_vals = sorted(
        v for vs in groups.values() for v in vs
    )
    n = len(all_vals)
    # midranks per distinct value
    mid = {}
    i = 0
    while i < n:
        j = i
        while j < n and all_vals[j] == all_vals[i]:
            j += 1
        mid[all_vals[i]] = (i + 1 + j) / 2.0
        i = j
    h = 0.0
    for vs in groups.values():
        rbar = sum(mid[v] for v in vs) / len(vs)
        h += len(vs) * (rbar - (n + 1) / 2.0) ** 2
    h *= 12.0 / (n * (n + 1))
    ties = {}
    for v in all_vals:
        ties[v] = ties.get(v, 0) + 1
    c = 1.0 - sum(t**3 - t for t in ties.values()) / float(n**3 - n)
    hc = h / c if c > 0 else float("nan")
    dof = len(groups) - 1
    return h, hc, dof, py_chi2_sf(hc, dof)


def kruskal_wallis(
    df: DataFrame,
    value_col: str,
    group_col: str,
    num_ranges: int = 64,
    min_groups: int = 2,
) -> DataFrame:
    """Kruskal-Wallis H — the k-group extension of
    :func:`mann_whitney` ("does ANY variant's distribution differ"),
    the distribution-free ANOVA for skewed metrics across 3+ arms /
    cohorts / suppliers. Midrank ties, the standard tie correction
    C = 1 − Σ(t³−t)/(N³−N), p from the χ²(k−1) survival function
    (``py_chi2_sf`` — exact for the even dof, continued-fraction for
    odd).

    Scale shape — the ``mann_whitney`` rank discipline verbatim:
    global midranks via the two-phase value-grain
    ``rank_transform('avg_rank')`` (X215 — mega-ties collapse
    map-side, no row-grain global sort), then ONE (group) groupBy for
    per-arm rank means/sizes and one value-grain aggregate for the
    tie term. NULL values and NULL groups are excluded.

    Returns a 1-row DataFrame ``(k, n, h, h_corrected, dof,
    p_value)`` — the test is a scalar readout.
    """
    from data_export_tool_spark.operators.features import rank_transform

    x = F.col(value_col).cast("double")
    g = F.col(group_col)
    base = df.where(x.isNotNull() & g.isNotNull()).select(
        g.alias("__g"), x.alias("__x")
    )
    ranked = rank_transform(
        base, "__x", method="avg_rank", out_col="__mr",
        num_ranges=num_ranges,
    )
    per_group = ranked.groupBy("__g").agg(
        F.count(F.lit(1)).alias("__n"),
        F.sum("__mr").alias("__rs"),
    )
    rows = per_group.collect()  # k rows — group-grain metadata
    vc = base.groupBy("__x").agg(F.count(F.lit(1)).alias("__tc"))
    t3 = vc.agg(
        F.sum(
            F.col("__tc") * F.col("__tc") * F.col("__tc") - F.col("__tc")
        ).alias("t3")
    ).first()["t3"]
    spark = df.sparkSession
    schema = (
        "k long, n long, h double, h_corrected double, dof long,"
        " p_value double"
    )
    k = len(rows)
    if k < min_groups:
        raise ValueError(
            f"kruskal_wallis needs >= {min_groups} non-empty groups,"
            f" found {k}"
        )
    n = sum(int(r["__n"]) for r in rows)
    h = 0.0
    for r in rows:
        rbar = float(r["__rs"]) / float(r["__n"])
        h += float(r["__n"]) * (rbar - (n + 1) / 2.0) ** 2
    h *= 12.0 / (n * (n + 1))
    c = 1.0 - float(t3 or 0) / float(n**3 - n) if n > 1 else 1.0
    hc = h / c if c > 0 else float("nan")
    dof = k - 1
    p = py_chi2_sf(hc, dof)
    return spark.createDataFrame(
        [(k, n, float(h), float(hc), dof, float(p))], schema
    )
