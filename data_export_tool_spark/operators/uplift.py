"""Uplift-model evaluation: Qini curve, Qini area, AUUC.

The readout that decides whether a targeting model is worth deploying:
given experiment rows (treatment flag, outcome, predicted-uplift
score), rank the population by score and ask how many INCREMENTAL
conversions the top-x% capture versus targeting at random (Radcliffe
2007 — the Qini curve, the uplift community's ROC). A reward model
that only predicts outcome (not uplift) flatlines here — which is the
point of the plot.

Definitions (cumulative over score-descending buckets; the replay
oracle pins these exactly):

* ``qini(b)   = Y_T(b) − Y_C(b) · N_T(b)/N_C(b)`` — incremental
  conversions among the targeted top-b buckets (treated outcomes minus
  the control outcomes scaled to the treated volume); NULL until both
  arms appear.
* ``qini_random(b) = qini(K) · frac(b)`` — the straight line a random
  ordering follows to the same endpoint.
* ``uplift_abs(b) = (Y_T/N_T − Y_C/N_C) · (N_T + N_C)`` — the
  absolute-uplift curve AUUC integrates.
* ``qini_area`` — trapezoidal area between qini and qini_random over
  ``frac`` (from the origin); ``auuc`` — trapezoidal area under
  uplift_abs. Positive = the ordering beats random targeting.

Scale shape
-----------
No global row sort. Scores bucket through ``features.rank_transform``
on the NEGATED score (two-phase VALUE-grain range rank — mega-ties
collapse map-side; ties share a bucket, so the curve is deterministic
under reordering), then ONE conditional-aggregation groupBy to bucket
grain. The ≤ ``n_bins`` bucket table is driver-folded into cumulative
curves — the categorical_association metadata-fold discipline. Raw
rows are touched twice (rank join + bucket agg), both scans
codegen-only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["qini_curve", "uplift_metrics", "py_qini_fold"]


def py_qini_fold(buckets: list[tuple[int, int, int, float, float]]) -> dict:
    """Fold bucket-grain ``(bucket, n_t, n_c, y_t, y_c)`` rows into the
    cumulative curve + areas — the exact driver arithmetic of
    ``qini_curve``/``uplift_metrics``, exposed for oracle replay.
    Returns {"curve": [...rows...], "qini_area": float, "auuc": float,
    "ate": float|None}."""
    buckets = sorted(buckets)
    n_total = sum(b[1] + b[2] for b in buckets)
    cn_t = cn_c = 0
    cy_t = cy_c = 0.0
    pre = []
    for b, n_t, n_c, y_t, y_c in buckets:
        cn_t += n_t
        cn_c += n_c
        cy_t += y_t
        cy_c += y_c
        qini = (
            cy_t - cy_c * (cn_t / cn_c) if cn_t > 0 and cn_c > 0 else None
        )
        uplift = (
            (cy_t / cn_t - cy_c / cn_c) * (cn_t + cn_c)
            if cn_t > 0 and cn_c > 0
            else None
        )
        frac = (cn_t + cn_c) / n_total if n_total else 0.0
        pre.append((b, frac, cn_t, cn_c, cy_t, cy_c, qini, uplift))
    q_total = pre[-1][6] if pre else None
    curve = []
    for b, frac, cn_t, cn_c, cy_t, cy_c, qini, uplift in pre:
        rand = q_total * frac if q_total is not None else None
        curve.append((b, frac, cn_t, cn_c, cy_t, cy_c, qini, rand, uplift))
    # trapezoids from the origin (frac 0, value 0)
    qini_area = auuc = 0.0
    px = py_q = py_u = 0.0
    ok_q = ok_u = True
    for _, frac, _, _, _, _, qini, rand, uplift in curve:
        if qini is None or rand is None:
            ok_q = False
        else:
            qini_area += (frac - px) * ((qini - rand) + py_q) / 2.0
            py_q = qini - rand
        if uplift is None:
            ok_u = False
        else:
            auuc += (frac - px) * (uplift + py_u) / 2.0
            py_u = uplift
        px = frac
    ate = None
    if pre and pre[-1][2] > 0 and pre[-1][3] > 0:
        ate = pre[-1][4] / pre[-1][2] - pre[-1][5] / pre[-1][3]
    return {
        "curve": curve,
        "qini_area": qini_area if ok_q else None,
        "auuc": auuc if ok_u else None,
        "ate": ate,
    }


def _bucket_stats(
    df: DataFrame,
    treatment_col: str,
    outcome_col: str,
    score_col: str,
    n_bins: int,
) -> list:
    from data_export_tool_spark.operators.features import rank_transform

    if n_bins < 2:
        raise ValueError(f"n_bins must be >= 2: {n_bins}")
    t = F.col(treatment_col).cast("double")
    y = F.col(outcome_col).cast("double")
    base = df.where(
        t.isNotNull() & y.isNotNull() & F.col(score_col).isNotNull()
    ).select(
        t.alias("__t"), y.alias("__y"), (-F.col(score_col)).alias("__ns")
    )
    ranked = rank_transform(base, "__ns", "percent_rank", out_col="__pr")
    bucket = F.least(
        F.floor(F.col("__pr") * n_bins).cast("int") + 1, F.lit(n_bins)
    )
    rows = (
        ranked.select("__t", "__y", bucket.alias("bucket"))
        .groupBy("bucket")
        .agg(
            F.sum(F.when(F.col("__t") == 1.0, 1).otherwise(0)).alias("n_t"),
            F.sum(F.when(F.col("__t") != 1.0, 1).otherwise(0)).alias("n_c"),
            F.sum(F.when(F.col("__t") == 1.0, F.col("__y")).otherwise(0.0)).alias(
                "y_t"
            ),
            F.sum(F.when(F.col("__t") != 1.0, F.col("__y")).otherwise(0.0)).alias(
                "y_c"
            ),
        )
        .collect()
    )
    return [
        (int(r["bucket"]), int(r["n_t"]), int(r["n_c"]), float(r["y_t"]),
         float(r["y_c"]))
        for r in rows
    ]


def qini_curve(
    df: DataFrame,
    treatment_col: str,
    outcome_col: str,
    score_col: str,
    n_bins: int = 100,
) -> DataFrame:
    """Bucket-grain cumulative uplift curve, one row per non-empty
    score bucket (1 = highest scores): ``(bucket, frac, n_t, n_c,
    y_t, y_c, qini, qini_random, uplift_abs)`` — all cumulative.
    NULL treatment/outcome/score rows are excluded."""
    stats = _bucket_stats(df, treatment_col, outcome_col, score_col, n_bins)
    fold = py_qini_fold(stats)
    return df.sparkSession.createDataFrame(
        fold["curve"],
        "bucket int, frac double, n_t long, n_c long, y_t double, "
        "y_c double, qini double, qini_random double, uplift_abs double",
    )


def uplift_metrics(
    df: DataFrame,
    treatment_col: str,
    outcome_col: str,
    score_col: str,
    n_bins: int = 100,
) -> DataFrame:
    """One-row summary: ``(n, n_treated, ate, qini_area, auuc)``.
    ``qini_area`` > 0 means the score ordering captures incremental
    conversions faster than random targeting."""
    stats = _bucket_stats(df, treatment_col, outcome_col, score_col, n_bins)
    fold = py_qini_fold(stats)
    n = sum(s[1] + s[2] for s in stats)
    n_t = sum(s[1] for s in stats)
    return df.sparkSession.createDataFrame(
        [(n, n_t, fold["ate"], fold["qini_area"], fold["auuc"])],
        "n long, n_treated long, ate double, qini_area double, auuc double",
    )
