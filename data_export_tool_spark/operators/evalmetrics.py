"""Binary-classifier evaluation at corpus scale: ROC-AUC and
threshold sweeps.

The train → score → evaluate loop (``linear.logreg_fit`` →
``logreg_predict`` → here) needs its last step to work on the full
scored corpus, where the textbook recipes fail: exact Mann-Whitney AUC
ranks every row (a global sort), and per-threshold precision/recall
tables window over the score order (a single-task window at continuous
score cardinality).

The scale shape instead: quantize scores onto a fixed ``bins`` grid —
ONE map-side-combined groupBy producing ≤ bins+1 rows of (bin,
positives, negatives) — then do every cumulative/trapezoid step as
driver arithmetic over that bounded frame (the ``key_skew_report``
report-operator pattern). The result equals the exact tie-averaged
Mann-Whitney statistic computed on the QUANTIZED scores: binning is the
only approximation, its resolution is the caller's ``bins`` knob, and
when the model's scores already live on the grid (calibrated/bucketed
scores — or ``bins`` ≥ their distinct count over a k/bins grid) the
AUC is exact. The tests pin the lossless-grid case against an exact
tie-averaged python oracle and the law auc(X) == auc(quantize(X)).

Scores must be probabilities in [0, 1] (the ``logreg_predict``
output); rows with NULL score or NULL/non-0/1 label are excluded and
counted in the report. Ties within a bin contribute 0.5 — the standard
tie-averaged rank convention, so a constant score yields AUC 0.5.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "binary_metrics",
    "binary_metrics_grouped",
    "cross_validate_classifier",
    "threshold_table",
    "fit_isotonic",
    "apply_isotonic",
]


def _bin_counts(
    df: DataFrame, label_col: str, score_col: str, bins: int
):
    """(bin → pos, neg) aggregate plus exclusion counts. One pass."""
    if bins < 1:
        raise ValueError(f"bins must be >= 1: {bins}")
    lab = F.col(label_col).cast("double")
    score = F.col(score_col).cast("double")
    usable = (
        lab.isin(0.0, 1.0)
        & score.isNotNull()
        & (score >= 0.0)
        & (score <= 1.0)
    )
    tagged = df.select(
        F.when(usable, lab).alias("__y"),
        F.when(
            usable, F.least(F.floor(score * bins).cast("int"), F.lit(bins - 1))
        ).alias("__b"),
    )
    rows = (
        tagged.groupBy("__b")
        .agg(
            F.sum(F.when(F.col("__y") == 1.0, 1).otherwise(0)).alias("pos"),
            F.sum(F.when(F.col("__y") == 0.0, 1).otherwise(0)).alias("neg"),
            F.count(F.lit(1)).alias("all_rows"),
        )
        .collect()
    )
    counts = {}
    excluded = 0
    for r in rows:
        if r["__b"] is None:
            excluded += r["all_rows"]
        else:
            counts[r["__b"]] = (r["pos"], r["neg"])
    return counts, excluded


def _auc_from_counts(counts: dict) -> tuple[float, int, int]:
    n_pos = sum(p for p, _ in counts.values())
    n_neg = sum(n for _, n in counts.values())
    if n_pos == 0 or n_neg == 0:
        return float("nan"), n_pos, n_neg
    # ascending score: each bin's positives beat all negatives below
    # and tie (0.5) with negatives in the same bin
    neg_below = 0
    u = 0.0
    for b in sorted(counts):
        p, n = counts[b]
        u += p * (neg_below + 0.5 * n)
        neg_below += n
    return u / (n_pos * n_neg), n_pos, n_neg


def binary_metrics(
    df: DataFrame,
    label_col: str = "y",
    score_col: str = "p",
    bins: int = 1000,
) -> DataFrame:
    """One-row evaluation report: ``auc`` (tie-averaged Mann-Whitney on
    the ``bins``-quantized scores), ``n_pos``/``n_neg``,
    ``n_excluded`` (NULL/out-of-range score or non-0/1 label),
    ``base_rate``, and ``accuracy_at_half`` (the decision
    ``score >= 0.5`` that :func:`linear.logreg_predict` consumers
    make — EXACT when ``bins`` is even, since 0.5 then sits on the bin
    grid; with odd bins the bin containing 0.5 counts whole-bin as
    positive, a 1/bins-resolution approximation like every other
    binned quantity here)."""
    counts, excluded = _bin_counts(df, label_col, score_col, bins)
    auc, n_pos, n_neg = _auc_from_counts(counts)
    half = bins // 2  # score >= 0.5 ⇔ bin >= bins/2 (grid-aligned)
    tp = sum(p for b, (p, _) in counts.items() if b >= half)
    tn = sum(n for b, (_, n) in counts.items() if b < half)
    total = n_pos + n_neg
    out = [
        (
            float(auc),
            n_pos,
            n_neg,
            excluded,
            (n_pos / total) if total else float("nan"),
            ((tp + tn) / total) if total else float("nan"),
        )
    ]
    return df.sparkSession.createDataFrame(
        out,
        "auc double, n_pos long, n_neg long, n_excluded long,"
        " base_rate double, accuracy_at_half double",
    )


def threshold_table(
    df: DataFrame,
    label_col: str = "y",
    score_col: str = "p",
    bins: int = 100,
) -> DataFrame:
    """Per-threshold confusion sweep: one row per occupied bin edge
    ``threshold = b/bins`` with the confusion counts and derived
    precision / recall / fpr for the decision ``score >= threshold``
    — the PR/ROC curve at ``bins`` resolution from the same single
    aggregate, cumulated driver-side over ≤ bins rows. Rows descend by
    threshold so recall is monotonically non-decreasing down the
    table; precision of an empty prediction set is NULL."""
    counts, _ = _bin_counts(df, label_col, score_col, bins)
    n_pos = sum(p for p, _ in counts.values())
    n_neg = sum(n for _, n in counts.values())
    rows = []
    tp = fp = 0
    for b in sorted(counts, reverse=True):
        p, n = counts[b]
        tp += p
        fp += n
        fn = n_pos - tp
        tn = n_neg - fp
        rows.append(
            (
                b / bins,
                tp,
                fp,
                fn,
                tn,
                (tp / (tp + fp)) if (tp + fp) else None,
                (tp / n_pos) if n_pos else None,
                (fp / n_neg) if n_neg else None,
            )
        )
    return df.sparkSession.createDataFrame(
        rows,
        "threshold double, tp long, fp long, fn long, tn long,"
        " precision double, recall double, fpr double",
    )


def fit_isotonic(
    df: DataFrame,
    label_col: str = "y",
    score_col: str = "p",
    bins: int = 1000,
) -> dict:
    """Isotonic probability calibration (pool-adjacent-violators) over
    the same bounded bin frame the metrics use: bin the scores (ONE
    map-side-combined groupBy, ≤ bins rows), run weighted PAV on the
    per-bin positive rates driver-side (PAV is inherently sequential —
    running it over the BIN frame instead of the row frame is what
    makes it scale-safe), and return a stepwise-constant calibration
    table.

    Returns ``{"bins": bins, "values": [bins floats]}`` — calibrated
    probability per score bin, monotone non-decreasing by
    construction. Bins with no data inherit the calibrated value of
    the nearest occupied bin to the LEFT (right for a leading gap):
    isotonic regression defines values only at observed points, and
    left-inheritance keeps the table a valid right-continuous step
    function of the score. Exclusion rules match
    :func:`binary_metrics`.
    """
    counts, _ = _bin_counts(df, label_col, score_col, bins)
    if not counts:
        raise ValueError("no usable (label, score) rows to calibrate on")
    # weighted PAV over occupied bins in score order
    blocks = []  # [sum_pos, weight, start_bin]
    for b in sorted(counts):
        p, n = counts[b]
        blocks.append([float(p), float(p + n), b])
        while len(blocks) > 1 and (
            blocks[-2][0] * blocks[-1][1] >= blocks[-1][0] * blocks[-2][1]
        ):  # prev_rate >= cur_rate → pool (cross-multiplied, no division)
            s, w, _ = blocks.pop()
            blocks[-1][0] += s
            blocks[-1][1] += w
    values = [None] * bins
    for i, (s, w, start) in enumerate(blocks):
        end = blocks[i + 1][2] if i + 1 < len(blocks) else bins
        rate = s / w
        for b in range(start, end):
            values[b] = rate
    first = next(v for v in values if v is not None)
    for b in range(bins):  # leading gap inherits the first block
        if values[b] is None:
            values[b] = first
        else:
            break
    return {"bins": bins, "values": values}


def apply_isotonic(
    df: DataFrame,
    model: dict,
    score_col: str = "p",
    out_col: str = "p_cal",
) -> DataFrame:
    """Map scores through the fitted step table — a pure JVM
    projection (``element_at`` on a ``bins``-sized literal array
    indexed by the score's bin). NULL / out-of-range scores → NULL."""
    bins = model["bins"]
    vals = F.array(*[F.lit(float(v)) for v in model["values"]])
    score = F.col(score_col).cast("double")
    idx = F.least(F.floor(score * bins).cast("int"), F.lit(bins - 1)) + 1
    return df.withColumn(
        out_col,
        F.when(
            score.isNotNull() & (score >= 0.0) & (score <= 1.0),
            F.element_at(vals, idx),
        ),
    )


def binary_metrics_grouped(
    df: DataFrame,
    by: str | list,
    label_col: str = "y",
    score_col: str = "p",
    bins: int = 1000,
) -> DataFrame:
    """Per-segment :func:`binary_metrics` (per language, per source,
    per experiment arm) with NO driver materialization at any group
    count: one (group, bin) aggregate — ≤ ``bins`` rows per group —
    then the cumulative Mann-Whitney sum as a window over THAT frame
    (partitions are bins-bounded by construction, so the window is
    safe where a row-grain score window would not be), and one final
    per-group aggregate. Same quantization/exclusion contract as the
    ungrouped report, including accuracy_at_half's even-``bins``
    exactness rule.

    Returns one row per group: ``(by..., auc, n_pos, n_neg,
    n_excluded, base_rate, accuracy_at_half)``; a group with only one
    class gets NULL auc. NULL group keys are real groups.
    """
    from pyspark.sql import Window

    if bins < 1:
        raise ValueError(f"bins must be >= 1: {bins}")
    grp = [by] if isinstance(by, str) else list(by)
    lab = F.col(label_col).cast("double")
    score = F.col(score_col).cast("double")
    usable = (
        lab.isin(0.0, 1.0)
        & score.isNotNull()
        & (score >= 0.0)
        & (score <= 1.0)
    )
    tagged = df.select(
        *grp,
        F.when(usable, lab).alias("__y"),
        F.when(
            usable, F.least(F.floor(score * bins).cast("int"), F.lit(bins - 1))
        ).alias("__b"),
    )
    binned = tagged.groupBy(*grp, "__b").agg(
        F.sum(F.when(F.col("__y") == 1.0, 1).otherwise(0)).alias("pos"),
        F.sum(F.when(F.col("__y") == 0.0, 1).otherwise(0)).alias("neg"),
        F.count(F.lit(1)).alias("all_rows"),
    )
    # the excluded-row bin (__b NULL) sorts first under the default
    # asc_nulls_first and carries pos=neg=0, so it rides the SAME
    # window + aggregate without disturbing the cumulative sums — no
    # separate excluded frame, no join, and a NULL group key stays one
    # row (an equi-join would have split it)
    w = (
        Window.partitionBy(*grp)
        .orderBy("__b")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    scored_bins = binned.withColumn(
        "__negbelow", F.coalesce(F.sum("neg").over(w), F.lit(0))
    )
    half = bins // 2
    total = F.col("n_pos") + F.col("n_neg")
    return (
        scored_bins.groupBy(*grp)
        .agg(
            F.sum(
                F.col("pos") * (F.col("__negbelow") + 0.5 * F.col("neg"))
            ).alias("__u"),
            F.sum("pos").alias("n_pos"),
            F.sum("neg").alias("n_neg"),
            F.sum(
                F.when(F.col("__b").isNull(), F.col("all_rows")).otherwise(0)
            ).alias("n_excluded"),
            F.sum(
                F.when(F.col("__b") >= half, F.col("pos")).otherwise(0)
            ).alias("__tp"),
            F.sum(
                F.when(F.col("__b") < half, F.col("neg")).otherwise(0)
            ).alias("__tn"),
        )
        .select(
            *grp,
            F.when(
                (F.col("n_pos") > 0) & (F.col("n_neg") > 0),
                F.col("__u") / (F.col("n_pos") * F.col("n_neg")),
            ).alias("auc"),
            "n_pos",
            "n_neg",
            "n_excluded",
            F.when(total > 0, F.col("n_pos") / total).alias("base_rate"),
            F.when(total > 0, (F.col("__tp") + F.col("__tn")) / total).alias(
                "accuracy_at_half"
            ),
        )
    )


def cross_validate_classifier(
    df: DataFrame,
    label_col: str,
    group_col: str,
    vec_col: str = "embedding",
    k: int = 5,
    bins: int = 1000,
    reg: float = 1e-3,
    iters: int = 8,
    tol: float = 1e-9,
) -> DataFrame:
    """Leakage-safe k-fold cross-validation of the logistic quality
    classifier: fold assignment is ``md5(group) % k`` — every row of a
    group (dedup cluster, registered domain) lands in the SAME fold,
    the ``sampling.group_split`` contamination rule, so near-duplicates
    never straddle a train/eval boundary and the reported AUC is an
    honest out-of-sample number.

    Cost is explicit: k × (one :func:`linear.logreg_fit` + one
    :func:`binary_metrics` aggregate) — every pass reduces to
    metadata, nothing is collected beyond the per-fold report. Returns
    one row per fold (``fold``, ``train_n``, then the
    :func:`binary_metrics` columns measured on the HELD-OUT fold)
    plus sortable determinism: same data + params ⇒ identical folds,
    identical models, identical numbers.
    """
    from data_export_tool_spark.operators.linear import (
        logreg_fit,
        logreg_predict,
    )
    from data_export_tool_spark.operators.sampling import sample_bucket

    if k < 2:
        raise ValueError(f"k must be >= 2: {k}")
    fold = (sample_bucket(F.col(group_col)) % k).alias("__fold")
    tagged = df.withColumn("__fold", fold)
    reports = []
    for f in range(k):
        train = tagged.where(F.col("__fold") != f)
        test = tagged.where(F.col("__fold") == f)
        model = logreg_fit(
            train, label_col, vec_col, reg=reg, iters=iters, tol=tol
        )
        scored = logreg_predict(test, model, vec_col, "__p")
        rep = binary_metrics(scored, label_col, "__p", bins=bins).withColumn(
            "fold", F.lit(f)
        ).withColumn("train_n", F.lit(model["n"]))
        reports.append(rep)
    out = reports[0]
    for rep in reports[1:]:
        out = out.unionByName(rep)
    return out.select(
        "fold", "train_n", "auc", "n_pos", "n_neg", "n_excluded",
        "base_rate", "accuracy_at_half",
    )


def mutual_info(
    df: DataFrame,
    feature_cols: Sequence[str] | str,
    label_col: str,
    bins: int = 16,
) -> DataFrame:
    """Per-feature mutual information with a (categorical) label —
    the model-free feature-relevance screen run before committing to
    a training pipeline: ``I(X; Y) = Σ p(x,y)·log(p(x,y)/(p(x)p(y)))``
    in nats, plus the normalized form ``nmi = I/min(H(X), H(Y))``
    (0 = independent, 1 = one determines the other).

    Numeric features are bucketed into ``bins`` equal-width bins
    (per-feature min/max from one aggregate pass; constant features
    answer mi = 0 honestly); string/boolean features use their values
    directly. Per feature the engine computes ONE partial-aggregable
    contingency groupBy whose cell grain is (bin × label) — bounded by
    ``bins × |labels|``, the categorical_association discipline — and
    the driver folds those few cells into MI/entropies (a
    driver-bounded collect of metadata-sized cell tables, never rows).
    NULL feature values and NULL labels are excluded per feature (the
    pairwise-deletion convention; ``n_used`` discloses it).

    Output: one row per feature —
    ``(feature, mi, nmi, h_feature, h_label, n_used)``.
    """
    import math

    feats = [feature_cols] if isinstance(feature_cols, str) else list(feature_cols)
    if not feats:
        raise ValueError("feature_cols must name at least one column")
    if bins < 2:
        raise ValueError(f"bins must be >= 2: {bins}")
    spark = df.sparkSession
    types = dict(df.dtypes)
    out_rows = []
    for c in feats:
        y = F.col(label_col).cast("string")
        base = df.where(F.col(c).isNotNull() & y.isNotNull())
        if types.get(c) in ("string", "boolean"):
            xcell = F.col(c).cast("string")
        else:
            x = F.col(c).cast("double")
            base = base.where(~F.isnan(x))
            mm = base.agg(
                F.min(x).alias("lo"), F.max(x).alias("hi")
            ).first()
            lo, hi = mm["lo"], mm["hi"]
            if lo is None or hi is None or hi == lo:
                # empty or constant feature: zero information, by
                # definition rather than by division
                n0 = base.count()
                out_rows.append((c, 0.0, 0.0, 0.0, None, n0))
                continue
            w = (hi - lo) / bins
            xcell = F.least(
                F.floor((x - F.lit(lo)) / F.lit(w)).cast("int"),
                F.lit(bins - 1),
            ).cast("string")
        cells = (
            base.groupBy(xcell.alias("__x"), y.alias("__y"))
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        )
        n = sum(r["n"] for r in cells)
        if n == 0:
            out_rows.append((c, 0.0, 0.0, 0.0, None, 0))
            continue
        px: dict = {}
        py: dict = {}
        for r in cells:
            px[r["__x"]] = px.get(r["__x"], 0) + r["n"]
            py[r["__y"]] = py.get(r["__y"], 0) + r["n"]
        mi = 0.0
        for r in cells:
            pxy = r["n"] / n
            mi += pxy * math.log(pxy * n * n / (px[r["__x"]] * py[r["__y"]]))
        hx = -sum(v / n * math.log(v / n) for v in px.values())
        hy = -sum(v / n * math.log(v / n) for v in py.values())
        mi = max(0.0, mi)  # clip float dust on independent features
        denom = min(hx, hy)
        nmi = mi / denom if denom > 0 else 0.0
        out_rows.append(
            (c, round(mi, 9), round(nmi, 9), round(hx, 9), round(hy, 9), n)
        )
    return spark.createDataFrame(
        out_rows,
        "feature string, mi double, nmi double, h_feature double,"
        " h_label double, n_used long",
    )
