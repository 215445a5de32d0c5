"""Distributed linear models: ridge regression and logistic regression.

The supervised step of a corpus-curation pipeline — CCNet/fastText-style
quality classifiers ("train on labeled good/bad docs, score the other
100 TB"), importance-weight regressors, calibration fits — needs model
TRAINING that never ships rows to the driver. Both fits here follow the
moment-partials contract :func:`features.pca_fit` and
:func:`clustering.kmeans_fit` established: each Arrow batch emits a
fixed-size partial (d² doubles), the reduce is batch-count-sized and
row-count-independent, and the driver solves a d×d system. With hashed
or PCA features (d ≤ a few hundred) that is exact full-batch training
at any corpus size — no SGD schedule, no sampling, replayable.

- ``ridge_fit``: ONE pass. The Gram matrix of the augmented block
  Z = [X | 1 | y] contains every moment the normal equations need
  (XᵀX, Xᵀ1, Xᵀy, n, Σy, Σy²), so one d+2-wide partial per batch
  yields the closed-form solve (XᵀX + λI)w = Xᵀy and training R².
- ``logreg_fit``: IRLS (Newton-Raphson). Per iteration one pass emits
  the Hessian Xᵀdiag(p(1−p))X and gradient Xᵀ(y−p) partials against
  the broadcast current weights; the driver solves the damped step.
  Full-batch Newton converges in a handful of iterations — iteration
  count is a constant, not a function of corpus size.

Scoring (`linear_predict` / `logreg_predict`) is a pure JVM-side
projection: the weight vector rides as an array literal and the dot
product runs in ``zip_with``/``aggregate`` inside whole-stage codegen —
no Arrow, no shuffle, NULL/ragged vectors yield NULL. That keeps the
"score 100 TB" half of the pipeline on the fast path; only training
(which reduces to metadata) touches Python.

Labels: logistic labels must be 0/1; rows with NULL/other labels or
NULL/empty vectors are excluded from the fit by contract (the tests pin
this). Regularization never penalizes the intercept.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from data_export_tool_spark.operators.clustering import _as_matrix

# Worker closures below reference _as_matrix; ship this module BY VALUE
# so executors whose Python workers lack this package on sys.path can
# still run them (same policy as clustering.py / streaming/events.py).
try:  # pragma: no cover - trivial registration
    import sys as _sys

    from pyspark import cloudpickle as _cloudpickle

    _cloudpickle.register_pickle_by_value(_sys.modules[__name__])
except Exception:
    pass

__all__ = [
    "ridge_fit",
    "huber_fit",
    "ridge_fit_grouped",
    "logreg_fit",
    "logreg_fit_grouped",
    "logreg_fit_ovr",
    "linear_predict",
    "logreg_predict",
    "logreg_predict_ovr",
    "theil_sen_fit_grouped",
]

_Z_CLIP = 35.0  # sigmoid argument clamp; exp(±35) saturates a double safely


def _vec_base(
    df: DataFrame, label_col: str, vec_col: str, binary: bool
) -> DataFrame:
    """Label filtering happens JVM-side; NULL/empty VECTORS are dropped
    inside the Arrow partials instead (``_valid_rows``). The vector
    column is often itself a pandas-UDF product (hashed_embedding over
    a joined/CASE-built text column), and a predicate on it can be
    fused by Catalyst into an upstream join condition, where Python
    UDFs cannot evaluate ([INTERNAL_ERROR] Cannot generate code) — so
    the fit must never put the vector column in a WHERE."""
    lab = F.col(label_col).cast("double")
    cond = lab.isNotNull()
    if binary:
        cond = cond & lab.isin(0.0, 1.0)
    return df.where(cond).select(
        F.col(vec_col).cast("array<double>").alias("__v"), lab.alias("__y")
    )


def _valid_rows(pdf):
    """Arrow-side twin of the old vector predicate: keep rows whose
    vector is non-NULL and non-empty. Mixed dimensions among the kept
    rows are an INPUT ERROR raised with a readable message — fitting
    on a mixed-dim column is ambiguous (which d is the model?), so it
    must not surface as an opaque np.stack shape error; the scoring
    half of this module NULLs wrong-dim rows instead, by contract."""
    mask = pdf["__v"].map(lambda v: v is not None and len(v) > 0)
    kept = pdf[mask]
    if len(kept):
        lens = kept["__v"].map(len)
        if lens.nunique() > 1:
            raise ValueError(
                "mixed vector dimensions in the fit input"
                f" ({sorted(lens.unique())[:5]}...): filter to one"
                " embedding version before fitting"
            )
    return kept


def ridge_fit(
    df: DataFrame,
    label_col: str,
    vec_col: str = "embedding",
    reg: float = 1e-3,
) -> dict:
    """Closed-form ridge regression of ``label_col`` on an
    ``array<double>`` feature column, one distributed pass.

    Each batch contributes ``n`` and the Gram matrix of Z = [X | 1 | y]
    ((d+2)² doubles) — batch-count × (d+2)² total reduce, independent
    of row count. The driver extracts the blocks and solves
    ``(XᵀX + λ·diag(1…1,0)) [w;b] = Xᵀy`` (intercept unpenalized).

    Returns a plain model dict: ``weights`` (d), ``intercept``, ``n``,
    ``r2`` (training R² of the regularized fit), ``reg``.
    """
    import numpy as np

    if reg < 0:
        raise ValueError(f"reg must be >= 0: {reg}")
    base = _vec_base(df, label_col, vec_col, binary=False)

    def partials(batches):
        import pandas as pd

        for pdf in batches:
            pdf = _valid_rows(pdf)
            if len(pdf) == 0:
                continue
            X = _as_matrix(pdf["__v"])
            y = pdf["__y"].to_numpy(dtype="float64")
            Z = np.hstack([X, np.ones((len(X), 1)), y[:, None]])
            yield pd.DataFrame(
                {"n": [len(X)], "g": [(Z.T @ Z).ravel().tolist()]}
            )

    rows = base.mapInPandas(partials, "n long, g array<double>").collect()
    if not rows:
        raise ValueError("no usable (vector, label) rows to fit on")
    m = int(round(len(rows[0]["g"]) ** 0.5))
    d = m - 2
    n = sum(r["n"] for r in rows)
    G = np.zeros((m, m))
    for r in rows:
        G += np.array(r["g"]).reshape(m, m)
    A = G[: d + 1, : d + 1]  # [X|1]ᵀ[X|1]
    bvec = G[: d + 1, d + 1]  # [X|1]ᵀy
    sum_y, sum_yy = G[d, d + 1], G[d + 1, d + 1]
    pen = np.diag([reg] * d + [0.0])
    w = np.linalg.solve(A + pen, bvec)
    # R² from the same moments: SSE = yᵀy − 2wᵀ[X|1]ᵀy + wᵀA w
    sse = float(sum_yy - 2 * w @ bvec + w @ A @ w)
    sst = float(sum_yy - sum_y * sum_y / n)
    return {
        "weights": w[:d].tolist(),
        "intercept": float(w[d]),
        "n": int(n),
        "r2": 1.0 - sse / sst if sst > 0 else float("nan"),
        "reg": float(reg),
    }


def logreg_fit(
    df: DataFrame,
    label_col: str,
    vec_col: str = "embedding",
    reg: float = 1e-3,
    iters: int = 12,
    tol: float = 1e-9,
) -> dict:
    """Full-batch L2-regularized logistic regression by IRLS
    (Newton-Raphson), the quality-classifier trainer.

    Per iteration: broadcast current weights, one Arrow pass emits
    per-batch Hessian/gradient/loss partials ((d+1)² + (d+1) + 1
    doubles), the driver solves ``(H + λ·diag(1…1,0)) Δ = g`` and
    steps. Stops when the mean-NLL improvement drops below ``tol`` or
    after ``iters`` rounds — a constant number of corpus scans, each
    reducing to metadata (the ``kmeans_fit`` round contract;
    ``clustering.py:243``). ``reg > 0`` keeps the Hessian invertible
    and the solution bounded on separable data.

    Labels must be 0/1 (NULL/other-label rows are excluded, see module
    docstring). The sigmoid clamps its argument to ±35 — the replay
    oracle in the tests applies the identical clamp.

    Returns ``weights`` (d), ``intercept``, ``n``, ``loss``
    (penalized mean NLL at the LAST EVALUATED iterate — the point the
    final Newton step departed from, one step behind the returned
    weights; evaluating at the returned weights would cost one more
    corpus pass, and the convergence check uses successive evaluated
    losses, so this is the number the stop rule actually saw),
    ``iters_run``, ``reg``.
    """
    import numpy as np

    if reg < 0:
        raise ValueError(f"reg must be >= 0: {reg}")
    if iters < 1:
        raise ValueError(f"iters must be >= 1: {iters}")
    base = _vec_base(df, label_col, vec_col, binary=True).persist()
    try:
        # dim via an aggregate, never a filter: a predicate on a
        # pandas-UDF vector column can fuse into a join condition
        first = base.agg(
            F.max(F.when(F.size("__v") > 0, F.size("__v"))).alias("d")
        ).collect()
        if not first or first[0]["d"] is None:
            raise ValueError("no usable (vector, 0/1-label) rows to fit on")
        d = first[0]["d"]
        sc = df.sparkSession.sparkContext
        w = np.zeros(d + 1)  # last entry = intercept
        prev_loss = None
        it = 0
        for it in range(1, iters + 1):
            b_w = sc.broadcast(w)

            def partials(batches):
                import pandas as pd

                wv = b_w.value
                for pdf in batches:
                    pdf = _valid_rows(pdf)
                    if len(pdf) == 0:
                        continue
                    X = _as_matrix(pdf["__v"])
                    y = pdf["__y"].to_numpy(dtype="float64")
                    Xa = np.hstack([X, np.ones((len(X), 1))])
                    z = np.clip(Xa @ wv, -_Z_CLIP, _Z_CLIP)
                    p = 1.0 / (1.0 + np.exp(-z))
                    # NLL via log1p(exp(-|z|)) form: stable both tails
                    nll = float(
                        np.sum(np.log1p(np.exp(-np.abs(z))) + z * (z > 0) - y * z)
                    )
                    wt = p * (1.0 - p)
                    yield pd.DataFrame(
                        {
                            "n": [len(X)],
                            "h": [((Xa * wt[:, None]).T @ Xa).ravel().tolist()],
                            "g": [(Xa.T @ (y - p)).tolist()],
                            "l": [nll],
                        }
                    )

            rows = base.mapInPandas(
                partials, "n long, h array<double>, g array<double>, l double"
            ).collect()
            b_w.unpersist(blocking=False)  # consumed once partials collect
            if not rows:
                raise ValueError("no usable (vector, 0/1-label) rows to fit on")
            n = sum(r["n"] for r in rows)
            H = np.zeros((d + 1, d + 1))
            g = np.zeros(d + 1)
            nll = 0.0
            for r in rows:
                H += np.array(r["h"]).reshape(d + 1, d + 1)
                g += np.array(r["g"])
                nll += r["l"]
            pen = np.diag([reg] * d + [0.0])
            loss = (nll + 0.5 * reg * float(w[:d] @ w[:d])) / n
            g -= pen @ w
            w = w + np.linalg.solve(H + pen, g)
            if prev_loss is not None and abs(prev_loss - loss) < tol:
                break
            prev_loss = loss
        return {
            "weights": w[:d].tolist(),
            "intercept": float(w[d]),
            "n": int(n),
            "loss": float(loss),
            "iters_run": it,
            "reg": float(reg),
        }
    finally:
        base.unpersist()


def _dot_score(model: dict, vec_col: str) -> Column:
    """JVM-side ``x·w + b`` with NULL/dimension guards — an array
    literal + ``zip_with``/``aggregate``, fully inside codegen."""
    wts = [float(x) for x in model["weights"]]
    warr = F.array(*[F.lit(x) for x in wts])
    v = F.col(vec_col).cast("array<double>")
    dot = F.aggregate(
        F.zip_with(v, warr, lambda x, wi: x * wi),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return F.when(
        F.col(vec_col).isNotNull() & (F.size(vec_col) == len(wts)),
        dot + F.lit(float(model["intercept"])),
    )


def linear_predict(
    df: DataFrame, model: dict, vec_col: str = "embedding",
    out_col: str = "pred",
) -> DataFrame:
    """Append the :func:`ridge_fit` prediction ``x·w + b``. Pure
    scan-side JVM projection; NULL or wrong-dimension vectors → NULL."""
    return df.withColumn(out_col, _dot_score(model, vec_col))


def logreg_predict(
    df: DataFrame, model: dict, vec_col: str = "embedding",
    out_col: str = "p",
) -> DataFrame:
    """Append the :func:`logreg_fit` probability ``σ(x·w + b)`` with
    the same ±35 argument clamp training used. JVM-side; NULL or
    wrong-dimension vectors → NULL."""
    z = _dot_score(model, vec_col)
    # greatest/least SKIP NULLs (a NULL score would clamp to ±35 and
    # come out as a confident probability) — guard NULL explicitly
    z = F.when(
        z.isNotNull(), F.greatest(F.least(z, F.lit(_Z_CLIP)), F.lit(-_Z_CLIP))
    )
    return df.withColumn(out_col, F.lit(1.0) / (F.lit(1.0) + F.exp(-z)))


def ridge_fit_grouped(
    df: DataFrame,
    label_col: str,
    by: str,
    vec_col: str = "embedding",
    reg: float = 1e-3,
) -> DataFrame:
    """Per-group closed-form ridge — one model PER VALUE of ``by``
    (per-language calibration, per-domain quality regressors: the
    "millions of small models" shape) with NO driver materialization
    at any group count.

    Two stages: (1) one Arrow pass emits per-(batch, group) Gram
    partials — the exchange carries group-count × batch-count rows of
    (d+2)² doubles, never raw rows; (2) ``applyInPandas`` over the
    PARTIAL frame merges each group's grams and solves its (d+1)
    system executor-side. Groups whose label is constant get
    ``r2 = NaN`` (sst = 0), matching :func:`ridge_fit`; a NULL group
    key is a real group (ANSI GROUP BY).

    Returns a DataFrame ``(by, weights array<double>, intercept, n,
    r2)`` — feed one row's model into :func:`linear_predict` as
    ``{"weights": row["weights"], "intercept": row["intercept"]}``.
    """
    import numpy as np

    if reg < 0:
        raise ValueError(f"reg must be >= 0: {reg}")
    lab = F.col(label_col).cast("double")
    base = df.where(lab.isNotNull()).select(
        F.col(by).cast("string").alias("__g"),
        F.col(vec_col).cast("array<double>").alias("__v"),
        lab.alias("__y"),
    )

    def partials(batches):
        import pandas as pd

        for pdf in batches:
            if len(pdf) == 0:
                continue
            pdf = _valid_rows(pdf)
            if len(pdf) == 0:
                continue
            out = []
            for g, sub in pdf.groupby("__g", dropna=False):
                X = _as_matrix(sub["__v"])
                y = sub["__y"].to_numpy(dtype="float64")
                Z = np.hstack([X, np.ones((len(X), 1)), y[:, None]])
                out.append(
                    (None if pd.isna(g) else g, len(X),
                     (Z.T @ Z).ravel().tolist())
                )
            yield pd.DataFrame(out, columns=["__g", "n", "g"])

    part = base.mapInPandas(partials, "__g string, n long, g array<double>")

    def solve(pdf):
        import pandas as pd

        m = int(round(len(pdf["g"].iloc[0]) ** 0.5))
        d = m - 2
        G = np.zeros((m, m))
        for arr in pdf["g"]:
            G += np.asarray(arr, dtype="float64").reshape(m, m)
        n = int(pdf["n"].sum())
        A = G[: d + 1, : d + 1]
        bvec = G[: d + 1, d + 1]
        sum_y, sum_yy = G[d, d + 1], G[d + 1, d + 1]
        w = np.linalg.solve(A + np.diag([reg] * d + [0.0]), bvec)
        sse = float(sum_yy - 2 * w @ bvec + w @ A @ w)
        sst = float(sum_yy - sum_y * sum_y / n)
        return pd.DataFrame(
            {
                "__g": [pdf["__g"].iloc[0]],
                "weights": [w[:d].tolist()],
                "intercept": [float(w[d])],
                "n": [n],
                "r2": [1.0 - sse / sst if sst > 0 else float("nan")],
            }
        )

    out_schema = (
        "__g string, weights array<double>, intercept double, n long,"
        " r2 double"
    )
    return (
        part.groupBy("__g")
        .applyInPandas(solve, out_schema)
        .withColumnRenamed("__g", by)
    )


def logreg_fit_ovr(
    df: DataFrame,
    label_col: str,
    vec_col: str = "embedding",
    reg: float = 1e-3,
    iters: int = 12,
    tol: float = 1e-9,
    max_classes: int = 64,
) -> dict:
    """One-vs-rest multiclass on top of :func:`logreg_fit`: one binary
    IRLS fit per distinct label (NULL labels excluded), each inheriting
    the binary fit's replay determinism. Cost is classes × iters corpus
    scans, each reducing to metadata — fine for label spaces like
    language/topic/quality tiers (guarded by ``max_classes``).

    Returns ``{"classes": [...sorted as strings...], "models": [...]}``
    (per-class :func:`logreg_fit` dicts, same order).
    """
    # LIMIT before collect: the guard must bound the driver
    # materialization it exists for — with the wrong column (free text,
    # ids) an unbounded distinct().collect() is itself the OOM
    classes = [
        r["__c"]
        for r in df.select(
            F.col(label_col).cast("string").alias("__c")
        )
        .where(F.col("__c").isNotNull())
        .distinct()
        .limit(max_classes + 1)
        .collect()
    ]
    if len(classes) < 2:
        raise ValueError(f"need >= 2 distinct labels, got {classes}")
    if len(classes) > max_classes:
        raise ValueError(
            f"more than max_classes={max_classes} distinct labels;"
            " one-vs-rest costs one fit per class — raise the cap"
            " explicitly if that is intended"
        )
    classes.sort()
    models = []
    for c in classes:
        bin_df = df.withColumn(
            "__y",
            (F.col(label_col).cast("string") == c).cast("int"),
        )
        models.append(
            logreg_fit(bin_df, "__y", vec_col, reg=reg, iters=iters, tol=tol)
        )
    return {"classes": classes, "models": models}


def logreg_predict_ovr(
    df: DataFrame,
    model: dict,
    vec_col: str = "embedding",
    out_col: str = "label_pred",
    scores_col: str | None = "p_ovr",
) -> DataFrame:
    """Argmax-probability multiclass scoring, fully JVM-side: one
    sigmoid score per class (OvR scores — not normalized to sum 1),
    argmax via ``array_max`` over (p, −index) structs so ties break to
    the FIRST class in sorted order. NULL/ragged vectors → NULL label
    and NULL scores. Set ``scores_col=None`` to skip the score array.
    """
    classes = model["classes"]
    d = len(model["models"][0]["weights"])
    probs = []
    for m in model["models"]:
        z = _dot_score(m, vec_col)
        z = F.when(
            z.isNotNull(),
            F.greatest(F.least(z, F.lit(_Z_CLIP)), F.lit(-_Z_CLIP)),
        )
        probs.append(F.lit(1.0) / (F.lit(1.0) + F.exp(-z)))
    valid = F.col(vec_col).isNotNull() & (F.size(vec_col) == d)
    best = F.array_max(
        F.array(
            *[
                F.struct(p.alias("p"), F.lit(-i).alias("ni"))
                for i, p in enumerate(probs)
            ]
        )
    )
    label = F.element_at(
        F.array(*[F.lit(c) for c in classes]), (-best["ni"]) + 1
    )
    out = df.withColumn(out_col, F.when(valid, label))
    if scores_col:
        out = out.withColumn(scores_col, F.when(valid, F.array(*probs)))
    return out


def _py_irls(Xa, y, reg, iters, tol):
    """Pure-numpy full-batch IRLS — the same clamp/penalty/step/stop
    rules as the distributed :func:`logreg_fit` loop (whose tests pin
    that equivalence). Used executor-side by the grouped fit."""
    import numpy as np

    d = Xa.shape[1] - 1
    pen = np.diag([reg] * d + [0.0])
    w = np.zeros(d + 1)
    prev = None
    loss = float("nan")
    it = 0
    for it in range(1, iters + 1):
        z = np.clip(Xa @ w, -_Z_CLIP, _Z_CLIP)
        p = 1.0 / (1.0 + np.exp(-z))
        nll = float(np.sum(np.log1p(np.exp(-np.abs(z))) + z * (z > 0) - y * z))
        loss = (nll + 0.5 * reg * float(w[:d] @ w[:d])) / len(Xa)
        H = (Xa * (p * (1 - p))[:, None]).T @ Xa
        g = Xa.T @ (y - p) - pen @ w
        w = w + np.linalg.solve(H + pen, g)
        if prev is not None and abs(prev - loss) < tol:
            break
        prev = loss
    return w, loss, it


def logreg_fit_grouped(
    df: DataFrame,
    label_col: str,
    by: str,
    vec_col: str = "embedding",
    reg: float = 1e-3,
    iters: int = 12,
    tol: float = 1e-9,
    max_group_rows: int = 2_000_000,
) -> DataFrame:
    """One logistic classifier PER VALUE of ``by`` (per-language /
    per-source quality models) — the iterative sibling of
    :func:`ridge_fit_grouped`. Logistic has no closed form, so unlike
    the ridge's partial-merge shape this runs the full IRLS per group
    EXECUTOR-SIDE via ``applyInPandas``: the explicit contract is that
    one group's labeled rows fit in one executor's memory
    (``max_group_rows`` guards it with a readable error — a group
    bigger than that belongs to the global :func:`logreg_fit`, whose
    per-iteration partials never materialize the group anywhere).

    Same exclusion rules as :func:`logreg_fit` (NULL/non-0/1 labels
    and NULL/empty vectors drop; mixed dims raise); groups left with
    <1 usable row or a single class still return a row — reg > 0
    keeps the solve defined — so the output has one row per group with
    any usable data. Returns ``(by, weights, intercept, n, loss,
    iters_run)``; feed a row into :func:`logreg_predict` as
    ``{"weights": row["weights"], "intercept": row["intercept"]}``.
    """
    import numpy as np

    if reg < 0:
        raise ValueError(f"reg must be >= 0: {reg}")
    if iters < 1:
        raise ValueError(f"iters must be >= 1: {iters}")
    lab = F.col(label_col).cast("double")
    base = df.where(lab.isNotNull() & lab.isin(0.0, 1.0)).select(
        F.col(by).cast("string").alias("__g"),
        F.col(vec_col).cast("array<double>").alias("__v"),
        lab.alias("__y"),
    )

    def fit(pdf):
        import pandas as pd

        g = pdf["__g"].iloc[0] if len(pdf) else None
        pdf = _valid_rows(pdf)
        if len(pdf) == 0:
            return pd.DataFrame(
                columns=["__g", "weights", "intercept", "n", "loss",
                         "iters_run"]
            )
        if len(pdf) > max_group_rows:
            raise ValueError(
                f"group {g!r} has {len(pdf)} rows >"
                f" max_group_rows={max_group_rows}: use the global"
                " logreg_fit (partial-based) for groups this large"
            )
        X = _as_matrix(pdf["__v"])
        y = pdf["__y"].to_numpy(dtype="float64")
        Xa = np.hstack([X, np.ones((len(X), 1))])
        w, loss, it = _py_irls(Xa, y, reg, iters, tol)
        d = X.shape[1]
        return pd.DataFrame(
            {
                "__g": [g],
                "weights": [w[:d].tolist()],
                "intercept": [float(w[d])],
                "n": [len(X)],
                "loss": [float(loss)],
                "iters_run": [it],
            }
        )

    out_schema = (
        "__g string, weights array<double>, intercept double, n long,"
        " loss double, iters_run int"
    )
    return (
        base.groupBy("__g")
        .applyInPandas(fit, out_schema)
        .withColumnRenamed("__g", by)
    )


def huber_fit(
    df: DataFrame,
    label_col: str,
    vec_col: str = "embedding",
    delta: float = 1.35,
    reg: float = 1e-3,
    iters: int = 12,
    tol: float = 1e-9,
) -> dict:
    """Robust (Huber-loss) regression by IRLS — the heavy-tail-safe
    sibling of :func:`ridge_fit` for corpus-derived targets where a
    handful of corrupt labels (a 1e9 "quality score", a parser bug)
    would otherwise own the least-squares fit.

    Per iteration: broadcast current weights; each batch computes
    residuals r = y − Xa·w and Huber weights ω = min(1, δ/|r|)
    (quadratic inside ±δ, linear outside), then emits the ω-weighted
    Gram partials XaᵀΩXa / XaᵀΩy plus the Huber loss — the same
    metadata-sized reduce as :func:`logreg_fit`; the driver solves the
    weighted ridge system. ``delta`` is in label units (the classical
    1.35 presumes ~unit-scale residuals — ``features.fit_scaler`` the
    target first, or pass your own). Exclusions match the other fits
    (NULL labels/vectors out, mixed dims raise). Returns ``weights``,
    ``intercept``, ``n``, ``loss`` (mean Huber loss at the last
    evaluated iterate, same one-step-behind convention as
    ``logreg_fit``), ``iters_run``, ``delta``, ``reg``.
    """
    import numpy as np

    if delta <= 0:
        raise ValueError(f"delta must be > 0: {delta}")
    if reg < 0:
        raise ValueError(f"reg must be >= 0: {reg}")
    if iters < 1:
        raise ValueError(f"iters must be >= 1: {iters}")
    base = _vec_base(df, label_col, vec_col, binary=False).persist()
    try:
        first = base.agg(
            F.max(F.when(F.size("__v") > 0, F.size("__v"))).alias("d")
        ).collect()
        if not first or first[0]["d"] is None:
            raise ValueError("no usable (vector, label) rows to fit on")
        d = first[0]["d"]
        sc = df.sparkSession.sparkContext
        w = np.zeros(d + 1)
        prev_loss = None
        it = 0
        n = 0
        for it in range(1, iters + 1):
            b_w = sc.broadcast(w)

            def partials(batches):
                import pandas as pd

                wv = b_w.value
                for pdf in batches:
                    pdf = _valid_rows(pdf)
                    if len(pdf) == 0:
                        continue
                    X = _as_matrix(pdf["__v"])
                    y = pdf["__y"].to_numpy(dtype="float64")
                    Xa = np.hstack([X, np.ones((len(X), 1))])
                    r = y - Xa @ wv
                    a = np.abs(r)
                    om = np.where(a <= delta, 1.0, delta / np.maximum(a, 1e-300))
                    hub = np.where(
                        a <= delta, 0.5 * r * r, delta * (a - 0.5 * delta)
                    )
                    Xw = Xa * om[:, None]
                    yield pd.DataFrame(
                        {
                            "n": [len(X)],
                            "h": [(Xw.T @ Xa).ravel().tolist()],
                            "g": [(Xa.T @ (om * y)).tolist()],
                            "l": [float(hub.sum())],
                        }
                    )

            rows = base.mapInPandas(
                partials, "n long, h array<double>, g array<double>, l double"
            ).collect()
            b_w.unpersist(blocking=False)
            if not rows:
                raise ValueError("no usable (vector, label) rows to fit on")
            n = sum(r["n"] for r in rows)
            H = np.zeros((d + 1, d + 1))
            g = np.zeros(d + 1)
            hub = 0.0
            for r in rows:
                H += np.array(r["h"]).reshape(d + 1, d + 1)
                g += np.array(r["g"])
                hub += r["l"]
            loss = (hub + 0.5 * reg * float(w[:d] @ w[:d])) / n
            pen = np.diag([reg] * d + [0.0])
            # symmetrize: float error makes XwᵀXa slightly asymmetric
            H = (H + H.T) / 2.0
            w = np.linalg.solve(H + pen, g)
            if prev_loss is not None and abs(prev_loss - loss) < tol:
                break
            prev_loss = loss
        return {
            "weights": w[:d].tolist(),
            "intercept": float(w[d]),
            "n": int(n),
            "loss": float(loss),
            "iters_run": it,
            "delta": float(delta),
            "reg": float(reg),
        }
    finally:
        base.unpersist()


def theil_sen_fit_grouped(
    df: DataFrame,
    x_col: str,
    y_col: str,
    by: str,
    max_group_rows: int = 10_000,
) -> DataFrame:
    """Per-group Theil–Sen robust simple regression (Theil 1950 /
    Sen 1968): slope = MEDIAN of all pairwise slopes
    ``(y_j − y_i)/(x_j − x_i)``, intercept = median(y − slope·x) — the
    29%-breakdown-point line fit that one corrupt decade of data
    cannot own, where :func:`huber_fit` is the multivariate IRLS
    sibling and ``timeseries.mann_kendall_trend``'s Sen slope is the
    time-indexed special case.

    Executor-side per-key ``applyInPandas`` fold with the SAME chunked
    pairwise discipline as Mann-Kendall (ADVICE r6): O(B·n) blocks,
    only the slope values (n(n−1)/2 doubles — the exact median needs
    them all) materialize, never a dense n×n matrix; the
    ``max_group_rows`` guard names the real (memory) constraint.
    NULL x/y rows excluded; groups with < 2 distinct x values are
    excluded (no line). Output: ``(by, n, slope, intercept)``.
    """
    base = df.select(
        F.col(by).cast("string").alias("__g"),
        F.col(x_col).cast("double").alias("__x"),
        F.col(y_col).cast("double").alias("__y"),
    ).where(F.col("__x").isNotNull() & F.col("__y").isNotNull())

    def fit(pdf):
        import numpy as np
        import pandas as pd

        key = pdf["__g"].iloc[0] if len(pdf) else None
        if len(pdf) > max_group_rows:
            raise ValueError(
                f"group {key!r} has {len(pdf)} rows >"
                f" max_group_rows={max_group_rows} (pairwise slope storage"
                f" is O(n²) doubles)"
            )
        x = pdf["__x"].to_numpy(dtype="float64")
        y = pdf["__y"].to_numpy(dtype="float64")
        n = len(x)
        cols = ["__g", "n", "slope", "intercept"]
        if n < 2 or np.unique(x).size < 2:
            return pd.DataFrame(columns=cols)
        B = 2048
        slopes = []
        for i0 in range(0, n - 1, B):
            i1 = min(i0 + B, n - 1)
            dx = x[None, i0 + 1:] - x[i0:i1, None]
            dy = y[None, i0 + 1:] - y[i0:i1, None]
            jj = np.arange(i0 + 1, n)[None, :]
            ii = np.arange(i0, i1)[:, None]
            keep = (jj > ii) & (dx != 0)
            if keep.any():
                slopes.append(dy[keep] / dx[keep])
        slope = float(np.median(np.concatenate(slopes)))
        intercept = float(np.median(y - slope * x))
        return pd.DataFrame([(key, n, slope, intercept)], columns=cols)

    out = base.groupBy("__g").applyInPandas(
        fit, schema="__g string, n long, slope double, intercept double"
    )
    return out.select(F.col("__g").alias(by), "n", "slope", "intercept")


_POIS_CLIP = 30.0  # log-link clamp; exp(30)≈1e13 keeps μ, H finite


def poisson_fit(
    df: DataFrame,
    label_col: str,
    vec_col: str = "embedding",
    reg: float = 1e-3,
    iters: int = 12,
    tol: float = 1e-9,
) -> dict:
    """Full-batch L2-regularized Poisson regression (log link) by
    IRLS — the count-model member of the GLM tier (event counts per
    user, defects per batch, tokens per document): ``E[y|x] =
    exp(x·w + b)``.

    Identical round discipline to :func:`logreg_fit` (the bounded-
    round contract): per iteration ONE Arrow pass emits per-batch
    Hessian/gradient/NLL partials ((d+1)² + (d+1) + 1 doubles —
    ``H = Xᵀdiag(μ)X``, ``g = Xᵀ(y−μ)``, ``nll = Σ(μ − y·z)`` up to
    the y-only constant), the driver solves the penalized Newton
    step. The linear predictor clamps to ±30 (exp stays finite in a
    double) — the replay oracle applies the identical clamp. Labels
    must be ≥ 0 (counts; NULL/negative rows excluded JVM-side).

    Returns ``weights, intercept, n, loss`` (penalized mean NLL at
    the last evaluated iterate — same one-behind semantics as
    ``logreg_fit``, documented there), ``iters_run, reg``.
    """
    import numpy as np

    if reg < 0:
        raise ValueError(f"reg must be >= 0: {reg}")
    if iters < 1:
        raise ValueError(f"iters must be >= 1: {iters}")
    base = (
        df.where(F.col(label_col).cast("double") >= 0)
        .transform(lambda d: _vec_base(d, label_col, vec_col, binary=False))
        .persist()
    )
    try:
        first = base.agg(
            F.max(F.when(F.size("__v") > 0, F.size("__v"))).alias("d")
        ).collect()
        if not first or first[0]["d"] is None:
            raise ValueError("no usable (vector, count-label) rows to fit on")
        d = first[0]["d"]
        sc = df.sparkSession.sparkContext
        w = np.zeros(d + 1)
        prev_loss = None
        it = 0
        for it in range(1, iters + 1):
            b_w = sc.broadcast(w)

            def partials(batches):
                import pandas as pd

                wv = b_w.value
                for pdf in batches:
                    pdf = _valid_rows(pdf)
                    if len(pdf) == 0:
                        continue
                    X = _as_matrix(pdf["__v"])
                    y = pdf["__y"].to_numpy(dtype="float64")
                    Xa = np.hstack([X, np.ones((len(X), 1))])
                    z = np.clip(Xa @ wv, -_POIS_CLIP, _POIS_CLIP)
                    mu = np.exp(z)
                    nll = float(np.sum(mu - y * z))
                    yield pd.DataFrame(
                        {
                            "n": [len(X)],
                            "h": [((Xa * mu[:, None]).T @ Xa).ravel().tolist()],
                            "g": [(Xa.T @ (y - mu)).tolist()],
                            "l": [nll],
                        }
                    )

            rows = base.mapInPandas(
                partials, "n long, h array<double>, g array<double>, l double"
            ).collect()
            b_w.unpersist(blocking=False)
            if not rows:
                raise ValueError(
                    "no usable (vector, count-label) rows to fit on"
                )
            n = sum(r["n"] for r in rows)
            H = np.zeros((d + 1, d + 1))
            g = np.zeros(d + 1)
            nll = 0.0
            for r in rows:
                H += np.array(r["h"]).reshape(d + 1, d + 1)
                g += np.array(r["g"])
                nll += r["l"]
            pen = np.diag([reg] * d + [0.0])
            loss = (nll + 0.5 * reg * float(w[:d] @ w[:d])) / n
            g -= pen @ w
            w = w + np.linalg.solve(H + pen, g)
            if prev_loss is not None and abs(prev_loss - loss) < tol:
                break
            prev_loss = loss
        return {
            "weights": w[:d].tolist(),
            "intercept": float(w[d]),
            "n": int(n),
            "loss": float(loss),
            "iters_run": it,
            "reg": float(reg),
        }
    finally:
        base.unpersist()


def poisson_predict(
    df: DataFrame, model: dict, vec_col: str = "embedding",
    out_col: str = "rate",
) -> DataFrame:
    """Append ``exp(clamp(x·w + b))`` — the fitted Poisson rate. Pure
    scan-side JVM projection (the ``linear_predict`` contract); NULL
    or wrong-dimension vectors → NULL."""
    z = _dot_score(model, vec_col)
    # least/greatest SKIP NULLs (they return the non-null operand), so
    # the clamp must be gated or a NULL score would become exp(±clip)
    return df.withColumn(
        out_col,
        F.when(
            z.isNotNull(),
            F.exp(
                F.greatest(
                    F.least(z, F.lit(_POIS_CLIP)), F.lit(-_POIS_CLIP)
                )
            ),
        ),
    )


def py_poisson_irls(X, y, reg, iters, tol):
    """Reference IRLS for the oracle tests: the exact arithmetic
    ``poisson_fit`` distributes (same clamp, same penalty, same stop
    rule)."""
    import numpy as np

    Xa = np.hstack([np.asarray(X, dtype=float),
                    np.ones((len(X), 1))])
    y = np.asarray(y, dtype=float)
    d = Xa.shape[1] - 1
    w = np.zeros(d + 1)
    prev_loss = None
    it = 0
    for it in range(1, iters + 1):
        z = np.clip(Xa @ w, -_POIS_CLIP, _POIS_CLIP)
        mu = np.exp(z)
        loss = (float(np.sum(mu - y * z))
                + 0.5 * reg * float(w[:d] @ w[:d])) / len(y)
        H = (Xa * mu[:, None]).T @ Xa
        g = Xa.T @ (y - mu)
        pen = np.diag([reg] * d + [0.0])
        g = g - pen @ w
        w = w + np.linalg.solve(H + pen, g)
        if prev_loss is not None and abs(prev_loss - loss) < tol:
            break
        prev_loss = loss
    return w, float(loss), it
