"""Probabilistic record linkage: Fellegi–Sunter model fit by EM.

The classic entity-resolution scorer (Fellegi & Sunter 1969; the model
behind Splink / the Census Bureau matchers): candidate record pairs
carry a COMPARISON VECTOR γ of per-field agreement flags (name agrees,
dob agrees, zip agrees, …); the model learns, without labels, each
field's

* ``m`` — P(field agrees | pair is a true match), and
* ``u`` — P(field agrees | pair is a non-match),

plus the match prevalence λ, by EM under the conditional-independence
assumption. Each field then contributes ``log2(m/u)`` when it agrees
and ``log2((1−m)/(1−u))`` when it disagrees; a pair's match weight is
the sum, and the posterior match probability follows from the prior
log-odds ``log2(λ/(1−λ))``.

Upstream blocking is someone else's contract — feed this candidate
pairs from ``fuzzy.fuzzy_dedup_pairs`` / ``phonetic_dedup_pairs`` /
``dedup.minhash_lsh_candidates``, never a cross join.

Reference scope note: the reference (/root/reference/export.py) has no
linkage surface at all; this is extended-surface (SURVEY.md §2k X194).

Scale shape
-----------
EM never iterates over pairs. ONE groupBy collapses the pair table to
its distinct agreement PATTERNS (≤ 2^k rows for k fields — metadata,
enforced ``k <= 20``) with counts; every EM iteration is pure driver
arithmetic over that pattern table. Total cluster work: one
map-side-combinable aggregation, whatever the pair count. Scoring
(``fs_score``) is scan-side column algebra — broadcast-free, no
Python.

Conventions the replay oracle pins
----------------------------------
* Agreement columns are coerced with ``cast("int")``; NULL counts as
  disagreement (0) — disclosed, matching the "missing ≈ no evidence of
  agreement" default (a dedicated missing level is a caller-side
  recode).
* m/u are clamped to [1e-6, 1−1e-6] every M-step (degenerate-field
  guard); λ to [1e-9, 1−1e-9].
* Convergence: max absolute parameter change < ``tol`` (checked after
  each full EM sweep), else ``max_iter``.
"""

from __future__ import annotations

import math
from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["fs_em", "fs_score", "py_fs_em"]

_P_EPS = 1e-6
_L_EPS = 1e-9


def py_fs_em(
    patterns: Sequence[tuple[tuple[int, ...], int]],
    k: int,
    max_iter: int = 50,
    tol: float = 1e-10,
    init_m: float = 0.9,
    init_u: float = 0.1,
    init_lambda: float = 0.1,
) -> dict:
    """EM over an aggregated pattern table ``[(γ tuple, count)]`` —
    the exact arithmetic ``fs_em`` runs, exposed so oracles replay it
    bit-for-bit (and so the driver-side fold is auditable: it only
    ever sees ≤ 2^k rows)."""
    m = [init_m] * k
    u = [init_u] * k
    lam = init_lambda
    n_total = sum(c for _, c in patterns)
    if n_total == 0:
        raise ValueError("no candidate pairs to fit on")
    iters = 0
    for iters in range(1, max_iter + 1):
        # E-step: posterior match weight per pattern
        sw = 0.0  # Σ n·w
        swg = [0.0] * k  # Σ n·w·γi
        sug = [0.0] * k  # Σ n·(1−w)·γi
        for gamma, cnt in patterns:
            pm, pu = lam, 1.0 - lam
            for i in range(k):
                pm *= m[i] if gamma[i] else (1.0 - m[i])
                pu *= u[i] if gamma[i] else (1.0 - u[i])
            w = pm / (pm + pu) if (pm + pu) > 0.0 else 0.0
            sw += cnt * w
            for i in range(k):
                if gamma[i]:
                    swg[i] += cnt * w
                    sug[i] += cnt * (1.0 - w)
        # M-step
        new_lam = min(max(sw / n_total, _L_EPS), 1.0 - _L_EPS)
        su = n_total - sw
        new_m = [
            min(max(swg[i] / sw, _P_EPS), 1.0 - _P_EPS) if sw > 0.0 else m[i]
            for i in range(k)
        ]
        new_u = [
            min(max(sug[i] / su, _P_EPS), 1.0 - _P_EPS) if su > 0.0 else u[i]
            for i in range(k)
        ]
        delta = max(
            abs(new_lam - lam),
            max(abs(new_m[i] - m[i]) for i in range(k)),
            max(abs(new_u[i] - u[i]) for i in range(k)),
        )
        m, u, lam = new_m, new_u, new_lam
        if delta < tol:
            break
    # observed-data log-likelihood at the final parameters
    loglik = 0.0
    for gamma, cnt in patterns:
        pm, pu = lam, 1.0 - lam
        for i in range(k):
            pm *= m[i] if gamma[i] else (1.0 - m[i])
            pu *= u[i] if gamma[i] else (1.0 - u[i])
        loglik += cnt * math.log(pm + pu)
    return {"lambda": lam, "m": m, "u": u, "iters": iters, "loglik": loglik}


def fs_em(
    pairs: DataFrame,
    agree_cols: Sequence[str],
    max_iter: int = 50,
    tol: float = 1e-10,
    init_m: float = 0.9,
    init_u: float = 0.1,
    init_lambda: float = 0.1,
) -> dict:
    """Fit the Fellegi–Sunter model on a candidate-pair DataFrame.

    ``agree_cols`` are 0/1 (or boolean) per-field agreement flags;
    NULL → 0. Returns a plain model dict::

        {"lambda": float, "prior_log_odds": float (log2 λ/(1−λ)),
         "n_pairs": int, "iters": int, "loglik": float,
         "fields": [{"col", "m", "u",
                     "weight_agree"    (log2 m/u),
                     "weight_disagree" (log2 (1−m)/(1−u))}, ...]}

    Cost: ONE pattern aggregation over the pairs (≤ 2^k groups), then
    driver-side EM on that metadata-sized table.
    """
    agree_cols = list(agree_cols)
    k = len(agree_cols)
    if k == 0:
        raise ValueError("fs_em needs at least one agreement column")
    if k > 20:
        raise ValueError(
            f"fs_em: {k} agreement columns would mean up to 2^{k} patterns; "
            "the driver-side fold is sized for k <= 20"
        )
    flags = [
        F.coalesce(F.col(c).cast("int"), F.lit(0)).alias(f"__g_{i}")
        for i, c in enumerate(agree_cols)
    ]
    pat = (
        pairs.select(*flags)
        .groupBy(*[f"__g_{i}" for i in range(k)])
        .count()
        .collect()
    )
    patterns = [
        (tuple(int(r[f"__g_{i}"]) for i in range(k)), int(r["count"]))
        for r in pat
    ]
    fit = py_fs_em(
        patterns,
        k,
        max_iter=max_iter,
        tol=tol,
        init_m=init_m,
        init_u=init_u,
        init_lambda=init_lambda,
    )
    lam = fit["lambda"]
    fields = []
    for i, c in enumerate(agree_cols):
        m_i, u_i = fit["m"][i], fit["u"][i]
        fields.append(
            {
                "col": c,
                "m": m_i,
                "u": u_i,
                "weight_agree": math.log2(m_i / u_i),
                "weight_disagree": math.log2((1.0 - m_i) / (1.0 - u_i)),
            }
        )
    return {
        "lambda": lam,
        "prior_log_odds": math.log2(lam / (1.0 - lam)),
        "n_pairs": sum(c for _, c in patterns),
        "iters": fit["iters"],
        "loglik": fit["loglik"],
        "fields": fields,
    }


def fs_score(pairs: DataFrame, model: dict) -> DataFrame:
    """Score candidate pairs with a fitted model: appends
    ``match_weight`` (Σ per-field log2 agree/disagree weights) and
    ``match_probability`` (posterior from prior log-odds +
    match_weight). Pure column algebra — no Python, no shuffle; NULL
    agreement scores as disagreement, mirroring ``fs_em``."""
    w = F.lit(0.0)
    for f in model["fields"]:
        g = F.coalesce(F.col(f["col"]).cast("int"), F.lit(0))
        w = w + F.when(g == 1, F.lit(float(f["weight_agree"]))).otherwise(
            F.lit(float(f["weight_disagree"]))
        )
    out = pairs.withColumn("match_weight", w)
    total = F.lit(float(model["prior_log_odds"])) + F.col("match_weight")
    return out.withColumn(
        "match_probability",
        F.lit(1.0) / (F.lit(1.0) + F.pow(F.lit(2.0), -total)),
    )
