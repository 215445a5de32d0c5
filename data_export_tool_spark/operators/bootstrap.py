"""Poisson bootstrap confidence intervals (Chamandy et al., Google
2012, "Estimating Uncertainty for Massive Data Streams").

The classical bootstrap resamples n rows WITH replacement — which
requires knowing n and coordinating a global multinomial draw,
exactly what a distributed scan cannot do. The Poisson bootstrap
replaces the multinomial with independent per-row Poisson(1) weights
(their sum concentrates at n, and the replicate distributions
converge to the classical bootstrap's), so every row can draw its B
replicate weights LOCALLY and deterministically from its own id —
no coordination, one pass, retry-stable. This is the standard way
to put an honest CI on a mean over data too large to resample.

Shape:

1. one Arrow pass: each row derives B Poisson(1) weights from
   splitmix64(row_key·B + b) (pure counter mixing — vectorized
   uint64 numpy, identical in the python replay) and the batch
   PARTIAL-aggregates per group: Σwx and Σw per replicate (two
   B-vectors) plus the exact n/Σx — partition-grain partials,
   never rows;
2. posexplode the B-vectors → (group, replicate) grain (groups × B
   metadata rows), groupBy-sum, replicate mean = Σwx/Σw;
3. per group: exact point estimate and the percentile CI over the
   B replicate means (SQL ``percentile`` interpolation).

Weights cap at 8 (P[Poisson(1) > 8] ≈ 1e-6 — the documented
truncation, shared with the replay). ``id_col`` seeds the weights
via ``xxhash64`` so resampling is a pure function of the data:
re-runs, retries and repartitions agree exactly.

Oracle: exact replay of the full weight/fold pipeline + a coverage
law (tests/test_bootstrap.py → OPCHECK ``poisson_bootstrap_ci``).
"""

from __future__ import annotations

from collections.abc import Sequence

import numpy as np

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["poisson_bootstrap_ci", "np_poisson_weights"]

#: Poisson(1) CDF cutpoints for k = 0..7 (P(k) = e⁻¹/k!); a uniform
#: beyond the last cutpoint truncates to weight 8 (mass ≈ 1e-6)
_E1 = 0.36787944117144233
_POIS1_CDF = np.cumsum(
    [_E1 / f for f in (1, 1, 2, 6, 24, 120, 720, 5040)]
)


def _mix64(n: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer over a uint64 counter array → [0, 1)."""
    with np.errstate(over="ignore"):
        z = (n.astype(np.uint64) + np.uint64(0x9E3779B97F4A7C15)) * np.uint64(1)
        z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        z = z ^ (z >> np.uint64(31))
    return z / 2.0**64


def np_poisson_weights(keys: np.ndarray, b: int, seed: int) -> np.ndarray:
    """(n, B) deterministic Poisson(1) weights for the given row
    keys — the exact generator the operator and replay share.

    Fully vectorized over the (n, B) counter grid in one shot (r10) —
    bit-identical to the old per-replicate loop (same uint64 counters,
    same mix, same CDF inversion), without B python-level passes or
    the final stack copy."""
    ks = keys.astype(np.uint64)
    with np.errstate(over="ignore"):
        ctr = (
            ks[:, None] * np.uint64(b)
            + np.arange(b, dtype=np.uint64)[None, :]
            + np.uint64(seed)
        )
    u = _mix64(ctr)
    return np.searchsorted(_POIS1_CDF, u).astype(np.float64)


def poisson_bootstrap_ci(
    df: DataFrame,
    id_col: str,
    value_col: str,
    by: Sequence[str] = (),
    n_replicates: int = 200,
    alpha: float = 0.05,
    seed: int = 17,
) -> DataFrame:
    """Percentile-bootstrap CI for the MEAN of ``value_col`` per
    group: ``by…, estimate, ci_lo, ci_hi, n, n_replicates``.

    Rows with a NULL value, NULL id, or any NULL ``by`` key are
    excluded up front — pandas' ``groupby(dropna=False)`` would emit
    NaN group keys that silently coerce (or fail) when converted back
    to Spark under the original integer/long Arrow schema, so NULL
    groups are not a representable output of this estimator.
    """
    if n_replicates < 10:
        raise ValueError(
            f"n_replicates must be >= 10, got {n_replicates}"
        )
    if not 0.0 < alpha < 1.0:
        raise ValueError(f"alpha must be in (0, 1), got {alpha}")
    if isinstance(by, str):
        by = [by]
    by = list(by)
    B = int(n_replicates)
    import pandas as pd

    cond = F.col(value_col).isNotNull() & F.col(id_col).isNotNull()
    for c in by:
        cond = cond & F.col(c).isNotNull()
    base = df.where(cond).select(
        *by,
        F.xxhash64(F.col(id_col)).alias("__k"),
        F.col(value_col).cast("double").alias("__x"),
    )

    def partials(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            out = []
            for gkey, sub in (
                pdf.groupby(by, dropna=False) if by else [((), pdf)]
            ):
                keys = sub["__k"].to_numpy(dtype=np.int64)
                x = sub["__x"].to_numpy(dtype=np.float64)
                W = np_poisson_weights(keys, B, seed)
                # BLAS matvec instead of an (n, B) elementwise product +
                # reduction — no n×B temporary, same partial sums up to
                # summation order (the cross-batch fold already sums
                # partials in arbitrary order)
                row = {
                    "__swx": (x @ W).tolist(),
                    "__sw": W.sum(axis=0).tolist(),
                    "__n": len(x),
                    "__sx": float(x.sum()),
                }
                if by:
                    if not isinstance(gkey, tuple):
                        gkey = (gkey,)
                    for c, v in zip(by, gkey):
                        row[c] = v
                out.append(row)
            cols = by + ["__swx", "__sw", "__n", "__sx"]
            yield pd.DataFrame(out)[cols]

    by_schema = "".join(
        f"{c} {dict(df.dtypes)[c]}, " for c in by
    )
    part = base.mapInPandas(
        partials,
        by_schema
        + "__swx array<double>, __sw array<double>, __n long, __sx double",
    )
    rep = (
        part.select(
            *by,
            "__n",
            "__sx",
            F.posexplode(
                F.arrays_zip(F.col("__swx"), F.col("__sw"))
            ).alias("__b", "__z"),
        )
        .groupBy(*by, "__b")
        .agg(
            F.sum(F.col("__z.__swx")).alias("__swx"),
            F.sum(F.col("__z.__sw")).alias("__sw"),
            F.sum("__n").alias("__n"),
            F.sum("__sx").alias("__sx"),
        )
        .withColumn(
            "__m",
            F.when(F.col("__sw") > 0, F.col("__swx") / F.col("__sw")),
        )
    )
    lo, hi = alpha / 2.0, 1.0 - alpha / 2.0
    return rep.groupBy(*by).agg(
        (F.sum("__sx") / F.sum("__n")).alias("estimate"),
        F.expr(f"percentile(__m, {lo!r}D)").alias("ci_lo"),
        F.expr(f"percentile(__m, {hi!r}D)").alias("ci_hi"),
        (F.sum("__n") / F.lit(B)).cast("long").alias("n"),
        F.lit(B).alias("n_replicates"),
    )
