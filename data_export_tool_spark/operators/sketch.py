"""Approximate sketches for 100 TB-scale profiling passes.

Exact COUNT(DISTINCT) and exact percentiles are shuffle-expensive at
scale: distinct carries every key to a reducer, exact percentile sorts
the column. These wrappers expose Spark's mergeable one-pass sketches
— HyperLogLog++ (`approx_count_distinct`) and the Greenwald-Khanna
quantile summary (`percentile_approx`) — as the default profiling
tier, with the exact forms kept alongside for the (small) final
aggregates where exactness is worth the shuffle.

Both sketches are associative/commutative, so they partial-aggregate
map-side and merge in one reduction — a single narrow shuffle of
sketch bytes, independent of cardinality. Accuracy contracts are
pinned by tests (tests/test_sketch.py), not assumed.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, functions as F


def approx_distinct(
    df: DataFrame,
    col: str,
    by: Sequence[str] = (),
    rsd: float = 0.02,
    out_col: str | None = None,
) -> DataFrame:
    """HLL++ distinct count of ``col`` (optionally grouped by ``by``).
    ``rsd`` is the target relative standard deviation; 0.02 ≈ the
    default sketch of ~1.5 KB per group regardless of cardinality."""
    if isinstance(by, str):  # a bare string would group per CHARACTER
        by = [by]
    out = out_col or f"approx_distinct_{col}"
    agg = F.approx_count_distinct(col, rsd=rsd).alias(out)
    return df.groupBy(*by).agg(agg) if by else df.agg(agg)


def approx_quantiles(
    df: DataFrame,
    col: str,
    probabilities: Sequence[float] = (0.25, 0.5, 0.75, 0.9, 0.99),
    by: Sequence[str] = (),
    relative_error: float = 0.001,
    out_col: str | None = None,
) -> DataFrame:
    """Greenwald-Khanna approximate quantiles of ``col``; guaranteed
    rank error ≤ ``relative_error``·N. Returns one array column in
    probability order."""
    import math

    if isinstance(by, str):
        by = [by]
    if not 0 < relative_error <= 1:
        raise ValueError(f"relative_error must be in (0, 1]: {relative_error}")
    out = out_col or f"approx_q_{col}"
    # ceil, not truncate: accuracy=int(1/0.003)=333 would guarantee
    # only 1/333 > 0.003 rank error, breaking the documented bound
    agg = F.percentile_approx(
        col, list(probabilities), math.ceil(1.0 / relative_error)
    ).alias(out)
    return df.groupBy(*by).agg(agg) if by else df.agg(agg)


def exact_quantiles(
    col: str, probabilities: Sequence[float]
) -> Column:
    """Exact linear-interpolation percentiles (SQL PERCENTILE_CONT
    semantics, matching DuckDB's quantile_cont) — the full-sort tier;
    use only on already-reduced groups."""
    probs = ", ".join(repr(float(p)) + "D" for p in probabilities)
    return F.expr(f"percentile({col}, array({probs}))")
