"""Metric-change contribution analysis: which dimension values moved
the metric between two periods.

The "why is revenue down 4% week-over-week" primitive every metrics
dashboard grows eventually (metric-tree / slice-and-dice root-cause,
e.g. Adtributor, Bhagwan et al. 2014): for each candidate dimension,
decompose the total metric delta into per-dimension-value deltas and
rank the movers. A value's contribution is

    delta(v)  = after_metric(v) − before_metric(v)
    share(v)  = delta(v) / total_delta

so shares sum to 1 per dimension (a complete partition of the delta —
values missing from one period contribute their full appearance /
disappearance).

Scale shape
-----------
ONE exchange for every dimension at once: the two period frames union
under a period tag, each row explodes to its (dimension, value) pairs
(an Expand — the ``melt`` physical shape), and one map-side-combining
groupBy on (dimension, value) folds conditional before/after sums.
The 1-row total-delta aggregate broadcasts back (BNLJ on a 1-row
side). Per-dimension ranking is a window bounded by that dimension's
distinct-value count. NULL dimension values group as the literal
``"<null>"`` bucket — a real mover category (new untagged traffic),
not droppable.

Oracle: DuckDB conditional-aggregation replica per dimension
(tests/test_rootcause.py → OPCHECK ``metric_contributions``).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["metric_contributions"]

NULL_BUCKET = "<null>"


def metric_contributions(
    before: DataFrame,
    after: DataFrame,
    dims: Sequence[str],
    value_col: str | None = None,
    top_k: int | None = None,
) -> DataFrame:
    """Rank per-dimension movers of the metric delta between two
    period frames. ``value_col`` None means the metric is COUNT(*);
    otherwise SUM(value_col) (NULL values count 0). ``top_k`` keeps
    each dimension's k largest absolute deltas.

    Output: ``dimension, dim_value, before_value, after_value,
    delta, share, rank`` (share NULL when the total delta is exactly
    0 — everything moved, nothing net-moved).
    """
    dims = list(dims)
    if not dims:
        raise ValueError("dims must name at least one column")
    if top_k is not None and top_k < 1:
        raise ValueError(f"top_k must be >= 1, got {top_k}")

    def tagged(df: DataFrame, tag: int) -> DataFrame:
        m = (
            F.coalesce(F.col(value_col).cast("double"), F.lit(0.0))
            if value_col is not None
            else F.lit(1.0)
        )
        pairs = F.array(
            *[
                F.struct(
                    F.lit(d).alias("dimension"),
                    F.coalesce(
                        F.col(d).cast("string"), F.lit(NULL_BUCKET)
                    ).alias("dim_value"),
                )
                for d in dims
            ]
        )
        return df.select(
            F.explode(pairs).alias("dv"),
            m.alias("__m"),
            F.lit(tag).alias("__p"),
        ).select("dv.dimension", "dv.dim_value", "__m", "__p")

    both = tagged(before, 0).unionByName(tagged(after, 1))
    per_value = both.groupBy("dimension", "dim_value").agg(
        F.sum(F.when(F.col("__p") == 0, F.col("__m")).otherwise(0.0))
        .alias("before_value"),
        F.sum(F.when(F.col("__p") == 1, F.col("__m")).otherwise(0.0))
        .alias("after_value"),
    ).withColumn("delta", F.col("after_value") - F.col("before_value"))
    # total delta is dimension-independent: compute it from ONE
    # dimension's slices (each dimension partitions the same rows)
    total = (
        per_value.where(F.col("dimension") == dims[0])
        .agg(F.sum("delta").alias("__total"))
    )
    scored = per_value.crossJoin(F.broadcast(total)).withColumn(
        "share",
        F.when(
            F.col("__total") != 0.0, F.col("delta") / F.col("__total")
        ),
    ).drop("__total")
    w = Window.partitionBy("dimension").orderBy(
        F.abs(F.col("delta")).desc(), F.col("dim_value").asc()
    )
    ranked = scored.withColumn("rank", F.row_number().over(w))
    if top_k is not None:
        ranked = ranked.where(F.col("rank") <= top_k)
    return ranked
