"""Conditional aggregation / manual pivot (SURVEY.md §2d A3/A4).

The reference pivots grouped counts into fixed columns with
``SUM(IF(TI='NTI' AND New='E' AND follow_up_status=5, total, 0))``
(Tx_Curr_OutComeList.sql:100-103,144-147,187-192,218-223). Spark's
map-side partial aggregation makes this a single shuffle regardless of
how many conditional columns are produced.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def conditional_agg(
    df: DataFrame,
    group_by: Sequence[str],
    cases: dict[str, tuple[Column, Column]],
) -> DataFrame:
    """``cases``: output_name → (condition, value). Produces
    ``SUM(CASE WHEN condition THEN value ELSE 0 END) AS output_name``
    per group (global aggregate when ``group_by`` is empty)."""
    aggs = [
        F.sum(F.when(cond, val).otherwise(F.lit(0))).alias(name)
        for name, (cond, val) in cases.items()
    ]
    if group_by:
        return df.groupBy(*group_by).agg(*aggs)
    return df.agg(*aggs)


def melt(
    df: DataFrame,
    id_cols: Sequence[str],
    value_cols: Sequence[str],
    var_name: str = "variable",
    value_name: str = "value",
    drop_nulls: bool = False,
) -> DataFrame:
    """Wide→long unpivot (pandas ``melt``): one output row per
    (input row × value column), value columns coerced to their common
    widened type by Spark's native ``unpivot`` (an Expand node — pure
    scan-side row generation, ZERO shuffle, the exact physical shape
    rollup/cube use). ``drop_nulls`` mirrors pandas' dropna: NULL
    measure cells vanish from the long form.

    The inverse of :func:`pivot_wide`; together they are the
    reshape pair every feature store / metrics table needs.
    """
    id_cols, value_cols = list(id_cols), list(value_cols)
    if not value_cols:
        raise ValueError("value_cols must name at least one column")
    overlap = set(id_cols) & set(value_cols)
    if overlap:
        raise ValueError(f"columns in both id and value sets: {overlap}")
    out = df.unpivot(
        [F.col(c) for c in id_cols],
        [F.col(c) for c in value_cols],
        var_name,
        value_name,
    )
    if drop_nulls:
        out = out.where(F.col(value_name).isNotNull())
    return out


def pivot_wide(
    df: DataFrame,
    group_by: Sequence[str],
    pivot_col: str,
    value_col: str,
    agg: str = "sum",
    max_columns: int = 1000,
) -> DataFrame:
    """Long→wide DYNAMIC pivot: the distinct pivot values become
    columns (``df.groupBy(...).pivot(...)`` with the value list
    RESOLVED FIRST — one small distinct scan — so Spark skips its own
    implicit collect and the column set is deterministic: values sort
    lexically, NULL pivot keys are dropped, and more than
    ``max_columns`` distinct values RAISES naming the count instead of
    minting a million-column schema). Aggregation is one shuffle with
    map-side combine (``conditional_agg`` physique, columns generated
    dynamically instead of hand-written).

    ``agg``: 'sum' | 'count' | 'min' | 'max' | 'avg'.
    """
    aggs = {
        "sum": F.sum, "count": F.count, "min": F.min, "max": F.max,
        "avg": F.avg,
    }
    if agg not in aggs:
        raise ValueError(f"agg must be one of {sorted(aggs)}: {agg}")
    group_by = list(group_by)
    if not group_by:
        raise ValueError("group_by must name at least one column")
    vals = [
        r[0]
        for r in df.where(F.col(pivot_col).isNotNull())
        .select(pivot_col).distinct().limit(max_columns + 1).collect()
    ]
    if len(vals) > max_columns:
        raise ValueError(
            f"pivot column {pivot_col!r} has more than "
            f"{max_columns} distinct values; a schema that wide is "
            "almost never intended — filter the pivot domain or raise "
            "max_columns"
        )
    return (
        df.groupBy(*group_by)
        .pivot(pivot_col, sorted(vals, key=str))
        .agg(aggs[agg](value_col))
    )
