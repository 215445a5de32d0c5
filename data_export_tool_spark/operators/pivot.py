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
