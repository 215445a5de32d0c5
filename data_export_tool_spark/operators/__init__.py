"""Reusable dataflow operators (SURVEY.md §2c/§2e + extended surface)."""

from data_export_tool_spark.operators.window_dedup import (  # noqa: F401
    earliest_per_key,
    latest_per_key,
    ranked,
)
from data_export_tool_spark.operators.asof import asof_join, range_join  # noqa: F401
from data_export_tool_spark.operators.pivot import conditional_agg  # noqa: F401
