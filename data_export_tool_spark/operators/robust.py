"""Per-key robust outlier detection (median / MAD).

Mean/stddev outlier rules break on the data they are meant to catch —
one corrupt 1e308 row moves the mean past every legitimate value, and
heavy-tailed metrics (latency, price, token counts) flag their own
tail forever. The robust estimator pair is the per-key MEDIAN and the
MAD (median absolute deviation), with the Iglewicz–Hoaglin modified
z-score ``0.6745 · (x − median) / MAD`` thresholded at ~3.5 — the
standard screening recommendation (Iglewicz & Hoaglin 1993, "How to
Detect and Handle Outliers").

Scale shape: two EXACT per-key aggregations (median, then MAD over
deviations — exact ``percentile`` inside each key group, matching
DuckDB's ``quantile_cont``) joined back onto the rows. Two key-grain
shuffles + two joins, no windows, no driver collection; per-group
state is the group's values only during its own aggregate (the
calendar-bounded/groups-fit argument does NOT apply — exact
percentile sorts within the aggregate — so groups are assumed
executor-sized; use ``approx`` for web-scale key grain).

``mad = 0`` (over half the group shares one value) is answered
honestly: ``robust_z`` is NULL and a row is flagged iff it differs
from the median — the limit behavior of the ratio, not a silent
divide-by-zero pass.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from data_export_tool_spark.operators.sketch import exact_quantiles


def mad_outliers(
    df: DataFrame,
    value_col: str,
    by: Sequence[str] = (),
    k: float = 3.5,
    approx: bool = False,
    relative_error: float = 0.0001,
) -> DataFrame:
    """All input columns plus ``(group_median, group_mad, robust_z,
    is_outlier)``. NULL values pass through unflagged
    (``is_outlier`` NULL). ``approx`` swaps both exact percentiles for
    the GK sketch (``percentile_approx``) — the web-scale key-grain
    path, trading exactness inside pathological groups for bounded
    memory."""
    if isinstance(by, str):
        by = [by]
    by = list(by)
    if not k > 0:
        raise ValueError(f"k must be > 0: {k}")
    x = F.col(value_col).cast("double")

    def med_of(col_sql: str):
        if approx:
            return F.expr(
                f"percentile_approx({col_sql}, 0.5,"
                f" {max(1, int(1.0 / relative_error))})"
            )
        return exact_quantiles(col_sql, [0.5]).getItem(0)

    grp = df.where(x.isNotNull()).groupBy(*by).agg(
        med_of(f"CAST({value_col} AS DOUBLE)").alias("group_median")
    )
    with_med = df.join(grp, on=by) if by else df.crossJoin(F.broadcast(grp))
    dev = with_med.where(x.isNotNull()).select(
        *by, F.abs(x - F.col("group_median")).alias("__adev")
    )
    mad = dev.groupBy(*by).agg(med_of("__adev").alias("group_mad"))
    out = with_med.join(mad, on=by) if by else with_med.crossJoin(
        F.broadcast(mad)
    )
    z = F.lit(0.6745) * (x - F.col("group_median")) / F.col("group_mad")
    return out.select(
        "*",
        F.when(
            x.isNotNull() & (F.col("group_mad") > 0), F.round(z, 6)
        ).alias("robust_z"),
        F.when(x.isNull(), F.lit(None).cast("boolean"))
        .when(F.col("group_mad") > 0, F.abs(z) > k)
        .otherwise(x != F.col("group_median"))
        .alias("is_outlier"),
    )
