"""Multi-touch conversion attribution over event streams.

"Which touches get credit for this purchase" is the classic
event-analytics question downstream of the funnel/retention tier
(``operators/funnel.py``): for every conversion event, find the
qualifying touch events in the preceding lookback window and allocate
credit by a position model.

Shape: conversions and touches are two filters of the same scan; the
candidate frame is the per-user equi+range join
(:func:`asof.range_join` shape — sort-merge on the user key, range as
the join filter, never a cross join), and weighting is one window over
the (user, conversion-ts) partition of that frame — partition size is
touches-per-conversion (lookback-bounded), not per-user history, so a
long-lived user costs no more than their per-window activity. A bot
user with T touches and C conversions in one window still yields T×C
candidates — the same documented hot-entity regime as the dedup tiers
(triage with ``skew.key_skew_report``, cap with upstream filters).

Models (``weight`` sums to 1 per attributed conversion):

- ``last`` / ``first``: all credit to the latest/earliest touch.
- ``linear``: equal split across the k touches.
- ``position``: 40% first, 40% last, the middle k−2 split 20%
  evenly (the standard U-shape; k=1 → 1.0, k=2 → 0.5/0.5).

Ties on touch timestamp order by (ts, touch type); rows still tied
after that are IDENTICAL in every output column, so the result is
deterministic as a multiset even though row_number picks among them
arbitrarily (no synthetic id column — monotonically_increasing_id
changes across retries and blocks predicate movement, the asof.py:16
rule). Conversions are DISTINCT (user, ts) pairs —
duplicate conversion events collapse; conversions with no qualifying
touch are kept with NULL touch columns and weight NULL so the caller
can count unattributed conversions (the tests pin this accounting).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["attribute_conversions"]

_MODELS = ("last", "first", "linear", "position")


def attribute_conversions(
    events: DataFrame,
    conversion_type: str,
    touch_types: list[str],
    model: str = "last",
    lookback: str = "7 days",
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """One row per (conversion, credited touch): ``(user, conv_ts,
    touch_ts, touch_type, lag_sec, n_touches, weight)``. A touch
    qualifies when ``conv_ts − lookback < touch_ts <= conv_ts``
    (a same-timestamp touch counts; one strictly after never does).
    """
    if model not in _MODELS:
        raise ValueError(f"model must be one of {_MODELS}: {model!r}")
    if not touch_types:
        raise ValueError("touch_types must be non-empty")
    if conversion_type in touch_types:
        raise ValueError(
            "conversion_type cannot also be a touch type (a conversion"
            " would credit itself)"
        )
    iv = F.expr(f"INTERVAL {lookback}")
    conv = (
        events.where(F.col(type_col) == conversion_type)
        .select(
            F.col(user_col).alias("user"),
            F.col(ts_col).alias("conv_ts"),
        )
        .distinct()
    )
    touch = events.where(F.col(type_col).isin(touch_types)).select(
        F.col(user_col).alias("user"),
        F.col(ts_col).alias("touch_ts"),
        F.col(type_col).alias("touch_type"),
    )
    cand = conv.join(
        touch,
        on=(
            (conv["user"] == touch["user"])
            & (touch["touch_ts"] <= conv["conv_ts"])
            & (touch["touch_ts"] > conv["conv_ts"] - iv)
        ),
        how="left",
    ).drop(touch["user"])

    w = Window.partitionBy("user", "conv_ts")
    order_asc = [F.col("touch_ts"), F.col("touch_type")]
    rn = F.row_number().over(w.orderBy(*order_asc))
    rn_desc = F.row_number().over(w.orderBy(*[c.desc() for c in order_asc]))
    k = F.count("touch_ts").over(w)

    if model == "last":
        weight = F.when(rn_desc == 1, F.lit(1.0))
    elif model == "first":
        weight = F.when(rn == 1, F.lit(1.0))
    elif model == "linear":
        weight = F.lit(1.0) / k
    else:  # position (U-shape)
        weight = (
            F.when(k == 1, F.lit(1.0))
            .when(k == 2, F.lit(0.5))
            .when(rn == 1, F.lit(0.4))
            .when(rn_desc == 1, F.lit(0.4))
            .otherwise(F.lit(0.2) / (k - 2))
        )
    out = cand.withColumn(
        "weight", F.when(F.col("touch_ts").isNotNull(), weight)
    ).withColumn("n_touches", F.when(F.col("touch_ts").isNotNull(), k))
    out = out.where(
        F.col("weight").isNotNull() | F.col("touch_ts").isNull()
    ).select(
        "user",
        "conv_ts",
        "touch_ts",
        "touch_type",
        (
            F.col("conv_ts").cast("double") - F.col("touch_ts").cast("double")
        ).alias("lag_sec"),
        "n_touches",
        "weight",
    )
    return out
