"""Ordered-sequence (funnel) and cohort-retention analytics.

The event analytics a product/ops deployment runs daily on the same
events table the streaming twins consume. Both operators are shaped
for 100 TB event logs:

- ``funnel_steps`` finds, per user, the earliest strictly-increasing
  timestamp chain hitting each step in order (the standard funnel
  semantics) in ONE shuffle: group the user's events, sort in-array,
  and walk the chain with a single ``aggregate`` fold — no per-step
  join cascade (k steps as joins = k shuffles of the full log).
  Per-user state is the user's own event list, which is the bounded
  quantity in any real log (and the same bound sessionization
  already relies on).
- ``funnel_counts`` reduces that to the per-step conversion table.
- ``retention_matrix`` buckets each user by first-seen period
  (cohort) and counts distinct active users per (cohort, period
  offset) — two partial-aggregable aggregations and one join on the
  user key.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def funnel_steps(
    events: DataFrame,
    steps: Sequence[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    within: str | None = None,
) -> DataFrame:
    """Per-user funnel progress: ``(user, ts_1 .. ts_k, n_steps)``
    where ``ts_i`` is the earliest timestamp completing step ``i``
    AFTER step ``i-1``'s completion (strict event-time order; equal
    timestamps do not advance the funnel). ``within`` (an INTERVAL
    string like ``'7 days'``) additionally requires every step to
    land within that window of step 1; the chain simply stops
    advancing at the boundary.

    Earliest-chain is the standard greedy semantics and is optimal:
    taking the earliest valid completion of each step never prevents
    a later step that any other choice would have allowed.

    ONE exchange: ``groupBy(user)`` over events pre-filtered to the
    step types (scan-level ``isin`` pushdown), then an in-array sort +
    fold. No joins.
    """
    steps = list(steps)
    k = len(steps)
    if k < 1:
        raise ValueError("funnel needs at least one step")
    if len(set(steps)) != k:
        # array_position resolves a repeated name to its FIRST index,
        # so a later duplicate step could never be reached — reject
        # loudly instead of silently capping the funnel
        raise ValueError(f"duplicate step names: {steps}")
    if within is not None and not __import__("re").fullmatch(
        r"\d+\s+[A-Za-z]+", within.strip()
    ):
        # `within` is interpolated into an INTERVAL expression; accept
        # only the '<n> <unit>' shape (no expression injection)
        raise ValueError(f"within must look like '7 days': {within!r}")
    step_idx = F.array_position(
        F.array(*[F.lit(s) for s in steps]), F.col(type_col)
    )  # 1-based; 0 when not a step (filtered out anyway)

    grouped = (
        events.where(F.col(type_col).isin(steps) & F.col(ts_col).isNotNull())
        .select(
            F.col(user_col),
            F.struct(
                F.col(ts_col).alias("ts"), step_idx.cast("int").alias("s")
            ).alias("ev"),
        )
        .groupBy(user_col)
        .agg(F.array_sort(F.collect_list("ev")).alias("__evs"))
    )

    # fold state: (done: array<timestamp> of completed step times)
    # advance when the event is the NEXT step, strictly later than the
    # previous completion, and (if bounded) within `within` of step 1
    # try_element_at, not element_at: ANSI mode evaluates both sides of
    # a boolean OR, so element_at(acc, -1) on the empty seed would
    # throw even under the n == 0 guard
    def advance(acc, ev):
        n = F.size(acc)
        is_next = ev["s"] == n + 1
        after_prev = (n == 0) | (ev["ts"] > F.try_element_at(acc, F.lit(-1)))
        in_window = (
            F.lit(True)
            if within is None
            else (n == 0)
            | (ev["ts"] <= F.try_element_at(acc, F.lit(1)) + F.expr(f"INTERVAL {within}"))
        )
        return F.when(
            is_next & after_prev & in_window & (n < k),
            F.concat(acc, F.array(ev["ts"])),
        ).otherwise(acc)

    done = F.aggregate(
        F.col("__evs"),
        F.array().cast("array<timestamp>"),
        advance,
    )
    out = grouped.select(
        user_col,
        done.alias("__done"),
    ).select(
        user_col,
        *[
            F.try_element_at(F.col("__done"), F.lit(i + 1)).alias(f"ts_{i + 1}")
            for i in range(k)
        ],
        F.size("__done").alias("n_steps"),
    )
    return out


def funnel_counts(
    events: DataFrame,
    steps: Sequence[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    within: str | None = None,
) -> DataFrame:
    """The conversion table: one row per funnel step with the number
    of users whose chain reached it (monotonically non-increasing by
    construction) and the conversion rate vs step 1."""
    per_user = funnel_steps(events, steps, user_col, ts_col, type_col, within)
    k = len(list(steps))
    counts = per_user.agg(
        *[
            F.sum((F.col("n_steps") >= i + 1).cast("long")).alias(f"__c{i}")
            for i in range(k)
        ]
    )
    def q(name: str) -> str:  # step names are data-derived strings
        return "'" + name.replace("'", "''") + "'"

    stacked = counts.select(
        F.expr(
            "stack({}, {}) AS (step, step_name, n_users)".format(
                k,
                ", ".join(
                    f"{i + 1}, {q(s)}, __c{i}"
                    for i, s in enumerate(steps)
                ),
            )
        )
    )
    return stacked.withColumn(
        "conversion",
        F.round(
            F.col("n_users")
            / F.greatest(F.first("n_users").over(_w_all()), F.lit(1)),
            6,
        ),
    )


def _w_all():
    from pyspark.sql import Window

    return Window.orderBy("step").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )


def retention_matrix(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    period: str = "week",
) -> DataFrame:
    """Cohort retention: ``(cohort, period_offset, n_users)`` — users
    whose FIRST activity fell in ``cohort`` and who were active again
    ``period_offset`` periods later (offset 0 = the cohort size).
    ``period`` is any ``date_trunc`` unit (week, month, day).

    Shape: per-user first-period aggregate (partial-aggregable) +
    distinct (user, period) activity, joined on the user key, then a
    count-distinct per (cohort, offset). The join's user key is the
    natural bucketing key for an events lake, making the join
    exchange-free on a bucketed layout."""
    first = events.groupBy(user_col).agg(
        F.date_trunc(period, F.min(ts_col)).alias("__cohort")
    )
    active = events.select(
        F.col(user_col), F.date_trunc(period, F.col(ts_col)).alias("__p")
    ).distinct()
    # calendar arithmetic, never raw epoch division: under a non-UTC
    # session timezone a DST week is 604800-3600 seconds and truncating
    # division would fold week 1 into offset 0
    if period == "day":
        offset = F.datediff(F.col("__p"), F.col("__cohort")).cast("long")
    elif period == "week":
        offset = F.floor(
            F.datediff(F.col("__p"), F.col("__cohort")) / 7
        ).cast("long")
    else:  # month: calendar difference
        offset = (
            (F.year("__p") - F.year("__cohort")) * 12
            + (F.month("__p") - F.month("__cohort"))
        ).cast("long")
    return (
        active.join(first, user_col)
        .select(
            F.col("__cohort").cast("date").alias("cohort"),
            offset.alias("period_offset"),
            F.col(user_col),
        )
        .groupBy("cohort", "period_offset")
        .agg(F.count_distinct(user_col).alias("n_users"))
    )
