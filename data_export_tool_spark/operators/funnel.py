"""Ordered-sequence (funnel) and cohort-retention analytics.

The event analytics a product/ops deployment runs daily on the same
events table the streaming twins consume. Both operators are shaped
for 100 TB event logs:

- ``funnel_steps`` finds, per user, the earliest strictly-increasing
  timestamp chain hitting each step in order (the standard funnel
  semantics) in ONE shuffle: hash-repartition the step-typed events
  by user, sort within partitions by (user, ts), and STREAM a
  carry-state fold over the Arrow batches (``mapInPandas``). Per-user
  state is at most k completion timestamps — a bot account with 10⁸
  events flows through the fold batch by batch and never materializes
  as one value (the earlier ``collect_list`` form put a hot user's
  whole event array on a single task; same failure class as a window
  over a mega-duplicate fingerprint). No per-step join cascade
  (k steps as joins = k shuffles of the full log).
- ``funnel_counts`` reduces that to the per-step conversion table.
- ``retention_matrix`` buckets each user by first-seen period
  (cohort) and counts distinct active users per (cohort, period
  offset) — two partial-aggregable aggregations and one join on the
  user key.
"""

from __future__ import annotations

import re
from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import IntegerType, StructField, StructType

#: INTERVAL units accepted by ``within`` — both the SQL interval
#: grammar and pandas DateOffset understand these, so the window
#: arithmetic is identical wherever it is evaluated
_WITHIN_UNITS = {
    "year", "month", "week", "day", "hour", "minute", "second",
    "millisecond", "microsecond",
}


def _parse_within(within: str):
    """'<n> <unit>' → pandas DateOffset. Raises on anything else —
    the value reaches date arithmetic, so accept only the strict
    shape (no expression injection, no silently-ignored units)."""
    m = re.fullmatch(r"(\d+)\s+([A-Za-z]+)", within.strip())
    if not m:
        raise ValueError(f"within must look like '7 days': {within!r}")
    n, unit = int(m.group(1)), m.group(2).lower().rstrip("s")
    if unit not in _WITHIN_UNITS:
        raise ValueError(f"unsupported within unit {unit!r}: {within!r}")
    import pandas as pd

    return pd.DateOffset(**{unit + "s": n})


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
    a later step that any other choice would have allowed. The chain
    is UNIQUE per user, so the streamed fold below computes exactly
    what a per-user sorted in-memory walk would.

    Scale shape — ONE exchange, O(k) state: events pre-filtered to
    the step types (scan-level ``isin`` pushdown) are hash-partitioned
    by user and sorted within partitions by (user, ts, step); a
    ``mapInPandas`` fold then streams the partition's Arrow batches,
    carrying (user, completed-step timestamps) across batch
    boundaries. A user's events are contiguous in the sorted
    partition, so per-user state is never more than k timestamps and
    a 10⁸-event hot user costs linear streaming, not one giant
    in-memory array. Within a batch the fold is vectorized: user
    segment boundaries come from one shifted comparison, and each
    chain advance is a ``searchsorted`` on the segment's step-typed
    timestamps — Python work is O(users · k · log batch), not
    O(events).
    """
    steps = list(steps)
    k = len(steps)
    if k < 1:
        raise ValueError("funnel needs at least one step")
    if len(set(steps)) != k:
        # a repeated name resolves to its FIRST index, so a later
        # duplicate step could never be reached — reject loudly
        # instead of silently capping the funnel
        raise ValueError(f"duplicate step names: {steps}")
    offset = _parse_within(within) if within is not None else None
    step_idx = F.array_position(
        F.array(*[F.lit(s) for s in steps]), F.col(type_col)
    )  # 1-based; 0 when not a step (filtered out anyway)

    pre = events.where(
        F.col(type_col).isin(steps) & F.col(ts_col).isNotNull()
    ).select(
        F.col(user_col),
        F.col(ts_col).alias("__ts"),
        step_idx.cast("int").alias("__s"),
    )
    # the one exchange; secondary sort makes each user's events one
    # contiguous ts-ordered run (ties additionally by step index so
    # the scan order is fully deterministic — outcome-neutral either
    # way, since equal timestamps never advance the chain)
    part = pre.repartition(F.col(user_col)).sortWithinPartitions(
        user_col, "__ts", "__s"
    )

    ts_type = pre.schema["__ts"].dataType
    out_schema = StructType(
        [pre.schema[user_col]]
        + [StructField(f"ts_{i + 1}", ts_type, True) for i in range(k)]
        + [StructField("n_steps", IntegerType(), False)]
    )
    # Arrow hands a nullable integral user column to pandas as float64
    # (NaN = NULL); the fold's keys must be normalized back before they
    # re-enter the declared integral output schema, or the NaN either
    # raises on conversion or corrupts under unsafe cast. Caveat
    # (inherent to the Arrow float path, documented contract): integral
    # ids >= 2^53 in a column that also contains NULLs lose precision
    # in that float round-trip — pre-filter NULL users to keep the
    # column int64 end-to-end if ids that large are possible.
    key_integral = pre.schema[user_col].dataType.typeName() in {
        "byte", "short", "integer", "long",
    }

    def fold(batches):
        import numpy as np
        import pandas as pd

        have = False  # an open user carried across batches
        cur = None  # its key
        done: list = []  # its completed step times (≤ k)
        stopped = False  # chain can never advance again (window)
        win_end = None

        out_users: list = []
        out_done: list = []

        def flush():
            out_users.append(cur)
            out_done.append(list(done))

        def emit():
            keys = [
                None
                if pd.isna(u)
                else (
                    int(u)
                    if key_integral and isinstance(u, (float, np.floating))
                    else u
                )
                for u in out_users
            ]
            data = {user_col: pd.Series(keys, dtype="object")}
            for i in range(k):
                data[f"ts_{i + 1}"] = pd.to_datetime(
                    pd.Series(
                        [d[i] if len(d) > i else None for d in out_done],
                        dtype="object",
                    )
                )
            data["n_steps"] = pd.Series(
                [len(d) for d in out_done], dtype="int32"
            )
            return pd.DataFrame(data)

        for pdf in batches:
            if len(pdf) == 0:
                continue
            users = pdf[user_col].values
            ts = pdf["__ts"].values
            ss = pdf["__s"].values
            change = np.empty(len(users), dtype=bool)
            change[0] = True
            if len(users) > 1:
                eq = users[1:] == users[:-1]
                # NaN-safe: a NULL-user run must stay ONE segment
                both_na = pd.isna(users[1:]) & pd.isna(users[:-1])
                change[1:] = ~(eq | both_na)
            starts = np.flatnonzero(change)
            ends = np.append(starts[1:], len(users))
            for st, en in zip(starts, ends):
                u = users[st]
                same = have and (
                    (not pd.isna(u) and not pd.isna(cur) and u == cur)
                    or (pd.isna(u) and pd.isna(cur))
                )
                if not same:
                    if have:
                        flush()
                    cur, done, stopped, win_end = u, [], False, None
                    have = True
                if stopped or len(done) >= k:
                    continue
                seg_ts, seg_s = ts[st:en], ss[st:en]
                while len(done) < k:
                    cand = seg_ts[seg_s == len(done) + 1]
                    if len(done) == 0:
                        pos = 0
                    else:
                        # strictly later than the previous completion
                        pos = np.searchsorted(cand, done[-1], side="right")
                    if pos >= len(cand):
                        break  # next step may still arrive in a later batch
                    t = cand[pos]
                    if win_end is not None and pd.Timestamp(t) > win_end:
                        # every later candidate is larger still — the
                        # chain can never advance again
                        stopped = True
                        break
                    done.append(t)
                    if offset is not None and len(done) == 1:
                        win_end = pd.Timestamp(done[0]) + offset
            if out_users:
                yield emit()
                out_users, out_done = [], []
        if have:
            flush()
        if out_users:
            yield emit()

    return part.mapInPandas(fold, out_schema).select(
        user_col, *[f"ts_{i + 1}" for i in range(k)], "n_steps"
    )


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


def py_funnel_excluding(
    events: list[tuple], steps: Sequence[str], exclude: Sequence[str]
) -> tuple:
    """Reference fold for one user's ``(ts, type)`` events (any
    order): returns ``(steps_reached, convert_ts)`` under the
    latest-anchor DP the operator distributes."""
    order = {s: i for i, s in enumerate(steps)}
    excl = set(exclude)
    k = len(steps)
    latest = [None] * k  # latest valid i+1-chain completion time
    last_excl = None
    convert_ts = None
    reached = 0
    for ts, et in sorted(events):
        if et in excl:
            last_excl = ts
        if et not in order:
            continue
        i = order[et]
        ok_anchor = (
            i == 0
            or (
                latest[i - 1] is not None
                and latest[i - 1] < ts
                and (last_excl is None or last_excl <= latest[i - 1])
            )
        )
        if ok_anchor:
            latest[i] = ts
            reached = max(reached, i + 1)
            if i == k - 1 and convert_ts is None:
                convert_ts = ts
    return reached, convert_ts


def funnel_excluding(
    events: DataFrame,
    steps: Sequence[str],
    exclude: Sequence[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Funnel with EXCLUSION constraints: a user converts when some
    chain ``step₁ < … < stepₖ`` exists with NO excluded event
    strictly between consecutive completions — "viewed then purchased
    WITHOUT a support ticket in between", the negative-pattern ask
    plain funnels cannot express.

    Greedy earliest-chain is NOT valid here (an exclusion can kill
    the early anchor while a later re-completion survives), so the
    fold is the latest-anchor DP: scanning a user's events in time
    order, keep the LATEST valid completion time of each prefix
    length — a later anchor strictly shrinks the exclusion window
    ((s′,t) ⊂ (s,t) for s′ > s), so if any anchor admits an advance
    the latest one does; an i→i+1 advance at time t is valid iff the
    last excluded event is at-or-before the level-i anchor. The
    first time the full chain completes is the conversion instant.
    O(k) state per user, one pass.

    Scale shape: the ``funnel_steps`` chassis — events filtered to
    step+excluded types (scan-level isin pushdown), ONE exchange
    hash-partitioning by user with an in-partition (user, ts) sort,
    and a ``mapInPandas`` fold streaming Arrow batches with per-user
    carry state across batch boundaries. The DP itself is a python
    loop per retained event — the retained set is already filtered
    to the funnel vocabulary (typically a small fraction of the
    stream), and the state dependence is inherently sequential (the
    documented why-not-vectorized).

    Output: ``(user, steps_reached, converted, convert_ts)``.
    Oracle: :func:`py_funnel_excluding` replay
    (tests/test_funnel_excluding.py → OPCHECK ``funnel_excluding``).
    """
    import pandas as pd

    steps = list(steps)
    exclude = list(exclude)
    k = len(steps)
    if k < 2:
        raise ValueError("funnel_excluding needs at least two steps")
    if len(set(steps)) != k:
        raise ValueError(f"duplicate steps: {steps}")
    if set(steps) & set(exclude):
        raise ValueError(
            f"steps and exclude overlap: {set(steps) & set(exclude)}"
        )
    if not exclude:
        raise ValueError(
            "exclude must name at least one event type "
            "(use funnel_steps for the unconstrained funnel)"
        )
    order = {s: i for i, s in enumerate(steps)}
    excl = set(exclude)
    vocab = steps + exclude

    base = (
        events.where(
            F.col(user_col).isNotNull()
            & F.col(ts_col).isNotNull()
            & F.col(type_col).isin(vocab)
        )
        .select(
            F.col(user_col).alias("__u"),
            F.col(ts_col).alias("__ts"),
            F.col(type_col).alias("__et"),
        )
        .repartition("__u")
        .sortWithinPartitions("__u", "__ts", "__et")
    )

    out_schema = (
        f"{user_col} {dict(events.dtypes)[user_col]}, "
        "steps_reached int, converted boolean, convert_ts timestamp"
    )

    def fold(batches):
        cur = None  # (user, latest[k] list, last_excl, convert, reached)

        def finish(state):
            u, latest, last_excl, convert_ts, reached = state
            return {
                "u": u,
                "steps_reached": reached,
                "converted": convert_ts is not None,
                "convert_ts": convert_ts,
            }

        done = []
        for pdf in batches:
            for u, ts, et in zip(pdf["__u"], pdf["__ts"], pdf["__et"]):
                if cur is None or cur[0] != u:
                    if cur is not None:
                        done.append(finish(cur))
                    cur = [u, [None] * k, None, None, 0]
                latest = cur[1]
                if et in excl:
                    cur[2] = ts
                if et in order:
                    i = order[et]
                    ok = i == 0 or (
                        latest[i - 1] is not None
                        and latest[i - 1] < ts
                        and (cur[2] is None or cur[2] <= latest[i - 1])
                    )
                    if ok:
                        latest[i] = ts
                        cur[4] = max(cur[4], i + 1)
                        if i == k - 1 and cur[3] is None:
                            cur[3] = ts
            if done:
                yield pd.DataFrame(done).rename(columns={"u": user_col})
                done = []
        if cur is not None:
            yield pd.DataFrame([finish(cur)]).rename(
                columns={"u": user_col}
            )

    return base.mapInPandas(fold, out_schema)
