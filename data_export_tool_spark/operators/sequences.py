"""Event-sequence analytics: user-journey transition matrices.

The "what do users do next" question every event lake gets asked:
for each ordered pair of event types, how often does one immediately
follow the other within a user's timeline, and with what probability.
The per-row Markov-chain view of the same sorted-per-user stream the
funnel fold consumes.

Scale shape — ONE exchange of the step-typed events, O(A²) state:
events are hash-partitioned by user and sorted within partitions by
(user, ts, tiebreak) — a user's timeline is one contiguous run — and a
``mapInPandas`` pass extracts consecutive pairs with ONE shifted
vector compare per Arrow batch, carrying only the last (user, type)
across batch boundaries. Each partition emits its PARTIAL pair counts
(bounded by A² rows, A = distinct event types — never by event count),
so the final global aggregation shuffles a few hundred rows no matter
how many trillion events were scanned. A 10⁸-event bot account streams
through batch by batch like any other user.

The naive alternatives both fail at scale: ``LAG`` over a per-user
window puts a hot user on one task, and self-joining the log on
(user, rank) shuffles the full log twice.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StructField, StructType

__all__ = ["transition_counts", "session_paths"]


def transition_counts(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    tiebreak: str | None = "event_id",
) -> DataFrame:
    """Count immediate ``prev_event → next_event`` transitions across
    all user timelines. Output: ``(prev_event, next_event,
    n_transitions, probability)`` where ``probability`` row-normalizes
    by ``prev_event`` (each row of the Markov transition matrix sums
    to 1 over the observed successors).

    Ordering is (``ts_col``, ``tiebreak``) per user — pass a unique
    ``tiebreak`` column (default ``event_id``) so equal-timestamp
    events order deterministically and an external oracle can replay
    the exact pair set. Rows with a NULL user, timestamp, or type are
    excluded up front (a transition needs an owner and an order), so
    integral user keys stay int64 through Arrow — no NaN float
    round-trip.
    """
    cols = [F.col(user_col), F.col(ts_col).alias("__ts"),
            F.col(type_col).alias("__e")]
    if tiebreak is not None:
        cols.append(F.col(tiebreak).alias("__tb"))
    pre = events.where(
        F.col(user_col).isNotNull()
        & F.col(ts_col).isNotNull()
        & F.col(type_col).isNotNull()
    ).select(*cols)
    sort_cols = [user_col, "__ts"] + (["__tb"] if tiebreak is not None else [])
    part = pre.repartition(F.col(user_col)).sortWithinPartitions(*sort_cols)

    out_schema = StructType(
        [
            StructField("prev_event", pre.schema["__e"].dataType, False),
            StructField("next_event", pre.schema["__e"].dataType, False),
            StructField("cnt", LongType(), False),
        ]
    )

    def fold(batches):
        import pandas as pd

        counts: dict[tuple, int] = {}
        last_user = None
        last_type = None
        have = False
        for pdf in batches:
            n = len(pdf)
            if n == 0:
                continue
            users = pdf[user_col].values
            types = pdf["__e"].values
            if have and users[0] == last_user:
                key = (last_type, types[0])
                counts[key] = counts.get(key, 0) + 1
            if n > 1:
                same = users[1:] == users[:-1]
                prevs = types[:-1][same]
                nxts = types[1:][same]
                if len(prevs):
                    vc = (
                        pd.DataFrame({"p": prevs, "n": nxts})
                        .groupby(["p", "n"], sort=False)
                        .size()
                    )
                    for (p, x), c in vc.items():
                        key = (p, x)
                        counts[key] = counts.get(key, 0) + int(c)
            last_user, last_type, have = users[-1], types[-1], True
        if counts:
            yield pd.DataFrame(
                {
                    "prev_event": [k[0] for k in counts],
                    "next_event": [k[1] for k in counts],
                    "cnt": pd.Series(list(counts.values()), dtype="int64"),
                }
            )

    partials = part.mapInPandas(fold, out_schema)
    totals = partials.groupBy("prev_event", "next_event").agg(
        F.sum("cnt").alias("n_transitions")
    )
    # Row-normalize with a window over the TOTALS frame, not a
    # self-join: an aggregate + join-back would recompute the whole
    # scan+fold subtree (Spark doesn't share it without an explicit
    # cache), doubling the 100 TB read. The window partition here is
    # a prev_event's successor list — bounded by the event-type
    # alphabet A, never by event count — so the usual hot-key window
    # objection doesn't apply.
    from pyspark.sql import Window

    row_total = F.sum("n_transitions").over(
        Window.partitionBy("prev_event")
    )
    return totals.select(
        "prev_event",
        "next_event",
        "n_transitions",
        F.round(F.col("n_transitions") / row_total, 6).alias("probability"),
    )


def session_paths(
    events: DataFrame,
    gap_seconds: int = 1800,
    max_steps: int = 5,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    tiebreak: str | None = "event_id",
    max_partial_paths: int = 100_000,
) -> DataFrame:
    """Top-of-session user flows: split each user's timeline into
    gap-based sessions (a new session when the inter-event gap
    EXCEEDS ``gap_seconds`` — the e03 convention) and count how many
    sessions open with each distinct path of up to ``max_steps``
    event types (longer sessions contribute their prefix). Output:
    ``(path, n_steps, n_sessions)`` with ``path`` the '>'-joined type
    sequence — the input to every "user flow" sankey.

    Same fold shape as ``transition_counts``: one hash exchange +
    within-partition (user, ts, tiebreak) sort + a streamed
    ``mapInPandas`` carry-state pass (state = current session's ≤
    ``max_steps`` prefix + last timestamp). Partials are per-partition
    path counts; observed-prefix cardinality is data-bounded, and the
    ``max_partial_paths`` flush cap bounds worker memory regardless
    (flushed partial counts re-aggregate correctly downstream). NULL
    user/ts/type rows are excluded, as in ``transition_counts``.
    """
    if max_steps < 1:
        raise ValueError(f"max_steps must be >= 1: {max_steps}")
    cols = [F.col(user_col), F.col(ts_col).cast("timestamp").alias("__ts"),
            F.col(type_col).alias("__e")]
    if tiebreak is not None:
        cols.append(F.col(tiebreak).alias("__tb"))
    pre = events.where(
        F.col(user_col).isNotNull()
        & F.col(ts_col).isNotNull()
        & F.col(type_col).isNotNull()
    ).select(*cols)
    sort_cols = [user_col, "__ts"] + (["__tb"] if tiebreak is not None else [])
    part = pre.repartition(F.col(user_col)).sortWithinPartitions(*sort_cols)

    out_schema = StructType(
        [
            StructField("path", pre.schema["__e"].dataType, False),
            StructField("n_steps", LongType(), False),
            StructField("cnt", LongType(), False),
        ]
    )
    gap_us = int(gap_seconds) * 1_000_000

    def fold(batches):
        import pandas as pd

        counts: dict[tuple, int] = {}
        cur_user = None
        cur_path: list = []
        last_us = None
        have = False

        def close():
            if have and cur_path:
                key = tuple(cur_path)
                counts[key] = counts.get(key, 0) + 1

        def drain():
            out = pd.DataFrame(
                {
                    "path": [">".join(k) for k in counts],
                    "n_steps": pd.Series(
                        [len(k) for k in counts], dtype="int64"
                    ),
                    "cnt": pd.Series(list(counts.values()), dtype="int64"),
                }
            )
            counts.clear()
            return out

        for pdf in batches:
            if len(pdf) == 0:
                continue
            users = pdf[user_col].values
            types = pdf["__e"].values
            ts_us = (
                pd.to_datetime(pdf["__ts"])
                .astype("datetime64[ns]")
                .astype("int64")
                // 1_000
            ).values
            for u, ty, t in zip(users, types, ts_us):
                new_user = not have or u != cur_user
                new_session = new_user or (t - last_us) > gap_us
                if new_session:
                    close()
                    cur_path = []
                cur_user, last_us, have = u, int(t), True
                if len(cur_path) < max_steps:
                    cur_path.append(ty)
            if len(counts) >= max_partial_paths:
                yield drain()
        close()
        if counts:
            yield drain()

    partials = part.mapInPandas(fold, out_schema)
    return partials.groupBy("path", "n_steps").agg(
        F.sum("cnt").alias("n_sessions")
    )
