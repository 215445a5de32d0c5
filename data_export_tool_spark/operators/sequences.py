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

__all__ = ["transition_counts"]


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
