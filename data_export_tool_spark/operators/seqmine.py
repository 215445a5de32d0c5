"""Frequent event-sequence mining: contiguous n-grams + next-event
model.

The sequential-pattern layer over the event stream (Agrawal & Srikant
1995's GSP, restricted to CONTIGUOUS patterns — the restriction that
makes mining one window pass instead of a candidate-generation loop,
and what clickstream/"users who did A→B→C" analyses actually use):

- ``frequent_event_ngrams`` — every length-2..max_n contiguous event
  n-gram per user timeline with its support (distinct users) and
  occurrence count, min-support filtered.
- ``next_event_table`` — the conditional next-event distribution
  given the previous ``context_n`` events (the n-gram "language
  model" over actions): P(next | context), ranked — the
  what-happens-next table sessionized product analytics ask for.

Scale shape: ONE pass builds all gram lengths — per user timeline a
``lead``-window projection (max_n − 1 leads over the per-user
time-ordered window; bounded by a user's OWN event count, the
standard sessionization shape), then one map-side-combining groupBy
per gram length on the gram string. Support = distinct users per gram
via a (gram, user)-grain pre-aggregate (two-phase exact distinct — no
count_distinct shuffle of raw rows). Event names are joined with a
non-printable separator (␟, U+241F) so gram keys cannot collide on
names containing the separator char; the DuckDB oracle replays the
same join verbatim.

Ordering contract: ties on ``ts`` within a user break by the event
column ascending (deterministic grams under same-timestamp bursts —
pinned in tests).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["frequent_event_ngrams", "next_event_table"]

SEP = "␟"


def _grams(
    events: DataFrame,
    user_col: str,
    ts_col: str,
    event_col: str,
    n: int,
) -> DataFrame:
    """(user, gram) rows for EXACTLY length-n contiguous grams."""
    w = Window.partitionBy(user_col).orderBy(
        F.col(ts_col).asc(), F.col(event_col).asc()
    )
    cols = [F.col(event_col)] + [
        F.lead(event_col, i).over(w) for i in range(1, n)
    ]
    df = events.select(F.col(user_col).alias("__u"), *[c.alias(f"__e{i}") for i, c in enumerate(cols)])
    cond = F.lit(True)
    for i in range(n):
        cond = cond & F.col(f"__e{i}").isNotNull()
    return df.where(cond).select(
        "__u",
        F.concat_ws(SEP, *[F.col(f"__e{i}") for i in range(n)]).alias("__g"),
    )


def frequent_event_ngrams(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    event_col: str = "event_type",
    max_n: int = 3,
    min_support: int = 2,
) -> DataFrame:
    """``(n, gram array<string>, n_occurrences, n_users)`` for every
    contiguous gram of length 2..max_n with user-support ≥
    ``min_support``. NULL users/events excluded (no timeline / no
    token)."""
    if max_n < 2:
        raise ValueError(f"max_n must be >= 2: {max_n}")
    if min_support < 1:
        raise ValueError(f"min_support must be >= 1: {min_support}")
    base = events.where(
        F.col(user_col).isNotNull()
        & F.col(event_col).isNotNull()
        & F.col(ts_col).isNotNull()
    )
    outs = []
    for n in range(2, max_n + 1):
        g = _grams(base, user_col, ts_col, event_col, n)
        # two-phase exact user support: (gram, user) grain first (map-
        # side combined), then one bounded gram-grain rollup
        per_user = g.groupBy("__g", "__u").agg(F.count(F.lit(1)).alias("__c"))
        agg = per_user.groupBy("__g").agg(
            F.sum("__c").alias("n_occurrences"),
            F.count(F.lit(1)).alias("n_users"),
        )
        outs.append(agg.select(F.lit(n).alias("n"), "__g", "n_occurrences", "n_users"))
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return (
        out.where(F.col("n_users") >= min_support)
        .select(
            "n",
            F.split(F.col("__g"), SEP).alias("gram"),
            "n_occurrences",
            "n_users",
        )
    )


def next_event_table(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    event_col: str = "event_type",
    context_n: int = 2,
    min_count: int = 1,
) -> DataFrame:
    """``(context array<string>, next_event, n, prob, rank)`` — the
    conditional next-event distribution given the previous
    ``context_n`` events. ``prob`` normalizes within the context;
    rank 1 = most likely continuation, ties to the event name
    ascending. Contexts are alphabet^context_n-bounded, so the rank
    window partitions stay small by construction."""
    if context_n < 1:
        raise ValueError(f"context_n must be >= 1: {context_n}")
    g = _grams(
        events.where(
            F.col(user_col).isNotNull()
            & F.col(event_col).isNotNull()
            & F.col(ts_col).isNotNull()
        ),
        user_col,
        ts_col,
        event_col,
        context_n + 1,
    )
    parts = F.split(F.col("__g"), SEP)
    pairs = g.select(
        F.slice(parts, 1, context_n).alias("context"),
        F.element_at(parts, context_n + 1).alias("next_event"),
    )
    counts = pairs.groupBy("context", "next_event").agg(
        F.count(F.lit(1)).alias("n")
    )
    wc = Window.partitionBy("context")
    wr = Window.partitionBy("context").orderBy(
        F.desc("n"), F.asc("next_event")
    )
    return (
        counts.where(F.col("n") >= min_count)
        .withColumn("prob", F.round(F.col("n") / F.sum("n").over(wc), 6))
        .withColumn("rank", F.row_number().over(wr))
    )
