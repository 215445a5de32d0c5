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

__all__ = [
    "attribute_conversions",
    "markov_attribution",
    "shapley_attribution",
    "py_markov_removal",
    "py_shapley_credits",
]

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


# ---------------------------------------------------------------------------
# Data-driven attribution: Markov removal effect + Shapley value
# ---------------------------------------------------------------------------
#
# The position models above allocate credit by RULE; the two operators
# below learn it from the journey data itself (the "data-driven
# attribution" tier of every ads/growth analytics stack):
#
# * ``markov_attribution`` — first-order Markov chain over channel
#   touches with absorbing conversion/null states (Anderl et al. 2014):
#   a channel's removal effect is how much P(conversion from start)
#   drops when every visit to it is redirected to null; credit is the
#   normalized removal effect × total conversions.
# * ``shapley_attribution`` — exact Shapley value over the observed
#   coalition table (Zhao, Mahboobi & Bagheri 2018): a journey's worth
#   accrues to its DISTINCT-channel set, the characteristic function
#   v(S) = conversions of journeys whose channel set ⊆ S, and each
#   channel gets its Shapley average marginal contribution. Σ credit =
#   total attributed conversions (the efficiency axiom — pinned in
#   tests).
#
# Scale shape (both): journeys are ONE window pass per user (the
# journey id is a running conversion count — state bounded by user
# activity, the module-docstring hot-user regime), then ONE groupBy to
# journey grain, then ONE groupBy to (src,dst)-transition /
# channel-set grain. Those tables are alphabet-bounded metadata (≤ k²
# transitions / ≤ 2^k coalitions; k = |channels| enforced ≤ 50 / ≤ 14),
# and the chain solves / 2^k Shapley enumeration are driver numpy —
# the categorical_association driver-fold discipline. Raw events are
# scanned exactly once.
#
# Journey convention (the replay oracle pins it): per user, events
# sort by (ts, type); each conversion event CLOSES the journey made of
# the touches since the previous conversion (journey_id = running
# count of PRIOR conversions); trailing touches after the last
# conversion form an unconverted (null-absorbed) journey. Consecutive
# same-channel touches are KEPT as self-transitions (first-order chain
# over raw visit order; de-duplication is a caller-side recode).


def _journeys(
    events: DataFrame,
    conversion_type: str,
    touch_types: list[str],
    user_col: str,
    ts_col: str,
    type_col: str,
) -> DataFrame:
    """(user, journey_id, path array<string> in visit order,
    converted) — one window pass + one journey-grain groupBy."""
    t = F.col(type_col)
    ev = events.where(
        t.isin(list(touch_types) + [conversion_type])
    ).select(
        F.col(user_col).alias("user"),
        F.col(ts_col).alias("ts"),
        t.alias("ch"),
        (t == conversion_type).cast("int").alias("is_conv"),
    )
    w = (
        Window.partitionBy("user")
        .orderBy("ts", "ch")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    ev = ev.withColumn(
        "journey_id", F.sum("is_conv").over(w) - F.col("is_conv")
    )
    return (
        ev.groupBy("user", "journey_id")
        .agg(
            F.sort_array(
                F.collect_list(
                    F.when(
                        F.col("is_conv") == 0,
                        F.struct(F.col("ts"), F.col("ch")),
                    )
                )
            ).alias("__ordered"),
            F.max("is_conv").alias("converted"),
        )
        .select(
            "user",
            "journey_id",
            F.transform(F.col("__ordered"), lambda s: s["ch"]).alias("path"),
            F.col("converted").cast("boolean").alias("converted"),
        )
    )


def _transition_counts(journeys: DataFrame) -> list:
    """Collected (src, dst, n) rows over the journey table: start →
    first touch, touch → next touch, last touch → conv/null; empty
    paths transition start → conv/null directly."""
    start, conv, null = "__start__", "__conv__", "__null__"
    end_state = F.when(F.col("converted"), F.lit(conv)).otherwise(F.lit(null))
    # pad the path to [start, ch..., end]; transitions are adjacent
    # pairs of the padded walk (an empty path yields start → end)
    ext = F.concat(
        F.array(F.lit(start)), F.col("path"), F.array(end_state)
    )
    m = F.size(ext)
    trans = F.zip_with(
        F.slice(ext, 1, m - 1),
        F.slice(ext, 2, m - 1),
        lambda a, b: F.struct(a.alias("src"), b.alias("dst")),
    )
    return (
        journeys.select(F.explode(trans).alias("t"))
        .groupBy(F.col("t.src").alias("src"), F.col("t.dst").alias("dst"))
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )


def py_markov_removal(trans: list[tuple[str, str, int]]) -> dict:
    """Absorbing-chain conversion probability + per-channel removal
    effects from (src, dst, n) transition counts — the exact driver
    arithmetic of ``markov_attribution``, exposed for oracle replay.

    Removal semantics: removing channel c redirects every transition
    INTO c to the null state (and discards c's outgoing row), the
    Anderl et al. formulation. Returns
    ``{"p_conv": float, "removal": {channel: effect}}``."""
    import numpy as np

    start, conv, null = "__start__", "__conv__", "__null__"
    channels = sorted(
        {s for s, _, _ in trans if s not in (start,)}
        | {d for _, d, _ in trans if d not in (conv, null)}
    )

    def solve(removed: str | None) -> float:
        states = [start] + [c for c in channels if c != removed]
        idx = {s: i for i, s in enumerate(states)}
        k = len(states)
        counts = np.zeros((k, k))
        to_conv = np.zeros(k)
        out_total = np.zeros(k)
        for s, d, cnt in trans:
            if s == removed or s not in idx:
                continue
            i = idx[s]
            out_total[i] += cnt
            if d == removed or d == null:
                continue  # redirected to null: absorbed at 0
            elif d == conv:
                to_conv[i] += cnt
            elif d in idx:
                counts[i, idx[d]] += cnt
        # rows with no outgoing mass are null-absorbed (p = 0)
        with np.errstate(invalid="ignore", divide="ignore"):
            P = np.where(
                out_total[:, None] > 0, counts / out_total[:, None], 0.0
            )
            r = np.where(out_total > 0, to_conv / out_total, 0.0)
        # p = P p + r  ->  (I - P) p = r
        p = np.linalg.solve(np.eye(k) - P, r)
        return float(p[idx[start]])

    p_full = solve(None)
    removal = {}
    for c in channels:
        p_without = solve(c)
        removal[c] = (
            (p_full - p_without) / p_full if p_full > 0.0 else 0.0
        )
    return {"p_conv": p_full, "removal": removal}


def markov_attribution(
    events: DataFrame,
    conversion_type: str,
    touch_types: list[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    max_channels: int = 50,
) -> DataFrame:
    """First-order Markov data-driven attribution. Output, one row per
    channel observed in journeys: ``(channel, removal_effect, credit,
    p_conv, total_conversions)`` where credit = total_conversions ×
    removal_effect / Σ removal_effects (0-sum guard: all-zero removal
    effects yield NULL credits)."""
    j = _journeys(
        events, conversion_type, touch_types, user_col, ts_col, type_col
    )
    trans_rows = _transition_counts(j)
    trans = [(r["src"], r["dst"], int(r["n"])) for r in trans_rows]
    channels = sorted(
        {s for s, _, _ in trans if s != "__start__"}
        | {d for _, d, _ in trans if d not in ("__conv__", "__null__")}
    )
    if len(channels) > max_channels:
        raise ValueError(
            f"markov_attribution: {len(channels)} channels exceeds "
            f"max_channels={max_channels} (k+1 linear solves of k×k on "
            "the driver); recode channels upstream"
        )
    total_conv = sum(n for _, d, n in trans if d == "__conv__")
    fit = py_markov_removal(trans)
    tot_removal = sum(fit["removal"].values())
    out = []
    for c in channels:
        r = fit["removal"][c]
        credit = (
            total_conv * r / tot_removal if tot_removal > 0.0 else None
        )
        out.append((c, r, credit, fit["p_conv"], total_conv))
    schema = (
        "channel string, removal_effect double, credit double, "
        "p_conv double, total_conversions long"
    )
    return events.sparkSession.createDataFrame(out, schema)


def py_shapley_credits(coalitions: list[tuple[tuple, int]]) -> dict:
    """Exact Shapley values from (sorted channel-set tuple,
    conversions) coalition rows, with v(S) = Σ conversions of observed
    sets T ⊆ S — the driver arithmetic of ``shapley_attribution``,
    exposed for oracle replay."""
    import itertools
    import math as _m

    channels = sorted({c for s, _ in coalitions for c in s})
    k = len(channels)
    conv_by_set = {}
    for s, n in coalitions:
        if s:
            conv_by_set[frozenset(s)] = conv_by_set.get(frozenset(s), 0) + n

    def v(subset: frozenset) -> float:
        return float(
            sum(n for t, n in conv_by_set.items() if t <= subset)
        )

    credits = {c: 0.0 for c in channels}
    for c in channels:
        others = [x for x in channels if x != c]
        for r in range(len(others) + 1):
            w = (
                _m.factorial(r)
                * _m.factorial(k - r - 1)
                / _m.factorial(k)
            )
            for combo in itertools.combinations(others, r):
                s = frozenset(combo)
                credits[c] += w * (v(s | {c}) - v(s))
    return credits


def shapley_attribution(
    events: DataFrame,
    conversion_type: str,
    touch_types: list[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    max_channels: int = 14,
) -> DataFrame:
    """Exact-Shapley data-driven attribution over the observed
    coalition table. Output: ``(channel, credit)`` with Σ credit =
    conversions of journeys that had ≥1 touch (efficiency axiom).
    Unconverted journeys shape nothing (v counts conversions);
    touchless conversions are excluded from the attributable total —
    count them upstream via ``attribute_conversions``'s NULL rows."""
    j = _journeys(
        events, conversion_type, touch_types, user_col, ts_col, type_col
    )
    coal_rows = (
        j.where(F.col("converted"))
        .select(
            F.array_sort(F.array_distinct(F.col("path"))).alias("chset")
        )
        .groupBy("chset")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    coalitions = [(tuple(r["chset"]), int(r["n"])) for r in coal_rows]
    channels = sorted({c for s, _ in coalitions for c in s})
    if len(channels) > max_channels:
        raise ValueError(
            f"shapley_attribution: {len(channels)} channels exceeds "
            f"max_channels={max_channels} (2^k driver enumeration); "
            "recode channels upstream"
        )
    credits = py_shapley_credits(coalitions)
    return events.sparkSession.createDataFrame(
        sorted(credits.items()), "channel string, credit double"
    )
