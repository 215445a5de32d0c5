"""Point-in-time (feature-store) joins: leakage-safe training assembly.

Assembling training rows from a label frame plus N historical feature
tables has one hard correctness rule: every feature must be the value
that was KNOWN at the label's timestamp — joining "current" features
leaks the future into training (the train-serve skew bug). The
feature-store industry calls this the point-in-time join; in SQL it is
one correlated ``ORDER BY ts DESC LIMIT 1`` subquery per feature table,
which is exactly the shape :func:`asof.asof_join` already distributes
(per-key backward as-of via partial-aggregable struct MAX — no window,
no correlated subquery).

This operator is the N-table assembly: each feature table's columns
land prefixed ``<name>__`` (so same-named features from different
tables never collide), each carries its matched snapshot time
``<name>__<feature_time>``, and an optional ``max_staleness`` NULLS
OUT features whose matched snapshot is older than the label time minus
the horizon — a stale feature is a missing feature, not a droppable
row (the label row always survives; the tests pin that accounting).

Scale shape: one as-of join per feature table — k tables = k
key-partitioned joins, each independently skew-diagnosable with
``skew.key_skew_report``; nothing is collected and no table needs to
fit anywhere. Labels with no at-or-before snapshot keep NULL features
(cold-start entities).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from data_export_tool_spark.operators.asof import asof_join

__all__ = ["point_in_time_join"]


def point_in_time_join(
    labels: DataFrame,
    feature_tables: dict[str, DataFrame],
    on: str | Sequence[str],
    label_time: str = "ts",
    feature_time: str = "ts",
    max_staleness: str | None = None,
) -> DataFrame:
    """Attach, for every label row and every named feature table, the
    feature row as of ``label_time`` (latest ``feature_time`` at or
    before it, per ``on`` key). ``max_staleness`` (an SQL interval
    string, e.g. ``"30 days"``) turns too-old matches into NULLs.
    """
    if not feature_tables:
        raise ValueError("feature_tables must be non-empty")
    keys = [on] if isinstance(on, str) else list(on)
    out = labels
    for name, feats in feature_tables.items():
        if not name or "__" in name:
            raise ValueError(
                f"feature table name must be non-empty without '__': {name!r}"
            )
        bad = set(keys) - set(feats.columns)
        if bad:
            raise ValueError(f"feature table {name!r} lacks key cols {bad}")
        prefixed = feats
        for c in feats.columns:
            if c not in keys:
                prefixed = prefixed.withColumnRenamed(c, f"{name}__{c}")
        ft = f"{name}__{feature_time}"
        out = asof_join(
            out,
            prefixed,
            on=keys,
            left_time=label_time,
            right_time=ft,
            how="left",
            direction="backward",
        )
        if max_staleness is not None:
            fresh = F.col(ft) >= (
                F.col(label_time) - F.expr(f"INTERVAL {max_staleness}")
            )
            for c in prefixed.columns:
                if c in keys or c == ft:
                    continue
                out = out.withColumn(c, F.when(fresh, F.col(c)))
            # the snapshot-time audit column goes NULL last
            out = out.withColumn(ft, F.when(fresh, F.col(ft)))
    return out


def decayed_counters(
    events: DataFrame,
    as_of,
    keys: "Sequence[str] | str" = "user_id",
    ts_col: str = "ts",
    half_lives: "Sequence[str]" = ("1 day", "7 days", "30 days"),
    value_col: str | None = None,
) -> DataFrame:
    """Exponential-half-life activity counters per entity — the
    feature-store primitive between a raw count (forgets nothing) and
    a window count (forgets everything outside the box): each event
    contributes ``2^(−age/half_life)`` at the ``as_of`` instant, so
    the counter is a recency-weighted volume with smooth decay
    (RFM-style engagement, fraud velocity, channel fatigue).

    One partial-aggregable groupBy over the keys: the weight is pure
    column arithmetic per row and SUMS are map-side combined —
    identical shape to a plain count, no window, no skew cliff (a bot
    user's million rows collapse in the combiner). Future rows
    (ts > as_of) are excluded by contract — a feature computed "as of
    T" must not see the future (the ``point_in_time_join`` law,
    applied to aggregates). Emits one ``cnt_<hl>`` (and with
    ``value_col`` one ``sum_<hl>``) column per half-life, plus the raw
    ``n_events``.
    """
    ks = [keys] if isinstance(keys, str) else list(keys)
    if not half_lives:
        raise ValueError("half_lives must name at least one interval")
    as_of_ts = F.lit(as_of).cast("timestamp")
    # NTZ-tolerant by repo policy (TESTDATA annotations drift): all
    # timestamp arithmetic goes through one explicit cast
    ev_ts = F.col(ts_col).cast("timestamp")
    base = events.where(F.col(ts_col).isNotNull() & (ev_ts <= as_of_ts))
    age_s = (F.unix_millis(as_of_ts) - F.unix_millis(ev_ts)) / 1000.0

    def _secs(interval: str) -> float:
        qty, unit = interval.split()
        mult = {
            "second": 1, "seconds": 1, "minute": 60, "minutes": 60,
            "hour": 3600, "hours": 3600, "day": 86400, "days": 86400,
            "week": 604800, "weeks": 604800,
        }.get(unit)
        if mult is None:
            raise ValueError(f"unsupported half-life unit: {interval!r}")
        return float(qty) * mult

    aggs = [F.count(F.lit(1)).alias("n_events")]
    for hl in half_lives:
        secs = _secs(hl)
        w = F.pow(F.lit(2.0), -age_s / F.lit(secs))
        tag = hl.replace(" ", "_")
        aggs.append(F.round(F.sum(w), 6).alias(f"cnt_{tag}"))
        if value_col is not None:
            aggs.append(
                F.round(F.sum(w * F.col(value_col).cast("double")), 6).alias(
                    f"sum_{tag}"
                )
            )
    return base.groupBy(*ks).agg(*aggs)
