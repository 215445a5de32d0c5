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
