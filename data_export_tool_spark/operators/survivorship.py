"""Golden-record survivorship: field-level merge of entity clusters.

The MDM consolidation step AFTER entity resolution
(``fuzzy_entity_clusters`` / ``canonical_by_score`` pick a KEEPER ROW;
survivorship builds a BETTER row than any member has): per cluster,
each attribute survives by its own rule — the freshest non-null value
("latest"), the oldest ("earliest"), the extreme ("max"/"min"), or
the consensus ("mode"). One output row per cluster.

Scale shape: the latest/earliest/max/min rules are ONE
partial-aggregable groupBy over the cluster key (``max_by`` /
``min_by`` with a NULL-masked ordering column — a member's NULL never
survives over a non-null, regardless of recency). Each ``mode``
column adds one (cluster, value)-grain pre-aggregate + one
``max_by((count, value))`` rollup — two-phase exact consensus, no
window, hot clusters absorbed map-side — joined back on the cluster
key. Determinism pinned: latest/earliest ties break by the larger/
smaller value; mode ties break by the SMALLEST value (count desc,
value asc).

NULL policy: NULL attribute values never win; a cluster whose every
member is NULL for a column yields NULL (nothing to survive). NULL
cluster keys are excluded (un-resolved rows don't merge).
"""

from __future__ import annotations

from collections.abc import Mapping

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["golden_record"]

_STRATEGIES = ("latest", "earliest", "max", "min", "mode")


def golden_record(
    df: DataFrame,
    cluster_col: str,
    rules: Mapping[str, str],
    ts_col: str | None = None,
) -> DataFrame:
    """One merged row per cluster: ``(cluster_col, n_members,
    <col per rule>)``. ``rules`` maps column → strategy
    (latest/earliest/max/min/mode); latest/earliest require
    ``ts_col``."""
    if not rules:
        raise ValueError("rules must map at least one column")
    for c, s in rules.items():
        if s not in _STRATEGIES:
            raise ValueError(f"unknown strategy for {c!r}: {s} (use {_STRATEGIES})")
        if s in ("latest", "earliest") and ts_col is None:
            raise ValueError(f"strategy {s!r} for {c!r} requires ts_col")
    base = df.where(F.col(cluster_col).isNotNull())

    aggs = [F.count(F.lit(1)).alias("n_members")]
    mode_cols = []
    for c, s in rules.items():
        col = F.col(c)
        if s == "latest":
            # NULL-masked ordering: a NULL value's ts masks to NULL and
            # max_by ignores NULL ordering keys — non-nulls always win;
            # ties on ts break by the larger value (struct ordering)
            ordk = F.when(
                col.isNotNull(),
                F.struct(F.col(ts_col).alias("t"), col.alias("v")),
            )
            aggs.append(F.max_by(col, ordk).alias(c))
        elif s == "earliest":
            ordk = F.when(
                col.isNotNull(),
                F.struct(F.col(ts_col).alias("t"), col.alias("v")),
            )
            aggs.append(F.min_by(col, ordk).alias(c))
        elif s == "max":
            aggs.append(F.max(col).alias(c))
        elif s == "min":
            aggs.append(F.min(col).alias(c))
        else:
            mode_cols.append(c)
    out = base.groupBy(cluster_col).agg(*aggs)

    for c in mode_cols:
        # two-phase exact consensus: (cluster, value) counts, then
        # max_by((count asc-negated, value desc-negated)) — i.e. the
        # most frequent value, ties to the SMALLEST value
        vc = (
            base.where(F.col(c).isNotNull())
            .groupBy(cluster_col, c)
            .agg(F.count(F.lit(1)).alias("__c"))
        )
        winner = vc.groupBy(cluster_col).agg(
            F.min_by(
                F.col(c),
                # min over (−count, value): most frequent first, count
                # ties to the SMALLEST value — works for any orderable
                # value type
                F.struct((-F.col("__c")).alias("nc"), F.col(c).alias("v")),
            ).alias(c)
        )
        out = out.join(winner, cluster_col, "left")
    return out
