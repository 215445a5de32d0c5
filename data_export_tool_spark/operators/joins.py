"""Size-gated broadcast hinting.

The reference's dimension joins (``mamba_dim_client`` ×41 sites,
Tx_Curr_LineList.sql:49-63 and siblings) are one-row-per-patient: tiny
at a single facility, GB-scale at a 10M-patient warehouse. A *forced*
``F.broadcast`` hint bypasses both Catalyst's size check and AQE's
runtime demotion, so at 100× scale it OOMs the build side instead of
falling back to a shuffle join.

``maybe_broadcast`` applies the hint only when Catalyst's own
size-in-bytes estimate for the frame clears the session broadcast
threshold. Above the threshold the frame is returned unhinted and the
planner decides — AQE still promotes to broadcast at runtime if the
side turns out small after filtering, so fixture-scale plans keep
their BroadcastHashJoins (plan-contract-tested in
tests/test_plan_contracts.py) while lake-scale plans degrade to
sort-merge instead of dying.

The estimate is ``optimizedPlan().stats().sizeInBytes`` — driver-side
only (parquet footers / InMemoryRelation stats propagated through the
plan; ~0.5 ms, no job). It is deliberately conservative: Catalyst
propagates the child scan size through filters and aggregates, so a
heavily-reducing aggregate over a big fact table reads as big and the
hint is skipped — exactly the case where forcing a broadcast is a bet
the optimizer is better placed to make at runtime.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_UNITS = {"b": 1, "k": 1 << 10, "m": 1 << 20, "g": 1 << 30, "t": 1 << 40}


def _parse_bytes(value: str) -> int:
    """Parse Spark byte-string conf values ('67108864', '64MB', '10m',
    '-1'). Mirrors JavaUtils.byteStringAsBytes for the suffixes Spark
    accepts on autoBroadcastJoinThreshold."""
    s = value.strip().lower()
    for suffix in ("kb", "mb", "gb", "tb", "k", "m", "g", "t", "b"):
        if s.endswith(suffix):
            return int(float(s[: -len(suffix)]) * _UNITS[suffix[0]])
    return int(s)


def size_estimate_bytes(df: DataFrame) -> int | None:
    """Catalyst's optimized-plan size estimate for ``df`` in bytes, or
    None when no estimate is available (e.g. streaming frames)."""
    try:
        return int(df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes())
    except Exception:  # noqa: BLE001 — estimate is advisory only
        return None


def maybe_broadcast(df: DataFrame, threshold_bytes: int | None = None) -> DataFrame:
    """Broadcast-hint ``df`` only when its Catalyst size estimate clears
    the broadcast threshold (default: the session's
    ``spark.sql.autoBroadcastJoinThreshold``).

    Over-threshold or unestimable frames come back unhinted: the join
    then plans as sort-merge and AQE's runtime size check still demotes
    it to broadcast when the materialized side is genuinely small.
    """
    if threshold_bytes is None:
        raw = df.sparkSession.conf.get(
            "spark.sql.autoBroadcastJoinThreshold", "10485760"
        )
        threshold_bytes = _parse_bytes(raw or "10485760")
    if threshold_bytes <= 0:
        return df
    est = size_estimate_bytes(df)
    if est is None or est > threshold_bytes:
        return df
    return F.broadcast(df)
