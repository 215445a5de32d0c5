"""Batch CDC merge: apply an update/insert changeset to a snapshot.

The reference workload is snapshot-in, snapshot-out (a monthly MySQL
dump — SURVEY.md §1), but a lake-resident deployment of the same
pipeline receives *changesets*: nightly extracts carrying new and
corrected rows that must be merged into the standing table before any
line-list runs. ``merge_upsert`` is that merge as a pure plan:
union-by-name + latest-per-key, i.e. the MERGE/upsert semantics of
Delta/Iceberg expressed engine-neutrally.

Scale shape: ONE shuffle on the merge keys (the row_number window).
No driver collection, no per-row Python. On a target bucketed by the
merge keys (catalog.write_bucketed) the Exchange on the target side is
elided and only the (small) changeset shuffles.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, functions as F

from data_export_tool_spark.operators.window_dedup import latest_per_key

_TIEBREAK = "__is_update"


def merge_upsert(
    target: DataFrame,
    updates: DataFrame,
    keys: Sequence[str],
    order_by: Sequence[str] | None = None,
) -> DataFrame:
    """Merge ``updates`` into ``target``: rows whose ``keys`` exist in
    the target are replaced, new keys are appended.

    ``order_by`` picks the winner *within* each key group (e.g. a
    change-sequence or event-time column, descending). With no
    ``order_by``, an update row always beats a target row, and ties
    inside ``updates`` itself are an error the caller should have
    resolved (the reference analog: the MySQL dump is already
    key-unique).

    Column sets must match (union-by-name); schema drift belongs in a
    projection before the merge, not silently inside it.
    """
    keys = [keys] if isinstance(keys, str) else list(keys)
    if set(target.columns) != set(updates.columns):
        missing = set(target.columns) ^ set(updates.columns)
        raise ValueError(f"target/updates column mismatch: {sorted(missing)}")
    both = target.withColumn(_TIEBREAK, F.lit(0)).unionByName(
        updates.withColumn(_TIEBREAK, F.lit(1))
    )
    merged = latest_per_key(
        both, list(keys), list(order_by or []), tiebreak=_TIEBREAK
    )
    return merged.drop(_TIEBREAK)
