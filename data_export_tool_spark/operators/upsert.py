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


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    keys: Sequence[str],
    compare_cols: Sequence[str] | None = None,
) -> DataFrame:
    """The inverse of ``merge_upsert``: the changeset that turns
    snapshot ``old`` into snapshot ``new``.

    Output: one row per changed key with ``change_type`` in
    ``insert | update | delete`` plus the NEW side's columns (the OLD
    side's values for deletes, since the new side has none). Unchanged
    keys produce no row. ``compare_cols`` restricts which non-key
    columns define "changed" (default: all shared non-key columns).

    Change detection hashes the canonical struct of the compared
    columns (``xxhash64(struct(...))``) — one 64-bit compare per key
    instead of N column compares, null-safe by construction (a NULL
    inside a struct hashes deterministically, and a hash equality
    false-positive needs a 2⁻⁶⁴ collision on a same-key row pair).
    Merge KEYS join by plain equality — a NULL key is not a stable
    identity, so such rows report as delete + insert rather than
    matching each other.

    Scale shape: ONE full-outer shuffle join on the snapshot keys —
    there is no cheaper complete diff. On snapshots both written
    bucketed by ``keys`` (``catalog.write_bucketed``) the join plans
    with ZERO Exchange (pinned in tests/test_plan_contracts.py); AQE
    skew-splits a hot key otherwise. Both sides are column-pruned to
    keys + compared columns before the join.
    """
    keys = [keys] if isinstance(keys, str) else list(keys)
    shared = [c for c in new.columns if c in set(old.columns)]
    if compare_cols is None:
        compare = [c for c in shared if c not in keys]
    else:
        compare = list(compare_cols)
        missing = [c for c in compare if c not in shared]
        if missing:
            raise ValueError(f"compare_cols not in both snapshots: {missing}")
    out_cols = keys + [c for c in shared if c not in keys]

    def hashed(df: DataFrame, side: str) -> DataFrame:
        return df.select(
            *[F.col(k).alias(f"{side}_{k}") for k in keys],
            *[F.col(c).alias(f"{side}_{c}") for c in out_cols if c not in keys],
            F.xxhash64(F.struct(*[F.col(c) for c in compare])).alias(
                f"{side}_h"
            ),
            F.lit(1).alias(f"{side}_present"),
        )

    o, n = hashed(old, "o"), hashed(new, "n")
    # plain equality, NOT eqNullSafe: Spark compiles `<=>` join keys to
    # coalesce(k, default), which no longer matches bucket columns and
    # forces an Exchange on bucketed snapshots. A NULL merge key is not
    # a stable row identity anyway — such rows surface as a delete
    # (old side) plus an insert (new side), which is the honest answer.
    cond = [F.col(f"o_{k}") == F.col(f"n_{k}") for k in keys]
    joined = o.join(n, cond, "full_outer")
    change = (
        F.when(F.col("o_present").isNull(), F.lit("insert"))
        .when(F.col("n_present").isNull(), F.lit("delete"))
        .when(F.col("o_h") != F.col("n_h"), F.lit("update"))
    )
    return (
        joined.withColumn("change_type", change)
        .where(F.col("change_type").isNotNull())
        .select(
            "change_type",
            *[
                F.coalesce(F.col(f"n_{k}"), F.col(f"o_{k}")).alias(k)
                for k in keys
            ],
            *[
                F.when(
                    F.col("change_type") == "delete", F.col(f"o_{c}")
                )
                .otherwise(F.col(f"n_{c}"))
                .alias(c)
                for c in out_cols
                if c not in keys
            ],
        )
    )


def scd2_init(
    snapshot: DataFrame,
    effective_ts,
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
    is_current: str = "is_current",
) -> DataFrame:
    """Bootstrap a type-2 slowly-changing-dimension history from the
    first snapshot: every row becomes the open current version."""
    return snapshot.select(
        "*",
        F.lit(effective_ts).cast("timestamp").alias(valid_from),
        F.lit(None).cast("timestamp").alias(valid_to),
        F.lit(True).alias(is_current),
    )


def scd2_apply(
    history: DataFrame,
    snapshot: DataFrame,
    keys: Sequence[str],
    effective_ts,
    compare_cols: Sequence[str] | None = None,
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
    is_current: str = "is_current",
) -> DataFrame:
    """Advance an SCD-2 history to a new full snapshot: the standard
    lakehouse dimension-history maintenance (Kimball type 2), built on
    ``snapshot_diff``.

    ``history`` carries the payload columns plus ``valid_from``/
    ``valid_to``/``is_current``; ``snapshot`` is the complete new state
    observed at ``effective_ts``. Per business key:

    - changed payload → the open version closes (``valid_to`` =
      effective_ts, ``is_current`` = false) and a new open version
      appends;
    - key absent from the snapshot → the open version closes with no
      successor (a soft delete the history remembers);
    - new key → a new open version appends;
    - unchanged → untouched. Closed historical versions always pass
      through untouched.

    Scale shape: ONE ``snapshot_diff`` (a single full-outer join on
    the keys — no cheaper complete change detection exists) plus a
    semi/anti-join pair of the open generation against the (churn-
    sized) diff keys — AQE broadcasts the diff side when the day's
    churn is small, which is the normal case for a dimension. History
    rows never rewrite in place, so the operator composes with an
    append-only lake layout.

    Business keys must be non-NULL: ``snapshot_diff`` reports a NULL
    key as delete+insert every run (a NULL key is not a stable
    identity), which under SCD2 would re-version such rows on every
    apply.
    """
    keys = [keys] if isinstance(keys, str) else list(keys)
    meta = {valid_from, valid_to, is_current}
    payload_cols = [c for c in history.columns if c not in meta]

    current = history.where(F.col(is_current))
    d = snapshot_diff(
        current.select(*payload_cols), snapshot, keys, compare_cols
    )
    changed_keys = d.where(F.col("change_type") != "insert").select(*keys)

    closed_now = (
        current.join(changed_keys, on=keys, how="left_semi")
        .withColumn(valid_to, F.lit(effective_ts).cast("timestamp"))
        .withColumn(is_current, F.lit(False))
    )
    still_open = current.join(changed_keys, on=keys, how="left_anti")
    new_versions = scd2_init(
        d.where(F.col("change_type") != "delete").select(*payload_cols),
        effective_ts,
        valid_from,
        valid_to,
        is_current,
    )
    return (
        history.where(~F.col(is_current))
        .unionByName(closed_now)
        .unionByName(still_open)
        .unionByName(new_versions)
    )


def scd2_lookup(
    history: DataFrame,
    as_of,
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
) -> DataFrame:
    """The dimension as it stood at ``as_of``: versions whose validity
    interval covers the instant (``valid_from <= as_of < valid_to``,
    open versions have NULL ``valid_to``). A pure filter — partition
    pruning applies when the history is partitioned by validity."""
    ts = F.lit(as_of).cast("timestamp")
    return history.where(
        (F.col(valid_from) <= ts)
        & (F.col(valid_to).isNull() | (F.col(valid_to) > ts))
    )


def scd2_join(
    facts: DataFrame,
    history: DataFrame,
    keys: Sequence[str],
    ts_col: str = "ts",
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
    how: str = "left",
) -> DataFrame:
    """Temporal dimension join: each fact row picks the history
    version valid AT its event time (``valid_from <= ts < valid_to``;
    open versions match everything from their start). The point-in-
    time enrichment every event pipeline over an SCD-2 dimension
    needs.

    An equi-join on the business keys with the validity interval as a
    residual range predicate — each fact matches AT MOST one version
    (intervals per key are disjoint by construction), so no dedup pass
    is needed after. At scale the equi-key join shuffles on the keys
    (or broadcasts a small dimension); the interval check rides along
    as the join residual. Facts with no covering version keep NULL
    dimension columns under ``how='left'``.
    """
    keys = [keys] if isinstance(keys, str) else list(keys)
    h = history.drop("is_current") if "is_current" in history.columns else history
    dim_cols = [c for c in h.columns if c not in keys]
    f, d = facts.alias("f"), h.alias("d")
    cond = [F.col(f"f.{k}") == F.col(f"d.{k}") for k in keys] + [
        F.col(f"d.{valid_from}") <= F.col(f"f.{ts_col}"),
        F.col(f"d.{valid_to}").isNull()
        | (F.col(f"d.{valid_to}") > F.col(f"f.{ts_col}")),
    ]
    joined = f.join(d, cond, how)
    return joined.select(
        *[F.col(f"f.{c}") for c in facts.columns],
        *[F.col(f"d.{c}") for c in dim_cols],
    )


def apply_diff(
    target: DataFrame, diff: DataFrame, keys: Sequence[str]
) -> DataFrame:
    """Replay a ``snapshot_diff`` changeset onto ``target``:
    inserts/updates merge via ``merge_upsert``, deletes anti-join
    away. ``apply_diff(old, snapshot_diff(old, new, keys), keys)``
    is row-identical to ``new`` (pinned by tests, including NULL-key
    rows).

    NULL-key rows need their own path on both sides: a keyed
    anti-join can never match a NULL key (so their deletes would
    silently no-op), and ``merge_upsert``'s key-partitioned window
    GROUPS NULL keys together (so distinct NULL-key inserts would
    collapse to one). ``snapshot_diff`` reports every NULL-key old
    row as a delete carrying its FULL row payload — so NULL-key
    deletes anti-join on the entire row null-safely (removing exactly
    the rows the diff names, duplicates included), and NULL-key
    inserts append verbatim, bypassing the merge window."""
    keys = [keys] if isinstance(keys, str) else list(keys)
    cols = list(target.columns)
    null_key = None
    for k in keys:
        c = F.col(k).isNull()
        null_key = c if null_key is None else (null_key | c)

    upserts = diff.where(F.col("change_type") != "delete").select(*cols)
    deletes = diff.where(F.col("change_type") == "delete")

    # keyed deletes: anti-join on the keys
    kept = target.join(
        deletes.where(~null_key).select(*keys), on=keys, how="left_anti"
    )
    # NULL-key deletes: anti-join on the whole row, null-safe — the
    # diff carries the full payload for deletes, so this removes
    # exactly the named rows (all copies, matching the diff's
    # all-copies delete report)
    nk_del = deletes.where(null_key).select(*cols)
    kept = kept.alias("t").join(
        nk_del.alias("d"),
        on=[
            F.col(f"t.{c}").eqNullSafe(F.col(f"d.{c}")) for c in cols
        ],
        how="left_anti",
    ).select("t.*")

    merged = merge_upsert(
        kept.where(~null_key), upserts.where(~null_key), keys
    )
    # NULL-key survivors pass through; NULL-key inserts append verbatim
    return merged.unionByName(kept.where(null_key)).unionByName(
        upserts.where(null_key)
    )
