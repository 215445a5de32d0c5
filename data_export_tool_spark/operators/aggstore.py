"""Incremental aggregate-store maintenance.

A 100 TB corpus's rollups (per-domain token counts, per-day event
stats, per-source quality means) cannot be recomputed from scratch for
every nightly delta. This module keeps a *partial-aggregate store* —
one row per group holding the algebraic partials (count, sum, min,
max) — and folds delta batches into it with work sized by the DELTA'S
KEY REACH, not the store: the groupBy twin of
``graph.update_components`` and the aggregation face of the
``near_dup_store`` incremental-dedup contract.

Shape per update: the delta is partially aggregated (map-side combine,
delta-sized shuffle); its distinct keys semi/anti-join the store
(broadcast when the delta is small — the nightly-batch case — so the
store itself never shuffles); only touched groups re-merge. Insert-only
contract: min/max are not retractable, so there is no delete path —
retractions belong to the SCD-2 tier (operators/upsert.py).

Partials, not finals, are stored because algebraic aggregates compose:
``merge(partial(A), partial(B)) == partial(A ∪ B)`` exactly for
count/sum/min/max — the invariant the tests pin against a from-scratch
recompute. AVG is derived at read time (sum/count), never stored.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["agg_store_init", "agg_store_update", "agg_store_read"]

_SUPPORTED = ("count", "sum", "min", "max", "avg")


def _plan(aggs: dict) -> list[tuple[str, str]]:
    """(col, partial) pairs to materialize. avg ⇒ sum + count partials."""
    pairs: list[tuple[str, str]] = []
    for col, specs in aggs.items():
        if isinstance(specs, str):
            specs = [specs]
        for s in specs:
            if s not in _SUPPORTED:
                raise ValueError(
                    f"unsupported aggregate {s!r} (insert-only store"
                    f" supports {_SUPPORTED}); retractions need the"
                    " SCD-2 tier"
                )
        want = set(specs)
        if "avg" in want:
            want |= {"sum", "count"}
            want.remove("avg")
        for s in sorted(want):
            pairs.append((col, s))
    return pairs


def _partial_cols(col: str, kind: str) -> str:
    return f"{col}__{kind}"


def _partial_agg(df: DataFrame, keys: Sequence[str], aggs: dict) -> DataFrame:
    exprs = [F.count(F.lit(1)).alias("__n")]
    for col, kind in _plan(aggs):
        fn = {"count": F.count, "sum": F.sum, "min": F.min, "max": F.max}[kind]
        exprs.append(fn(F.col(col)).alias(_partial_cols(col, kind)))
    return df.groupBy(*keys).agg(*exprs)


def _merge(grouped, keys: Sequence[str], aggs: dict) -> DataFrame:
    exprs = [F.sum("__n").alias("__n")]
    for col, kind in _plan(aggs):
        c = _partial_cols(col, kind)
        fn = {"count": F.sum, "sum": F.sum, "min": F.min, "max": F.max}[kind]
        exprs.append(fn(F.col(c)).alias(c))
    return grouped.groupBy(*keys).agg(*exprs)


def agg_store_init(df: DataFrame, keys: Sequence[str], aggs: dict) -> DataFrame:
    """Build the partial-aggregate store from a full scan.

    ``aggs`` maps column → aggregate name(s) from
    ``count|sum|min|max|avg`` (avg stored as sum+count). The store
    carries ``__n`` (group row count) plus one ``col__kind`` partial
    per requested aggregate — write it with ``write_bucketed`` on
    ``keys`` to make every later update's store side exchange-free.
    """
    if isinstance(keys, str):
        keys = [keys]
    return _partial_agg(df, keys, aggs)


def agg_store_update(
    store: DataFrame,
    delta: DataFrame,
    keys: Sequence[str],
    aggs: dict,
    broadcast_touched: bool = True,
) -> DataFrame:
    """Fold a delta batch into the store; exactly equals
    ``agg_store_init`` over (original rows ∪ delta rows) — the
    invariant the tests pin.

    Work is delta-sized: the delta pre-aggregates map-side, its
    distinct keys (``broadcast`` by default — the nightly-batch case)
    semi-join out the touched store groups for re-merge while the
    untouched store anti-joins through untouched.
    """
    if isinstance(keys, str):
        keys = [keys]
    dp = _partial_agg(delta, keys, aggs)
    touched = dp.select(*keys).distinct()
    if broadcast_touched:
        touched = F.broadcast(touched)
    hit = store.join(touched, list(keys), "left_semi")
    merged = _merge(hit.unionByName(dp), keys, aggs)
    untouched = store.join(touched, list(keys), "left_anti")
    return untouched.unionByName(merged)


def agg_store_read(store: DataFrame, aggs: dict) -> DataFrame:
    """Finalize the partials into the user-facing aggregate view:
    requested names only (``col_avg = col__sum / col__count`` etc.),
    keys and ``__n`` (as ``n_rows``) passed through. Pure projection —
    reads never touch raw data."""
    plan_cols = {_partial_cols(c, k) for c, k in _plan(aggs)}
    keys = [c for c in store.columns if c != "__n" and c not in plan_cols]
    out = [F.col(k) for k in keys] + [F.col("__n").alias("n_rows")]
    for col, specs in aggs.items():
        if isinstance(specs, str):
            specs = [specs]
        for s in specs:
            if s == "avg":
                out.append(
                    (
                        F.col(_partial_cols(col, "sum"))
                        / F.col(_partial_cols(col, "count"))
                    ).alias(f"{col}_avg")
                )
            else:
                out.append(F.col(_partial_cols(col, s)).alias(f"{col}_{s}"))
    return store.select(*out)
