"""Incremental aggregate store: update(init(old), delta) must EXACTLY
equal init(old ∪ delta) — the algebraic-partial merge law — plus a
DuckDB replay of the finalized view and an untouched-group plan pin."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from tests.conftest import record_opcheck
from data_export_tool_spark.operators.aggstore import (
    agg_store_init,
    agg_store_read,
    agg_store_update,
)

AGGS = {"value": ["sum", "min", "max", "avg"], "event_type": ["count"]}


@pytest.fixture(scope="module")
def events(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/events.parquet")


def _rows(df):
    return {
        tuple(
            round(v, 9) if isinstance(v, float) else v
            for v in r
        )
        for r in df.collect()
    }


def test_update_equals_full_recompute(spark, events):
    # split by hash: ~90% "old", ~10% delta — delta touches a strict
    # subset of groups plus (forced below) a brand-new group
    old = events.where(F.crc32(F.col("user_id").cast("string")) % 10 != 0)
    delta = events.where(F.crc32(F.col("user_id").cast("string")) % 10 == 0)
    new_group = spark.createDataFrame(
        [(999999, "brand_new_type", 3.5)], "user_id long, event_type string, value double"
    ).withColumn("ts", F.current_timestamp())
    delta = delta.select("user_id", "event_type", "value", "ts").unionByName(
        new_group
    )
    keys = ["event_type"]

    store = agg_store_init(old, keys, AGGS)
    updated = agg_store_update(store, delta, keys, AGGS)
    full = agg_store_init(
        old.select("user_id", "event_type", "value", "ts").unionByName(delta),
        keys,
        AGGS,
    )
    got, want = _rows(updated), _rows(full)
    record_opcheck(
        "agg_store_update", len(want), got == want, oracle="python-reference"
    )
    assert got == want


def test_read_view_matches_duckdb(spark, events, sf_dir):
    store = agg_store_init(events, ["event_type"], AGGS)
    view = agg_store_read(store, AGGS).toPandas()
    oracle = duckdb.sql(
        f"""
        SELECT event_type,
               CAST(COUNT(*) AS BIGINT) AS n_rows,
               SUM(value) AS value_sum, MIN(value) AS value_min,
               MAX(value) AS value_max, AVG(value) AS value_avg,
               CAST(COUNT(event_type) AS BIGINT) AS event_type_count
        FROM read_parquet('{sf_dir}/events.parquet')
        GROUP BY 1 ORDER BY 1
        """
    ).df()
    view = view.sort_values("event_type").reset_index(drop=True)[oracle.columns]
    import pandas.testing as pdt

    pdt.assert_frame_equal(view, oracle, check_dtype=False, atol=1e-9)


def test_store_side_stays_exchange_free_on_update(spark, events):
    """The untouched/touched split must reach the store through
    broadcast joins — a delta fold that shuffles the store defeats
    the incremental contract."""
    store = agg_store_init(events, ["event_type"], AGGS)
    delta = events.limit(50)
    plan = agg_store_update(
        store, delta, ["event_type"], AGGS
    )._jdf.queryExecution().executedPlan().toString()
    import re

    # every join with the store side must be broadcast (hash or NL)
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan


def test_validation_rejects_unknown_agg(spark, events):
    with pytest.raises(ValueError):
        agg_store_init(events, ["event_type"], {"value": ["median"]})
