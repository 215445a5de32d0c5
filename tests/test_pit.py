"""Point-in-time join vs a python replay over events-derived feature
snapshots (two tables), plus staleness-nulling / cold-start /
name-collision edges on a hand frame."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from tests.conftest import record_opcheck
from data_export_tool_spark.catalog import Catalog
from data_export_tool_spark.operators.pit import point_in_time_join


def test_pit_matches_python_reference(spark, sf_dir):
    """Labels = purchases; two feature tables derived from the same
    events (per-user last value at each event, per-user click count
    snapshots). Replay: for each label pick the latest snapshot <= ts
    per table."""
    ev = Catalog(spark, sf_dir).load("events").where(
        F.col("user_id").isNotNull() & F.col("ts").isNotNull()
    )
    labels = ev.where(F.col("event_type") == "purchase").select(
        "user_id", "ts", "event_id"
    )
    val_feats = ev.where(F.col("value").isNotNull()).select(
        "user_id", "ts", F.col("value").alias("v")
    )
    click_feats = (
        ev.where(F.col("event_type") == "click")
        .select("user_id", "ts")
        .withColumn("one", F.lit(1))
        .select("user_id", "ts", "one")
    )
    got = point_in_time_join(
        labels,
        {"val": val_feats, "clk": click_feats},
        on="user_id",
        label_time="ts",
        feature_time="ts",
    ).collect()

    vrows = sorted(
        [(r["user_id"], r["ts"], r["v"]) for r in val_feats.collect()],
        key=lambda t: (t[0], t[1]),
    )
    crows = sorted(
        [(r["user_id"], r["ts"]) for r in click_feats.collect()],
        key=lambda t: (t[0], t[1]),
    )

    def latest(rows, u, ts):
        best = None
        for row in rows:
            if row[0] == u and row[1] <= ts:
                if best is None or row[1] > best[1]:
                    best = row
        return best

    n_labels = labels.count()
    assert len(got) == n_labels  # left join never drops/duplicates labels
    ok = True
    for r in got:
        vb = latest(vrows, r["user_id"], r["ts"])
        cb = latest(crows, r["user_id"], r["ts"])
        ok = ok and (r["val__ts"] == (vb[1] if vb else None))
        ok = ok and (r["clk__ts"] == (cb[1] if cb else None))
        if vb is not None:
            # value ties at the same ts resolve to SOME row at that ts;
            # pin the ts exactly and the value to the tie set
            tie_vals = {
                row[2] for row in vrows
                if row[0] == r["user_id"] and row[1] == vb[1]
            }
            ok = ok and r["val__v"] in tie_vals
        else:
            ok = ok and r["val__v"] is None
    record_opcheck(
        "point_in_time_join", len(got), bool(ok), oracle="python-reference"
    )
    assert ok


def test_pit_staleness_and_edges(spark):
    t0 = dt.datetime(2024, 5, 1)

    def d(days):
        return t0 + dt.timedelta(days=days)

    labels = spark.createDataFrame(
        [(1, d(10)), (2, d(10)), (3, d(10))],
        "uid long, ts timestamp",
    )
    feats = spark.createDataFrame(
        [
            (1, d(9), 100.0),   # fresh
            (2, d(1), 200.0),   # stale under 5-day horizon
            # uid 3: no history at all (cold start)
        ],
        "uid long, ts timestamp, score double",
    )
    out = {
        r["uid"]: r
        for r in point_in_time_join(
            labels, {"f": feats}, on="uid", max_staleness="5 days"
        ).collect()
    }
    assert out[1]["f__score"] == 100.0 and out[1]["f__ts"] == d(9)
    assert out[2]["f__score"] is None and out[2]["f__ts"] is None  # stale
    assert out[3]["f__score"] is None and out[3]["f__ts"] is None  # cold
    assert len(out) == 3  # stale/cold rows survive

    # exactly-at-horizon snapshot is FRESH (>= boundary)
    out2 = {
        r["uid"]: r
        for r in point_in_time_join(
            labels, {"f": feats}, on="uid", max_staleness="9 days"
        ).collect()
    }
    assert out2[2]["f__score"] == 200.0

    # same feature name in two tables never collides
    feats2 = spark.createDataFrame(
        [(1, d(8), 7.0)], "uid long, ts timestamp, score double"
    )
    both = point_in_time_join(
        labels, {"a": feats, "b": feats2}, on="uid"
    )
    assert {"a__score", "b__score", "a__ts", "b__ts"} <= set(both.columns)

    with pytest.raises(ValueError):
        point_in_time_join(labels, {}, on="uid")
    with pytest.raises(ValueError):
        point_in_time_join(labels, {"x__y": feats}, on="uid")
    with pytest.raises(ValueError):
        point_in_time_join(labels, {"f": feats.drop("uid")}, on="uid")


def test_pit_plan_has_no_window_or_cartesian(spark, sf_dir):
    """The as-of core must stay the partial-aggregable struct-MAX
    shape: no per-row Window over the feature history, no cartesian."""
    ev = Catalog(spark, sf_dir).load("events").where(
        F.col("user_id").isNotNull() & F.col("ts").isNotNull()
    )
    labels = ev.where(F.col("event_type") == "purchase").select(
        "user_id", "ts"
    )
    feats = ev.select("user_id", "ts", F.col("value").alias("v"))
    plan = (
        point_in_time_join(labels, {"f": feats}, on="user_id")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Window" not in plan
    assert "CartesianProduct" not in plan


def test_decayed_counters_match_duckdb(spark, sf_dir):
    """Exact DuckDB replay of the 2^(-age/half_life) weighted sums,
    the future-exclusion law, and validation."""
    import duckdb
    import pytest
    from pyspark.sql import functions as F

    from data_export_tool_spark.operators.pit import decayed_counters

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    mid_ms = ev.agg(
        F.percentile_approx(F.unix_millis(F.col("ts").cast("timestamp")), 0.7)
    ).first()[0]
    import datetime as dt

    as_of = dt.datetime.utcfromtimestamp(mid_ms / 1000.0)
    got = {
        r["user_id"]: (
            r["n_events"], r["cnt_1_day"], r["cnt_7_days"], r["sum_7_days"]
        )
        for r in decayed_counters(
            ev, as_of, keys="user_id",
            half_lives=("1 day", "7 days"), value_col="value",
        ).collect()
    }
    as_of_s = mid_ms / 1000.0
    want_rows = duckdb.sql(f"""
      SELECT user_id, COUNT(*) AS n,
             ROUND(SUM(POW(2.0, -(({as_of_s}) - epoch(CAST(ts AS TIMESTAMP))) / 86400.0)), 6),
             ROUND(SUM(POW(2.0, -(({as_of_s}) - epoch(CAST(ts AS TIMESTAMP))) / (7*86400.0))), 6),
             ROUND(SUM(value * POW(2.0, -(({as_of_s}) - epoch(CAST(ts AS TIMESTAMP))) / (7*86400.0))), 6)
      FROM '{sf_dir}/events.parquet'
      WHERE ts IS NOT NULL AND epoch(CAST(ts AS TIMESTAMP)) <= {as_of_s}
      GROUP BY user_id
    """).fetchall()
    want = {
        u: (int(n), float(c1), float(c7), float(s7))
        for u, n, c1, c7, s7 in want_rows
    }
    assert set(got) == set(want)
    ok = all(
        got[u][0] == want[u][0]
        and got[u][1] == pytest.approx(want[u][1], abs=1e-4)
        and got[u][2] == pytest.approx(want[u][2], abs=1e-4)
        and got[u][3] == pytest.approx(want[u][3], abs=1e-3)
        for u in want
    )
    record_opcheck("decayed_counters", len(want) * 3, ok)
    assert ok
    # future-exclusion: counters never count rows after as_of
    total_rows = sum(v[0] for v in got.values())
    past_rows = ev.where(
        F.col("ts").cast("timestamp") <= F.lit(as_of)
    ).where(F.col("ts").isNotNull()).count()
    assert total_rows == past_rows
    # decay sanity: a longer half-life never yields a smaller counter
    assert all(got[u][2] >= got[u][1] - 1e-9 for u in got)
    with pytest.raises(ValueError):
        decayed_counters(ev, as_of, half_lives=())
    with pytest.raises(ValueError):
        decayed_counters(ev, as_of, half_lives=("2 fortnights",))
