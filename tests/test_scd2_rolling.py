"""SCD-2 dimension history (operators/upsert.py) and rolling
time-window aggregates (operators/timeseries.py) vs DuckDB replays."""

from __future__ import annotations

import datetime as dt

import duckdb
import pytest
from pyspark.sql import functions as F

from tests.conftest import record_opcheck
from data_export_tool_spark.operators.timeseries import resample, rolling
from data_export_tool_spark.operators.upsert import (
    scd2_apply,
    scd2_init,
    scd2_lookup,
)

T0 = dt.datetime(2024, 1, 1)
T1 = dt.datetime(2024, 2, 1)
T2 = dt.datetime(2024, 3, 1)


def test_scd2_apply_matches_duckdb(spark, sf_dir):
    """One full apply step over the orders snapshot, replayed in SQL:
    per key the open version closes iff the payload changed or the key
    vanished; new/changed keys open a version at t1."""
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    cols = ["o_orderkey", "o_orderstatus", "o_totalprice"]
    snap0 = orders.select(*cols)
    # t1 snapshot: drop keys %97==0, bump price %31==0, add 5 new keys
    snap1 = (
        snap0.where(F.col("o_orderkey") % 97 != 0)
        .withColumn(
            "o_totalprice",
            F.when(
                F.col("o_orderkey") % 31 == 0, F.col("o_totalprice") + 1
            ).otherwise(F.col("o_totalprice")),
        )
        .unionByName(
            snap0.limit(5).withColumn(
                "o_orderkey", F.col("o_orderkey") + F.lit(90_000_000)
            )
        )
    )
    hist = scd2_apply(
        scd2_init(snap0, T0), snap1, ["o_orderkey"], T1
    )
    got = sorted(
        (
            r["o_orderkey"],
            round(r["o_totalprice"], 2),
            str(r["valid_from"]),
            str(r["valid_to"]),
            r["is_current"],
        )
        for r in hist.collect()
    )
    want = sorted(
        (k, round(p, 2), str(vf), str(vt), bool(cur))
        for k, p, vf, vt, cur in duckdb.sql(
            f"""
    WITH s0 AS (
      SELECT o_orderkey, o_orderstatus, o_totalprice
      FROM read_parquet('{sf_dir}/orders.parquet')
    ),
    s1 AS (
      SELECT o_orderkey, o_orderstatus,
             CASE WHEN o_orderkey % 31 = 0 THEN o_totalprice + 1
                  ELSE o_totalprice END AS o_totalprice
      FROM s0 WHERE o_orderkey % 97 != 0
      UNION ALL
      SELECT o_orderkey + 90000000, o_orderstatus, o_totalprice
      FROM (SELECT * FROM s0 LIMIT 5)
    ),
    changed AS (  -- keys whose open version must close at t1
      SELECT s0.o_orderkey FROM s0 LEFT JOIN s1 USING (o_orderkey)
      WHERE s1.o_orderkey IS NULL
         OR (s0.o_orderstatus, s0.o_totalprice)
            IS DISTINCT FROM (s1.o_orderstatus, s1.o_totalprice)
    ),
    opened AS (   -- new or changed keys open a version at t1
      SELECT s1.* FROM s1 LEFT JOIN s0 USING (o_orderkey)
      WHERE s0.o_orderkey IS NULL
         OR (s0.o_orderstatus, s0.o_totalprice)
            IS DISTINCT FROM (s1.o_orderstatus, s1.o_totalprice)
    )
    SELECT o_orderkey, o_totalprice,
           TIMESTAMP '2024-01-01' AS vf,
           CASE WHEN o_orderkey IN (SELECT o_orderkey FROM changed)
                THEN TIMESTAMP '2024-02-01' END AS vt,
           o_orderkey NOT IN (SELECT o_orderkey FROM changed) AS cur
    FROM s0
    UNION ALL
    SELECT o_orderkey, o_totalprice,
           TIMESTAMP '2024-02-01', NULL, TRUE FROM opened
    """
        ).fetchall()
    )
    record_opcheck("scd2_apply", len(want), got == want)
    assert got == want


def test_scd2_three_generations_and_lookup(spark):
    rows0 = [(1, "a"), (2, "b"), (3, "c")]
    rows1 = [(1, "a"), (2, "B"), (4, "d")]  # 2 changes, 3 dies, 4 born
    rows2 = [(1, "a"), (2, "B2"), (4, "d")]  # 2 changes again
    mk = lambda rows: spark.createDataFrame(rows, "k long, v string")
    h = scd2_init(mk(rows0), T0)
    h = scd2_apply(h, mk(rows1), ["k"], T1)
    h = scd2_apply(h, mk(rows2), ["k"], T2)
    versions = {
        (r["k"], r["v"]): (str(r["valid_from"])[:10], str(r["valid_to"])[:10], r["is_current"])
        for r in h.collect()
    }
    assert versions == {
        (1, "a"): ("2024-01-01", "None", True),
        (2, "b"): ("2024-01-01", "2024-02-01", False),
        (2, "B"): ("2024-02-01", "2024-03-01", False),
        (2, "B2"): ("2024-03-01", "None", True),
        (3, "c"): ("2024-01-01", "2024-02-01", False),
        (4, "d"): ("2024-02-01", "None", True),
    }
    # point-in-time lookups reconstruct every generation
    at0 = {(r["k"], r["v"]) for r in scd2_lookup(h, T0).collect()}
    at1 = {(r["k"], r["v"]) for r in scd2_lookup(h, T1).collect()}
    at2 = {(r["k"], r["v"]) for r in scd2_lookup(h, T2).collect()}
    assert at0 == {(1, "a"), (2, "b"), (3, "c")}
    assert at1 == {(1, "a"), (2, "B"), (4, "d")}
    assert at2 == {(1, "a"), (2, "B2"), (4, "d")}


def test_scd2_idempotent_on_unchanged_snapshot(spark):
    rows = [(1, "a"), (2, "b")]
    df = spark.createDataFrame(rows, "k long, v string")
    h1 = scd2_apply(scd2_init(df, T0), df, ["k"], T1)
    assert h1.count() == 2
    assert h1.where(~F.col("is_current")).count() == 0


def test_rolling_matches_duckdb(spark, sf_dir):
    from data_export_tool_spark.catalog import Catalog

    ev = Catalog(spark, sf_dir).load("events")
    daily = resample(
        ev,
        "1 day",
        {"n": F.count(F.lit(1)).cast("long")},
        keys=["event_type"],
    )
    out = rolling(
        daily,
        86400,
        7,
        {"n_7d": ("n", "sum"), "avg_7d": ("n", "avg"), "peak_7d": ("n", "max")},
        keys=["event_type"],
    )
    got = {
        (r["event_type"], str(r["bucket_start"])[:10]): (
            r["n_7d"],
            round(r["avg_7d"], 6),
            r["peak_7d"],
        )
        for r in out.collect()
    }
    want = {
        (t, str(b)[:10]): (int(s7), round(float(a7), 6), int(p7))
        for t, b, s7, a7, p7 in duckdb.sql(
            f"""
    WITH daily AS (
      SELECT event_type, date_trunc('day', ts) AS b,
             CAST(count(*) AS BIGINT) AS n
      FROM read_parquet('{sf_dir}/events.parquet')
      WHERE ts IS NOT NULL GROUP BY 1, 2
    )
    SELECT event_type, b,
           sum(n) OVER w AS n_7d, avg(n) OVER w AS avg_7d,
           max(n) OVER w AS peak_7d
    FROM daily
    WINDOW w AS (PARTITION BY event_type ORDER BY b
                 RANGE BETWEEN INTERVAL 6 DAY PRECEDING AND CURRENT ROW)
    """
        ).fetchall()
    }
    record_opcheck("timeseries_rolling", len(want), got == want)
    assert got == want


def test_rolling_validation(spark):
    df = spark.createDataFrame(
        [("a", dt.datetime(2024, 1, 1), 1)], "k string, bucket_start timestamp, n long"
    )
    with pytest.raises(ValueError):
        rolling(df, 3600, 0, {"x": ("n", "sum")})
    with pytest.raises(ValueError):
        rolling(df, 3600, 2, {"x": ("n", "median")})


def test_scd2_join_point_in_time(spark):
    from data_export_tool_spark.operators.upsert import scd2_join

    hist_rows = [
        # key 1: price 10 in Jan, 20 from Feb on
        (1, 10.0, dt.datetime(2024, 1, 1), dt.datetime(2024, 2, 1), False),
        (1, 20.0, dt.datetime(2024, 2, 1), None, True),
        # key 2: single open version
        (2, 99.0, dt.datetime(2024, 1, 15), None, True),
    ]
    hist = spark.createDataFrame(
        hist_rows,
        "k long, price double, valid_from timestamp, valid_to timestamp,"
        " is_current boolean",
    )
    facts = spark.createDataFrame(
        [
            (100, 1, dt.datetime(2024, 1, 20)),  # inside v1
            (101, 1, dt.datetime(2024, 2, 1)),  # boundary -> NEW version
            (102, 1, dt.datetime(2024, 6, 1)),  # open version
            (103, 2, dt.datetime(2024, 1, 1)),  # before any version
            (104, 3, dt.datetime(2024, 1, 1)),  # unknown key
        ],
        "event_id long, k long, ts timestamp",
    )
    got = {
        r["event_id"]: r["price"]
        for r in scd2_join(facts, hist, ["k"]).collect()
    }
    assert got == {100: 10.0, 101: 20.0, 102: 20.0, 103: None, 104: None}
    # each fact matched at most one version: no row multiplication
    assert scd2_join(facts, hist, ["k"]).count() == 5
    # inner form drops uncovered facts
    inner = scd2_join(facts, hist, ["k"], how="inner")
    assert sorted(r["event_id"] for r in inner.collect()) == [100, 101, 102]


def test_scd2_join_after_apply_matches_lookup(spark):
    """Composition law: joining facts at time T against the evolving
    history equals enriching from scd2_lookup(history, T)."""
    from data_export_tool_spark.operators.upsert import scd2_join

    mk = lambda rows: spark.createDataFrame(rows, "k long, v string")
    h = scd2_init(mk([(1, "a"), (2, "b")]), T0)
    h = scd2_apply(h, mk([(1, "a"), (2, "B")]), ["k"], T1)
    facts = spark.createDataFrame(
        [(1, 1, T0), (2, 2, T0), (3, 1, T1), (4, 2, T1)],
        "event_id long, k long, ts timestamp",
    )
    got = {
        r["event_id"]: r["v"] for r in scd2_join(facts, h, ["k"]).collect()
    }
    at0 = {r["k"]: r["v"] for r in scd2_lookup(h, T0).collect()}
    at1 = {r["k"]: r["v"] for r in scd2_lookup(h, T1).collect()}
    assert got == {1: at0[1], 2: at0[2], 3: at1[1], 4: at1[2]}


def test_detect_anomalies_matches_duckdb(spark, sf_dir):
    from data_export_tool_spark.catalog import Catalog
    from data_export_tool_spark.operators.timeseries import detect_anomalies

    ev = Catalog(spark, sf_dir).load("events")
    daily = resample(
        ev, "1 day", {"n": F.count(F.lit(1)).cast("double")}, keys=["event_type"]
    )
    out = detect_anomalies(daily, 86400, 7, "n", keys=["event_type"], n_sigmas=2.0)
    got = {
        (r["event_type"], str(r["bucket_start"])[:10]): (
            None if r["baseline_mean"] is None else round(r["baseline_mean"], 6),
            r["is_anomaly"],
        )
        for r in out.collect()
    }
    want = {
        (t, str(b)[:10]): (
            None if m is None else round(float(m), 6),
            None if flag is None else bool(flag),
        )
        for t, b, m, flag in duckdb.sql(
            f"""
    WITH daily AS (
      SELECT event_type, date_trunc('day', ts) AS b,
             CAST(count(*) AS DOUBLE) AS n
      FROM read_parquet('{sf_dir}/events.parquet')
      WHERE ts IS NOT NULL GROUP BY 1, 2
    ),
    r AS (
      SELECT event_type, b, n,
             avg(n) OVER w AS m, stddev_samp(n) OVER w AS s,
             count(n) OVER w AS c
      FROM daily
      WINDOW w AS (PARTITION BY event_type ORDER BY b
                   RANGE BETWEEN INTERVAL 7 DAY PRECEDING
                             AND INTERVAL 1 DAY PRECEDING)
    )
    SELECT event_type, b, m,
           CASE WHEN c < 3 THEN NULL
                ELSE abs(n - m) > 2.0 * coalesce(s, 0.0) END
    FROM r
    """
        ).fetchall()
    }
    record_opcheck("timeseries_anomalies", len(want), got == want)
    assert got == want


def test_detect_anomalies_flags_spike(spark):
    import datetime as dtm

    from data_export_tool_spark.operators.timeseries import detect_anomalies

    rows = [
        ("k", dtm.datetime(2024, 1, 1 + i), 10.0 + (i % 2)) for i in range(8)
    ] + [("k", dtm.datetime(2024, 1, 9), 500.0)]
    df = spark.createDataFrame(rows, "k string, bucket_start timestamp, n double")
    out = {
        str(r["bucket_start"])[:10]: r["is_anomaly"]
        for r in detect_anomalies(df, 86400, 5, "n", keys=["k"]).collect()
    }
    assert out["2024-01-09"] is True
    assert out["2024-01-01"] is None  # cold start
    assert out["2024-01-08"] is False


def test_compact_parquet(spark, sf_dir, tmp_path):
    from data_export_tool_spark.operators.layout import compact_parquet

    import glob

    src = str(tmp_path / "fragmented")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    docs.repartition(64).write.parquet(src)
    assert len(glob.glob(f"{src}/part-*")) == 64

    dst = str(tmp_path / "compacted")
    n_out = compact_parquet(spark, src, dst, target_mb=1024)
    files = glob.glob(f"{dst}/part-*")
    assert n_out == 1 and len(files) == 1  # tiny table -> one file
    a = sorted(map(tuple, spark.read.parquet(dst).collect()))
    b = sorted(map(tuple, docs.collect()))
    assert a == b

    # in-place compaction must refuse: overwrite deletes dst before the
    # lazy src read pulls a row, destroying the table (round-6 ADVICE)
    import pytest as _pytest

    with _pytest.raises(ValueError, match="must differ"):
        compact_parquet(spark, src, src, target_mb=1024)
    assert len(glob.glob(f"{src}/part-*")) == 64  # untouched
