"""Resample / gap-fill (operators/timeseries.py) vs DuckDB."""

from __future__ import annotations

import duckdb
import pytest
from datetime import datetime, timedelta
from pyspark.sql import functions as F

from data_export_tool_spark.catalog import Catalog
from tests.conftest import record_opcheck
from data_export_tool_spark.operators.timeseries import fill_gaps, resample


def test_resample_matches_duckdb(spark, sf_dir):
    ev = Catalog(spark, sf_dir).load("events")
    got = {
        (r["event_type"], str(r["bucket_start"])[:10]): (r["n"], round(r["v"], 6))
        for r in resample(
            ev,
            "1 day",
            {
                "n": F.count(F.lit(1)),
                "v": F.round(
                    F.sum(F.col("value").cast("decimal(18,6)")).cast("double"), 6
                ),
            },
            keys=["event_type"],
        ).collect()
    }
    want = {
        (t, str(b)[:10]): (int(n), round(float(v), 6))
        for t, b, n, v in duckdb.sql(
            f"""
    SELECT event_type, date_trunc('day', ts) AS b,
           count(*) AS n, CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS v
    FROM read_parquet('{sf_dir}/events.parquet')
    WHERE ts IS NOT NULL GROUP BY 1, 2
    """
        ).fetchall()
    }
    record_opcheck("timeseries_resample", len(want), got == want)
    assert got == want


def test_fill_gaps_dense_axis_and_locf(spark):
    import datetime as dt

    t = lambda h: dt.datetime(2024, 3, 1, h, 0, 0)
    rows = [
        ("a", t(0), 10.0),
        ("a", t(1), 11.0),
        # gap: hours 2-3 missing
        ("a", t(4), 14.0),
        ("b", t(2), 20.0),
    ]
    df = spark.createDataFrame(rows, "k string, ts timestamp, value double")
    res = resample(
        df, "1 hour", {"n": F.count(F.lit(1)), "v": F.max("value")}, keys=["k"]
    )
    dense = fill_gaps(
        res, 3600, keys=["k"], locf_cols=["v"]
    ).orderBy("k", "bucket_start")
    got = [
        (r["k"], r["bucket_start"].hour, r["n"], r["v"], r["is_gap"])
        for r in dense.collect()
    ]
    assert got == [
        ("a", 0, 1, 10.0, False),
        ("a", 1, 1, 11.0, False),
        ("a", 2, None, 11.0, True),   # synthesized; v carried forward
        ("a", 3, None, 11.0, True),
        ("a", 4, 1, 14.0, False),
        ("b", 2, 1, 20.0, False),     # single-bucket key: no gaps
    ]
    # count column NOT in locf_cols stays NULL on gaps (honest zero via
    # coalesce at read time), while the gauge carries forward
    assert dense.where(F.col("is_gap") & F.col("n").isNotNull()).count() == 0


def test_fill_gaps_matches_duckdb_axis(spark, sf_dir):
    ev = Catalog(spark, sf_dir).load("events")
    res = resample(ev, "1 day", {"n": F.count(F.lit(1))}, keys=["event_type"])
    dense = fill_gaps(res, 86400, keys=["event_type"])
    got_axis = {
        (r["event_type"], str(r["bucket_start"])[:10]) for r in dense.collect()
    }
    want_axis = {
        (t, str(b)[:10])
        for t, b in duckdb.sql(
            f"""
    WITH res AS (
      SELECT event_type, date_trunc('day', ts) AS b
      FROM read_parquet('{sf_dir}/events.parquet') WHERE ts IS NOT NULL
      GROUP BY 1, 2
    ),
    bounds AS (
      SELECT event_type, min(b) lo, max(b) hi FROM res GROUP BY 1
    )
    SELECT event_type, unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS b
    FROM bounds
    """
        ).fetchall()
    }
    record_opcheck("timeseries_fill_gaps", len(want_axis), got_axis == want_axis)
    assert got_axis == want_axis
    # every original bucket present and not flagged as gap
    n_real = dense.where(~F.col("is_gap")).count()
    assert n_real == res.count()


# ---------------------------------------------------------------------------
# CUSUM change points
# ---------------------------------------------------------------------------


def _cusum_python(vals, k_sigma=0.5, h_sigma=5.0, mu=None, sd=None):
    """Textbook RECURSIVE two-sided CUSUM — the independent truth the
    closed-form window implementation must reproduce."""
    import statistics

    m = statistics.fmean(vals) if mu is None else mu
    s = (statistics.stdev(vals) if len(vals) > 1 else None) if sd is None else sd
    out = []
    sp = sn = 0.0
    for x in vals:
        if s is None:
            out.append((None, None, False, None))
            continue
        kap = k_sigma * s
        sp = max(0.0, sp + (x - m - kap))
        sn = max(0.0, sn + (m - x - kap))
        up = s > 0 and sp > h_sigma * s
        dn = s > 0 and sn > h_sigma * s
        d = "both" if (up and dn) else "up" if up else "down" if dn else None
        out.append((sp if s is not None else None, sn, up or dn, d))
    return out


def test_cusum_closed_form_equals_recursion(spark):
    """The windowed closed form S_t = A_t - min(0, min prefix A) must
    equal the non-aggregable textbook recursion, per key."""
    import random

    from data_export_tool_spark.operators.timeseries import cusum_changepoints

    rng = random.Random(7)
    rows = []
    series = {}
    base = datetime(2024, 1, 1)
    for key in ("a", "b", "c"):
        n = 40
        shift = 5.0 if key == "b" else 0.0
        vals = [rng.gauss(10.0 + (shift if i >= 25 else 0.0), 1.0) for i in range(n)]
        series[key] = vals
        rows += [(key, base + timedelta(hours=i), v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "key string, bucket_start timestamp, v double")
    got = {
        (r["key"], r["bucket_start"]): (r["s_pos"], r["s_neg"], r["is_change"], r["direction"])
        for r in cusum_changepoints(df, "v", keys=["key"]).collect()
    }
    n_ok = 0
    for key, vals in series.items():
        want = _cusum_python(vals)
        for i, (sp, sn, chg, d) in enumerate(want):
            g = got[(key, base + timedelta(hours=i))]
            assert g[0] == pytest.approx(sp, abs=1e-9)
            assert g[1] == pytest.approx(sn, abs=1e-9)
            assert (g[2], g[3]) == (chg, d)
            n_ok += 1
    record_opcheck("cusum_changepoints", n_ok, True, oracle="python-reference")
    # the shifted key must alarm after its change point and never before
    b_first_alarm = min(
        i for i in range(40)
        if got[("b", base + timedelta(hours=i))][2]
    )
    assert 25 <= b_first_alarm <= 32
    assert not any(got[("a", base + timedelta(hours=i))][2] for i in range(40))


def test_cusum_constant_and_single_series_never_alarm(spark):
    from data_export_tool_spark.operators.timeseries import cusum_changepoints

    base = datetime(2024, 1, 1)
    rows = [("const", base + timedelta(hours=i), 5.0) for i in range(10)]
    rows.append(("single", base, 99.0))
    df = spark.createDataFrame(rows, "key string, bucket_start timestamp, v double")
    out = cusum_changepoints(df, "v", keys=["key"]).collect()
    assert not any(r["is_change"] for r in out)


def test_cusum_explicit_reference_params(spark):
    """Explicit target/sigma from a reference period: a level shift
    alarms even though pooled estimation would desensitize."""
    from data_export_tool_spark.operators.timeseries import cusum_changepoints

    base = datetime(2024, 1, 1)
    vals = [10.0] * 5 + [13.0] * 5
    df = spark.createDataFrame(
        [("k", base + timedelta(hours=i), v) for i, v in enumerate(vals)],
        "key string, bucket_start timestamp, v double",
    )
    out = {
        r["bucket_start"]: r
        for r in cusum_changepoints(
            df, "v", keys=["key"], target=10.0, sigma=1.0, k_sigma=0.5, h_sigma=5.0
        ).collect()
    }
    flags = [out[base + timedelta(hours=i)]["is_change"] for i in range(10)]
    # s_pos accumulates 2.5/bucket from t=5: crosses 5.0 at t=7
    assert flags == [False] * 7 + [True] * 3
    assert out[base + timedelta(hours=8)]["direction"] == "up"


# ---------------------------------------------------------------------------
# Holt-Winters forecasting
# ---------------------------------------------------------------------------


def _hw_python(x, m, horizon, a, b, g):
    n = len(x)
    lvl = sum(x[:m]) / m
    trd = (sum(x[m:2 * m]) / m - sum(x[:m]) / m) / m
    season = [v - lvl for v in x[:m]]
    sse = 0.0
    for t in range(n):
        s = season[t % m]
        pred = lvl + trd + s
        if t >= m:
            sse += (x[t] - pred) ** 2
        new_lvl = a * (x[t] - s) + (1 - a) * (lvl + trd)
        trd = b * (new_lvl - lvl) + (1 - b) * trd
        season[t % m] = g * (x[t] - new_lvl) + (1 - g) * s
        lvl = new_lvl
    return [
        (h, lvl + h * trd + season[(n + h - 1) % m], sse)
        for h in range(1, horizon + 1)
    ]


def test_holt_winters_matches_python_replay(spark):
    import math
    import random

    from data_export_tool_spark.operators.timeseries import holt_winters_forecast

    rng = random.Random(13)
    base = datetime(2024, 1, 1)
    rows, series = [], {}
    for key in ("cpu", "mem"):
        n = 48
        vals = [
            50 + 10 * math.sin(2 * math.pi * (i % 12) / 12)
            + (0.5 if key == "cpu" else -0.2) * i
            + rng.gauss(0, 1)
            for i in range(n)
        ]
        series[key] = vals
        rows += [(key, base + timedelta(hours=i), v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "key string, bucket_start timestamp, v double")
    out = holt_winters_forecast(
        df, "v", "key", season_length=12, horizon=13,
        alpha=0.3, beta=0.1, gamma=0.2,
    ).collect()
    got = {(r["key"], r["h"]): (r["yhat"], r["sse"], r["forecast_ts"]) for r in out}
    n_ok = 0
    for key, vals in series.items():
        for h, yhat, sse in _hw_python(vals, 12, 13, 0.3, 0.1, 0.2):
            gy, gs, gt = got[(key, h)]
            assert gy == pytest.approx(yhat, abs=1e-9)
            assert gs == pytest.approx(sse, abs=1e-9)
            assert gt == base + timedelta(hours=47 + h)
            n_ok += 1
    record_opcheck("holt_winters_forecast", n_ok, True, oracle="python-reference")
    # the trend must be learned: compare SAME season phase one period
    # apart (h and h+12), so the seasonal term cancels
    assert got[("cpu", 13)][0] > got[("cpu", 1)][0]
    assert got[("mem", 13)][0] < got[("mem", 1)][0]


def test_holt_winters_contracts(spark):
    from data_export_tool_spark.operators.timeseries import holt_winters_forecast

    base = datetime(2024, 1, 1)
    short = spark.createDataFrame(
        [("k", base + timedelta(hours=i), 1.0) for i in range(5)],
        "key string, bucket_start timestamp, v double",
    )
    # < 2*season_length -> no rows for that key (not an error: other
    # keys may be long enough)
    assert holt_winters_forecast(short, "v", "key", season_length=4).count() == 0
    withnull = spark.createDataFrame(
        [("k", base + timedelta(hours=i), None if i == 3 else 1.0) for i in range(10)],
        "key string, bucket_start timestamp, v double",
    )
    import py4j

    with pytest.raises(Exception, match="fill gaps"):
        holt_winters_forecast(withnull, "v", "key", season_length=4).collect()
    with pytest.raises(ValueError):
        holt_winters_forecast(short, "v", "key", season_length=1)
    with pytest.raises(ValueError):
        holt_winters_forecast(short, "v", "key", season_length=4, alpha=1.0)


# ---------------------------------------------------------------------------
# Mann-Kendall trend
# ---------------------------------------------------------------------------


def _mk_python(vals, ts):
    import math
    from collections import Counter

    n = len(vals)
    s = 0.0
    slopes = []
    for i in range(n):
        for j in range(i + 1, n):
            d = vals[j] - vals[i]
            s += (d > 0) - (d < 0)
            if ts[j] != ts[i]:
                slopes.append(d / (ts[j] - ts[i]))
    ties = Counter(vals).values()
    var_s = (n * (n - 1) * (2 * n + 5) - sum(t * (t - 1) * (2 * t + 5) for t in ties)) / 18.0
    if var_s > 0:
        z = (s - 1) / math.sqrt(var_s) if s > 0 else ((s + 1) / math.sqrt(var_s) if s < 0 else 0.0)
    else:
        z = 0.0
    p = math.erfc(abs(z) / math.sqrt(2.0))
    slopes.sort()
    m = len(slopes)
    sen = 0.0 if m == 0 else (slopes[m // 2] if m % 2 else (slopes[m // 2 - 1] + slopes[m // 2]) / 2)
    return s, var_s, z, p, sen


def test_mann_kendall_matches_python_replay(spark):
    import random

    from data_export_tool_spark.operators.timeseries import mann_kendall_trend

    rng = random.Random(17)
    base = datetime(2024, 1, 1)
    rows, series = [], {}
    for key, slope in (("up", 0.4), ("flat", 0.0), ("down", -0.5)):
        vals = [10 + slope * i + rng.gauss(0, 1.0) for i in range(30)]
        series[key] = vals
        rows += [(key, base + timedelta(hours=i), v) for i, v in enumerate(vals)]
    # a tied constant series exercises the tie correction + var_s=0
    rows += [("const", base + timedelta(hours=i), 5.0) for i in range(10)]
    series["const"] = [5.0] * 10
    df = spark.createDataFrame(rows, "key string, bucket_start timestamp, v double")
    got = {r["key"]: r for r in mann_kendall_trend(df, "v", "key").collect()}
    n_ok = 0
    for key, vals in series.items():
        ts = [i * 3600.0 for i in range(len(vals))]
        s, var_s, z, p, sen = _mk_python(vals, ts)
        g = got[key]
        assert g["s"] == pytest.approx(s, abs=0)
        assert g["var_s"] == pytest.approx(var_s, abs=1e-9)
        assert g["z"] == pytest.approx(z, abs=1e-12)
        assert g["p_value"] == pytest.approx(p, abs=1e-12)
        assert g["sen_slope"] == pytest.approx(sen, abs=1e-12)
        n_ok += 1
    record_opcheck("mann_kendall_trend", n_ok, True, oracle="python-reference")
    assert got["up"]["direction"] == "up" and got["down"]["direction"] == "down"
    assert got["flat"]["direction"] == "none" and got["const"]["direction"] == "none"
    # Sen slope per hour ~ designed slope
    assert got["up"]["sen_slope"] * 3600 == pytest.approx(0.4, abs=0.15)


def test_mann_kendall_contracts(spark):
    from data_export_tool_spark.operators.timeseries import mann_kendall_trend

    base = datetime(2024, 1, 1)
    df = spark.createDataFrame(
        [("k", base, 1.0), ("k", base + timedelta(hours=1), None),
         ("k", base + timedelta(hours=2), 2.0),
         ("short", base, 1.0)],
        "key string, bucket_start timestamp, v double",
    )
    out = mann_kendall_trend(df, "v", "key").collect()
    # k has 2 usable points (<3) and short has 1 -> no rows
    assert out == []


def test_pelt_matches_exhaustive_optimal_partitioning(spark):
    """py_pelt_l2's pruned DP vs a brute-force optimal-partitioning
    replay (no pruning) on designed + pseudo-random series — exact
    optimum preserved; then the distributed per-key operator vs the
    shared DP on a resample grid with known level shifts."""
    import math

    import pytest

    from data_export_tool_spark.operators.timeseries import (
        pelt_changepoints,
        py_pelt_l2,
    )

    def brute(x, pen, min_size=2):
        n = len(x)
        S = [0.0] * (n + 1)
        S2 = [0.0] * (n + 1)
        for i, v in enumerate(x):
            S[i + 1] = S[i] + v
            S2[i + 1] = S2[i] + v * v

        def cost(a, b):
            m = b - a
            s = S[b] - S[a]
            return (S2[b] - S2[a]) - s * s / m

        INF = math.inf
        Fv = [INF] * (n + 1)
        Fv[0] = -pen
        last = [0] * (n + 1)
        for t in range(min_size, n + 1):
            for s in [0] + list(range(min_size, t - min_size + 1)):
                if t - s < min_size or Fv[s] == INF:
                    continue
                v = Fv[s] + cost(s, t) + pen
                if v < Fv[t]:
                    Fv[t], last[t] = v, s
        cps = []
        t = n
        while t > 0:
            s = last[t]
            if s > 0:
                cps.append(s)
            t = s
        return sorted(cps), Fv[n]

    series = [
        [1.0] * 10 + [9.0] * 10,
        [0.0] * 8 + [5.0] * 8 + [0.0] * 8,
        [float((i * 2654435761) % 97) / 10 for i in range(40)],
        [1.0] * 30,
        [3.0, 3.1] * 6 + [8.0, 8.2] * 6,
    ]
    n_ok = 0
    for x in series:
        for pen in (1.0, 5.0, 25.0):
            want_cps, _ = brute(x, pen)
            got_cps = py_pelt_l2(x, pen)
            assert got_cps == want_cps, (x[:4], pen, got_cps, want_cps)
            n_ok += 1
    # distributed operator: two keys with known shifts at bucket 24
    import datetime as dt

    rows = []
    t0 = dt.datetime(2024, 1, 1)
    for k, shift in (("a", 10.0), ("b", 0.0)):
        for i in range(48):
            v = (shift if i >= 24 else 0.0) + (i % 3) * 0.01
            rows.append((k, t0 + dt.timedelta(hours=i), v))
    df = spark.createDataFrame(rows, "k string, bucket_start timestamp, v double")
    segs = {}
    for r in pelt_changepoints(df, "v", "k").collect():
        segs.setdefault(r["k"], []).append((r["segment"], r["n"], r["mean"]))
    for k in segs:
        segs[k].sort()
    # key a: exactly two segments of 24 with means ~0.01 and ~10.01
    assert [s[1] for s in segs["a"]] == [24, 24]
    assert segs["a"][0][2] == pytest.approx(0.01, abs=1e-6)
    assert segs["a"][1][2] == pytest.approx(10.01, abs=1e-6)
    # key b: no change -> one whole-series segment
    assert [s[1] for s in segs["b"]] == [48]
    from tests.conftest import record_opcheck

    record_opcheck(
        "pelt_changepoints", n_ok + 3, True, oracle="python-reference"
    )
    with pytest.raises(Exception):
        pelt_changepoints(df, "v", "k", min_size=0).collect()


def test_ohlc_bars_match_duckdb(spark, sf_dir):
    """OHLC bars vs an exact DuckDB window replay (deterministic
    same-timestamp tie rule: open = min(value) at the earliest ts,
    close = max(value) at the latest ts), plus NULL exclusion."""
    import duckdb
    import pytest
    from pyspark.sql import functions as F

    from data_export_tool_spark.operators.timeseries import ohlc_bars

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    got = {
        (r["event_type"], str(r["bucket_start"])): (
            r["open"], r["high"], r["low"], r["close"], r["n"],
            round(r["volume"], 6),
        )
        for r in ohlc_bars(ev, "1 day", "value", keys=["event_type"]).collect()
    }
    want_rows = duckdb.sql(f"""
      WITH base AS (
        SELECT event_type, CAST(value AS DOUBLE) AS v,
               CAST(ts AS TIMESTAMP) AS ts,
               to_timestamp(CAST(floor(epoch(CAST(ts AS TIMESTAMP)) / 86400)
                                 * 86400 AS BIGINT)) AS w
        FROM '{sf_dir}/events.parquet'
        WHERE ts IS NOT NULL AND value IS NOT NULL
      )
      SELECT DISTINCT event_type, strftime(w, '%Y-%m-%d %H:%M:%S') AS w,
             first_value(v) OVER win AS open,
             max(v) OVER part AS high, min(v) OVER part AS low,
             last_value(v) OVER win AS close,
             count(*) OVER part AS n,
             round(sum(v) OVER part, 6) AS volume
      FROM base
      WINDOW win AS (PARTITION BY event_type, w ORDER BY ts, v
                     ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING),
             part AS (PARTITION BY event_type, w)
    """).fetchall()
    want = {
        (t, w): (o, h, l, c, int(n), v)
        for t, w, o, h, l, c, n, v in want_rows
    }
    assert set(got) == set(want)
    ok = all(
        got[k][4] == want[k][4]
        and all(
            got[k][i] == pytest.approx(want[k][i], abs=1e-6) for i in (0, 1, 2, 3, 5)
        )
        for k in want
    )
    record_opcheck("ohlc_bars", len(want) * 6, ok)
    assert ok
    # explicit tie pin: two readings at the same instant
    tie = spark.createDataFrame(
        [("k", "2024-01-01 00:00:00", 5.0),
         ("k", "2024-01-01 00:00:00", 1.0),
         ("k", "2024-01-01 10:00:00", 3.0),
         ("k", "2024-01-01 10:00:00", 9.0),
         ("k", "2024-01-01 05:00:00", None)],
        "k string, ts string, value double",
    ).select("k", F.col("ts").cast("timestamp").alias("ts"), "value")
    bar = ohlc_bars(tie, "1 day", "value", keys=["k"]).collect()[0]
    assert (bar["open"], bar["close"], bar["n"]) == (1.0, 9.0, 4)


def test_fill_gaps_locf_carries_through_null_observed(spark):
    """r10 keyed rewrite (lead-window + self-generating explode, no
    join): an OBSERVED bucket whose gauge is NULL must be LOCF-filled
    from the prior observed value, and gaps after it must carry that
    same value — the old dense-grain LOCF semantics, now produced by
    the observed-grain LOCF + inherit."""
    import datetime as dt

    t = lambda h: dt.datetime(2024, 3, 1, h, 0, 0)
    rows = [
        ("a", t(0), 5.0),
        ("a", t(1), None),  # observed bucket, NULL gauge
        # hours 2-3 missing entirely
        ("a", t(4), 9.0),
    ]
    df = spark.createDataFrame(rows, "k string, ts timestamp, v double")
    res = df.select(
        "k", F.date_trunc("hour", "ts").alias("bucket_start"), "v"
    )
    dense = fill_gaps(res, 3600, keys=["k"], locf_cols=["v"]).orderBy(
        "bucket_start"
    )
    got = [
        (r["bucket_start"].hour, r["v"], r["is_gap"]) for r in dense.collect()
    ]
    assert got == [
        (0, 5.0, False),
        (1, 5.0, False),  # observed NULL filled from h0
        (2, 5.0, True),   # gap after the NULL observation still carries 5.0
        (3, 5.0, True),
        (4, 9.0, False),
    ]
