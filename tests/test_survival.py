"""Kaplan-Meier (operators/survival.py): hand-computed textbook
values, a DuckDB window-function replay over events-derived durations,
the censoring/tie conventions, the zero-survival guard, and the
bounded-grain plan shape."""

from __future__ import annotations

import duckdb
import pytest

from tests.conftest import record_opcheck
from data_export_tool_spark.operators.survival import km_survival, logrank_test

# classic worked example (e.g. Klein & Moeschberger): durations with
# censoring interleaved
ROWS = [
    (6, 1), (6, 1), (6, 1), (6, 0),
    (7, 1), (9, 0), (10, 1), (10, 0),
    (11, 0), (13, 1), (16, 1), (17, 0),
    (19, 0), (20, 0), (22, 1), (23, 1),
    (25, 0), (32, 0), (32, 0), (34, 0), (35, 0),
]


def _km_python(rows):
    """Independent O(n²) truth: survival/(greenwood se) per distinct t."""
    import math

    times = sorted({t for t, _ in rows})
    out = {}
    s, gw = 1.0, 0.0
    zero = False
    for t in times:
        d = sum(1 for tt, e in rows if tt == t and e == 1)
        c = sum(1 for tt, e in rows if tt == t and e == 0)
        n = sum(1 for tt, _ in rows if tt >= t)
        if d == n:
            zero = True
        if not zero:
            s *= 1 - d / n
        if d < n:
            gw += d / (n * (n - d))
        surv = 0.0 if zero else s
        out[t] = (n, d, c, surv, surv * math.sqrt(gw))
    return out


def test_km_matches_textbook_replay(spark):
    df = spark.createDataFrame(ROWS, "dur int, ev int")
    got = {
        r["t"]: (
            r["n_risk"], r["n_events"], r["n_censored"],
            r["survival"], r["se"],
        )
        for r in km_survival(df, "dur", "ev").collect()
    }
    want = _km_python(ROWS)
    assert set(got) == set(want)
    for t in want:
        assert got[t][:3] == want[t][:3]
        assert got[t][3] == pytest.approx(want[t][3], abs=1e-12)
        assert got[t][4] == pytest.approx(want[t][4], abs=1e-12)
    # spot-pin the first steps: 6: 1-3/21; 7: *(1-1/17)
    assert got[6][3] == pytest.approx(18 / 21)
    assert got[7][3] == pytest.approx((18 / 21) * (16 / 17))


def test_km_zero_survival_guard(spark):
    # everyone at risk dies at t=5 -> survival exactly 0 from there,
    # even with a later (impossible in practice, legal in data) row
    df = spark.createDataFrame(
        [(2, 1), (5, 1), (5, 1)], "dur int, ev int"
    )
    got = {r["t"]: r["survival"] for r in km_survival(df, "dur", "ev").collect()}
    assert got[2] == pytest.approx(2 / 3)
    assert got[5] == 0.0


def test_km_grouped_matches_duckdb(spark, sf_dir):
    """Cohorted KM over events-derived user durations vs a DuckDB
    window replay of the same formula."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    from pyspark.sql import functions as F

    durs = (
        ev.groupBy("user_id")
        .agg(
            F.datediff(F.max("ts"), F.min("ts")).alias("dur"),
            F.max((F.col("event_type") == "error").cast("int")).alias("ev"),
            (F.min("user_id") % 3).alias("cohort"),
        )
    )
    got = [
        (
            r["cohort"], r["t"], r["n_risk"], r["n_events"], r["n_censored"],
            round(r["survival"], 9), round(r["se"], 9),
        )
        for r in km_survival(durs, "dur", "ev", group_col="cohort")
        .orderBy("cohort", "t")
        .collect()
    ]
    want = [
        (int(a), int(b), int(c), int(d), int(e), round(float(f), 9), round(float(g), 9))
        for a, b, c, d, e, f, g in duckdb.sql(
            f"""
        WITH durs AS (
          SELECT user_id,
                 date_diff('day', min(ts), max(ts)) AS dur,
                 max(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS ev,
                 min(user_id) % 3 AS cohort
          FROM read_parquet('{sf_dir}/events.parquet')
          GROUP BY user_id
        ),
        grid AS (
          SELECT cohort, dur AS t, sum(ev) AS d, sum(1 - ev) AS c
          FROM durs GROUP BY 1, 2
        ),
        g2 AS (
          SELECT *,
                 sum(d + c) OVER (PARTITION BY cohort ORDER BY t
                   ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS n
          FROM grid
        ),
        g3 AS (
          SELECT *,
                 sum(CASE WHEN d = n THEN 1 ELSE 0 END) OVER w AS zeros,
                 sum(CASE WHEN d < n THEN ln(1 - d / CAST(n AS DOUBLE)) ELSE 0 END)
                   OVER w AS logsum,
                 sum(CASE WHEN d < n THEN d / (n * CAST(n - d AS DOUBLE)) ELSE 0 END)
                   OVER w AS gw
          FROM g2
          WINDOW w AS (PARTITION BY cohort ORDER BY t
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        )
        SELECT cohort, t, n, d, c,
               CASE WHEN zeros > 0 THEN 0.0 ELSE exp(logsum) END AS survival,
               CASE WHEN zeros > 0 THEN 0.0 ELSE exp(logsum) END * sqrt(gw) AS se
        FROM g3 ORDER BY cohort, t
        """
        ).fetchall()
    ]
    record_opcheck("km_survival", len(want), got == want)
    assert got == want and len(want) > 0


def test_km_null_exclusion_and_plan(spark):
    df = spark.createDataFrame(
        [(1, 1), (None, 1), (2, None), (2, 0)],
        "dur int, ev int",
    )
    out = km_survival(df, "dur", "ev")
    rows = {r["t"]: r for r in out.collect()}
    assert set(rows) == {1, 2}
    assert rows[1]["n_risk"] == 2  # NULL rows excluded
    # subject grain collapses BEFORE any window: the plan's first
    # exchange is the partial-aggregated groupBy, not a sort
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "HashAggregate" in plan


def _logrank_python(rows):
    """Independent textbook replay: rows = (dur, event, group01)."""
    import math

    times = sorted({t for t, e, _ in rows if e == 1})
    o1 = e1 = v = 0.0
    for t in times:
        d = sum(1 for tt, e, _ in rows if tt == t and e == 1)
        d1 = sum(1 for tt, e, g in rows if tt == t and e == 1 and g == 1)
        n = sum(1 for tt, _, _ in rows if tt >= t)
        n1 = sum(1 for tt, _, g in rows if tt >= t and g == 1)
        o1 += d1
        e1 += d * n1 / n
        if n > 1:
            v += d * (n1 / n) * (1 - n1 / n) * (n - d) / (n - 1)
    z = (o1 - e1) / math.sqrt(v) if v > 0 else 0.0
    return o1, e1, v, z, math.erfc(abs(z) / math.sqrt(2.0))


def test_logrank_matches_python_replay(spark):
    import random

    rng = random.Random(5)
    rows = []
    # group 'b' has systematically shorter durations -> should reject
    for g, scale in (("a", 20), ("b", 9)):
        for _ in range(120):
            rows.append(
                (max(1, int(rng.expovariate(1 / scale))), rng.random() < 0.8, g)
            )
    df = spark.createDataFrame(
        [(t, int(e), g) for t, e, g in rows], "dur int, ev int, grp string"
    )
    got = logrank_test(df, "dur", "ev", "grp").collect()[0]
    o1, e1, v, z, p = _logrank_python(
        [(t, int(e), 1 if g == "a" else 0) for t, e, g in rows]
    )
    assert (got["group_1"], got["group_2"]) == ("a", "b")
    assert got["observed_1"] == pytest.approx(o1, abs=1e-9)
    assert got["expected_1"] == pytest.approx(e1, abs=1e-9)
    assert got["variance"] == pytest.approx(v, abs=1e-9)
    assert got["z"] == pytest.approx(z, abs=1e-9)
    assert got["p_value"] == pytest.approx(p, abs=1e-12)
    assert got["p_value"] < 0.01  # the designed effect is detected
    record_opcheck("logrank_test", len(rows), True, oracle="python-reference")


def test_logrank_identical_groups_null(spark):
    rows = [(i % 10 + 1, 1, g) for g in ("x", "y") for i in range(50)]
    df = spark.createDataFrame(rows, "dur int, ev int, grp string")
    got = logrank_test(df, "dur", "ev", "grp").collect()[0]
    assert got["z"] == pytest.approx(0.0, abs=1e-12)
    assert got["p_value"] == pytest.approx(1.0)


def test_logrank_requires_two_groups(spark):
    df = spark.createDataFrame([(1, 1, "only")], "dur int, ev int, grp string")
    with pytest.raises(ValueError):
        logrank_test(df, "dur", "ev", "grp")
