

def test_asof_tolerance_and_strict(spark):
    """pandas merge_asof parity knobs: tolerance bands the match
    window; allow_exact=False makes the comparison strict. DuckDB
    ASOF JOIN has no tolerance, so the oracle is the equivalent
    windowed correlated query."""
    import duckdb

    from data_export_tool_spark.operators.asof import asof_join

    left = spark.createDataFrame(
        [(1, 100), (1, 200), (2, 50)], "k long, t long"
    )
    right = spark.createDataFrame(
        [(1, 90, "a"), (1, 100, "b"), (1, 260, "c"), (2, 10, "d")],
        "k long, rt long, v string",
    )
    # plain backward: exact match at 100 wins for t=100
    got = {
        (r["k"], r["t"]): r["v"]
        for r in asof_join(left, right, ["k"], "t", "rt").collect()
    }
    assert got == {(1, 100): "b", (1, 200): "b", (2, 50): "d"}
    # strict: the exact 100 row is excluded for t=100
    strict = {
        (r["k"], r["t"]): r["v"]
        for r in asof_join(
            left, right, ["k"], "t", "rt", allow_exact=False
        ).collect()
    }
    assert strict == {(1, 100): "a", (1, 200): "b", (2, 50): "d"}
    # tolerance 30: t=50's only candidate (rt=10) is 40 behind — out
    tol = {
        (r["k"], r["t"]): r["v"]
        for r in asof_join(
            left, right, ["k"], "t", "rt", tolerance=30
        ).collect()
    }
    assert tol == {(1, 100): "b", (1, 200): None, (2, 50): None}
    # forward with tolerance: t=200 -> rt=260 is 60 ahead; tol 50 cuts
    fwd = {
        (r["k"], r["t"]): r["v"]
        for r in asof_join(
            left, right, ["k"], "t", "rt", direction="forward",
            tolerance=50,
        ).collect()
    }
    assert fwd == {(1, 100): "b", (1, 200): None, (2, 50): None}

    con = duckdb.connect()
    con.execute("CREATE TABLE l (k BIGINT, t BIGINT)")
    con.executemany("INSERT INTO l VALUES (?, ?)",
                    [(1, 100), (1, 200), (2, 50)])
    con.execute("CREATE TABLE r (k BIGINT, rt BIGINT, v VARCHAR)")
    con.executemany(
        "INSERT INTO r VALUES (?, ?, ?)",
        [(1, 90, "a"), (1, 100, "b"), (1, 260, "c"), (2, 10, "d")],
    )
    want = {
        (int(k), int(t)): v
        for k, t, v in con.sql(
            """
            SELECT k, t, (
              SELECT v FROM r
              WHERE r.k = l.k AND r.rt <= l.t AND l.t - r.rt <= 30
              ORDER BY r.rt DESC LIMIT 1
            ) FROM l
            """
        ).fetchall()
    }
    assert tol == want
    from tests.conftest import record_opcheck

    record_opcheck("asof_tolerance", len(want), True, oracle="duckdb")


def test_asof_timestamp_tolerance(spark):
    from data_export_tool_spark.operators.asof import asof_join

    left = spark.createDataFrame(
        [(1, "2024-01-10")], "k long, d string"
    ).selectExpr("k", "cast(d as timestamp) AS t")
    right = spark.createDataFrame(
        [(1, "2024-01-01", "old"), (1, "2024-01-08", "fresh")],
        "k long, d string, v string",
    ).selectExpr("k", "cast(d as timestamp) AS rt", "v")
    got = asof_join(
        left, right, ["k"], "t", "rt", tolerance="5 days"
    ).select("v").first()
    assert got["v"] == "fresh"
    none = asof_join(
        left, right, ["k"], "t", "rt", tolerance="1 days"
    ).select("v").first()
    assert none["v"] is None


def test_asof_tolerance_validation(spark):
    import datetime

    import pytest

    from data_export_tool_spark.operators.asof import asof_join

    left = spark.createDataFrame(
        [(1, "2024-01-10")], "k long, d string"
    ).selectExpr("k", "cast(d as timestamp) AS t")
    right = spark.createDataFrame(
        [(1, "2024-01-08", "fresh")], "k long, d string, v string"
    ).selectExpr("k", "cast(d as timestamp) AS rt", "v")
    # malformed strings raise a readable ValueError at call time, not a
    # SQL parse error at plan time
    for bad in ("bananas", "INTERVAL 5 DAY", "5 fortnights", "-3 days"):
        with pytest.raises(ValueError, match="tolerance"):
            asof_join(left, right, ["k"], "t", "rt", tolerance=bad)
    with pytest.raises(ValueError, match="tolerance"):
        asof_join(left, right, ["k"], "t", "rt", tolerance=-5)
    with pytest.raises(ValueError, match="tolerance"):
        asof_join(
            left, right, ["k"], "t", "rt",
            tolerance=datetime.timedelta(days=-1),
        )
    # a timedelta works like the equivalent interval string
    got = asof_join(
        left, right, ["k"], "t", "rt",
        tolerance=datetime.timedelta(days=5),
    ).select("v").first()
    assert got["v"] == "fresh"
    none = asof_join(
        left, right, ["k"], "t", "rt",
        tolerance=datetime.timedelta(days=1),
    ).select("v").first()
    assert none["v"] is None


def test_asof_compound_interval_tolerance(spark):
    """ADVICE r9: compound multi-unit SQL intervals ('1 day 12 hours')
    are valid tolerance strings again — one or more '<n> <unit>'
    groups, still rejecting embedded 'INTERVAL'."""
    from data_export_tool_spark.operators.asof import asof_join

    left = spark.createDataFrame(
        [(1, "2024-01-10 12:00:00")], "k long, d string"
    ).selectExpr("k", "cast(d as timestamp) AS t")
    right = spark.createDataFrame(
        [(1, "2024-01-09 06:00:00", "fresh"), (1, "2024-01-05 00:00:00", "old")],
        "k long, d string, v string",
    ).selectExpr("k", "cast(d as timestamp) AS rt", "v")
    # 1 day 12 hours back from 01-10 12:00 reaches 01-09 00:00 — the
    # 01-09 06:00 row is in band, the 01-05 row is not
    got = asof_join(
        left, right, ["k"], "t", "rt", tolerance="1 day 12 hours"
    ).select("v").first()
    assert got["v"] == "fresh"
    # 1 day 2 hours only reaches 01-09 10:00 — nothing in band
    none = asof_join(
        left, right, ["k"], "t", "rt", tolerance="1 day 2 hours"
    ).select("v").first()
    assert none["v"] is None
