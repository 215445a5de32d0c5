"""Data-quality validation suite vs DuckDB oracles (operators/validate.py).

Every metric the suite emits is recomputed by DuckDB SQL over the same
parquet and compared exactly — profiling and expectation counts are
deterministic, so the parity is bit-for-bit (no approx paths in tests
except the HLL smoke check, which asserts the documented error bound
rather than equality)."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from data_export_tool_spark.operators import validate as V
from tests.conftest import record_opcheck

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in ("orders", "lineitem", "customer"):
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    yield con
    con.close()


def test_profile_matches_duckdb_exact(spark, duck):
    cols = ["o_custkey", "o_orderstatus", "o_totalprice", "o_orderdate"]
    got = {
        r["column"]: r.asDict()
        for r in V.profile_columns(
            spark.read.parquet(f"{SF}/orders.parquet"), cols, exact_distinct=True
        ).collect()
    }
    oks = []
    for c in cols:
        o = duck.sql(
            f"SELECT count(*) AS n, count({c}) AS nn, count(DISTINCT {c}) AS nd,"
            f" CAST(min({c}) AS VARCHAR) AS mn, CAST(max({c}) AS VARCHAR) AS mx"
            " FROM orders"
        ).fetchone()
        g = got[c]
        # numeric/date renderings agree in value; normalize via str strip
        oks.append(
            g["n_rows"] == o[0]
            and g["n_null"] == o[0] - o[1]
            and g["n_distinct"] == o[2]
            and g["min_value"].rstrip("0").rstrip(".") == o[3].rstrip("0").rstrip(".")
            and g["max_value"].rstrip("0").rstrip(".") == o[4].rstrip("0").rstrip(".")
        )
    record_opcheck("validate_profile", len(cols), all(oks))
    assert all(oks), list(zip(cols, oks))


def test_profile_hll_within_bound(spark):
    prof = {
        r["column"]: r
        for r in V.profile_columns(
            spark.read.parquet(f"{SF}/orders.parquet"), ["o_custkey"], rsd=0.02
        ).collect()
    }
    exact = {
        r["column"]: r
        for r in V.profile_columns(
            spark.read.parquet(f"{SF}/orders.parquet"),
            ["o_custkey"],
            exact_distinct=True,
        ).collect()
    }
    nd, nde = prof["o_custkey"]["n_distinct"], exact["o_custkey"]["n_distinct"]
    assert abs(nd - nde) <= 0.1 * nde  # 5 sigma of the requested 2% rsd


def test_profile_single_aggregation_pass(spark):
    plan = V.profile_columns(
        spark.read.parquet(f"{SF}/orders.parquet"), ["o_custkey", "o_totalprice"]
    )._jdf.queryExecution().executedPlan().toString()
    # one scan, one partial+final aggregate pair, no join/window
    assert plan.count("Scan parquet") == 1
    assert "Window" not in plan and "Join" not in plan


def test_checks_match_duckdb(spark, duck):
    orders = spark.read.parquet(f"{SF}/orders.parquet")
    checks = [
        V.not_null("o_custkey"),
        V.in_range("o_totalprice", 0, 300000),
        V.in_set("o_orderstatus", ["O", "F", "P"]),
        V.matches("o_orderpriority", r"^\d-[A-Z ]+$"),
        V.unique("o_orderkey"),
        V.unique("o_custkey"),
        V.satisfies("positive_price", F.col("o_totalprice") > 0),
    ]
    got = {r["check"]: r.asDict() for r in V.run_checks(orders, checks).collect()}

    oracle = {
        "not_null(o_custkey)": "count(*) FILTER (o_custkey IS NULL)",
        "in_range(o_totalprice,0,300000)": "count(*) FILTER (o_totalprice IS NOT NULL AND o_totalprice NOT BETWEEN 0 AND 300000)",
        "in_set(o_orderstatus)": "count(*) FILTER (o_orderstatus IS NOT NULL AND o_orderstatus NOT IN ('O','F','P'))",
        "matches(o_orderpriority)": r"count(*) FILTER (o_orderpriority IS NOT NULL AND NOT regexp_matches(o_orderpriority, '^\d-[A-Z ]+$'))",
        "unique(o_orderkey)": "count(o_orderkey) - count(DISTINCT o_orderkey)",
        "unique(o_custkey)": "count(o_custkey) - count(DISTINCT o_custkey)",
        "positive_price": "count(*) FILTER (NOT coalesce(o_totalprice > 0, FALSE))",
    }
    n_rows = duck.sql("SELECT count(*) FROM orders").fetchone()[0]
    oks = {}
    for name, expr in oracle.items():
        want = duck.sql(f"SELECT {expr} FROM orders").fetchone()[0]
        oks[name] = (
            got[name]["violations"] == want
            and got[name]["n_rows"] == n_rows
            and got[name]["passed"] == (want == 0)
        )
    record_opcheck("validate_checks", len(oracle), all(oks.values()))
    assert all(oks.values()), oks
    # the battery over this clean fixture: FK/PK/format checks pass,
    # o_custkey is deliberately NOT unique
    assert not got["unique(o_custkey)"]["passed"]
    assert got["unique(o_orderkey)"]["passed"]


def test_checks_single_aggregation_pass(spark):
    orders = spark.read.parquet(f"{SF}/orders.parquet")
    plan = (
        V.run_checks(orders, [V.not_null("o_custkey"), V.in_range("o_totalprice", 0, 1e9)])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Scan parquet") == 1
    assert "Join" not in plan and "Window" not in plan


def test_referential_integrity_clean_and_dirty(spark, duck):
    orders = spark.read.parquet(f"{SF}/orders.parquet")
    customer = spark.read.parquet(f"{SF}/customer.parquet")
    clean = V.referential_integrity(orders, "o_custkey", customer, "c_custkey")
    want = duck.sql(
        "SELECT count(*) FROM orders o WHERE o.o_custkey IS NOT NULL AND"
        " NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)"
    ).fetchone()[0]
    record_opcheck("validate_referential_integrity", 1, clean.count() == want == 0)
    assert clean.count() == want == 0

    dirty = orders.unionByName(
        orders.limit(3).withColumn("o_custkey", F.col("o_custkey") + F.lit(10_000_000))
    )
    orphans = V.referential_integrity(
        dirty, "o_custkey", customer, "c_custkey", broadcast_parent=True
    )
    assert orphans.count() == 3
    assert all(r["o_custkey"] > 10_000_000 for r in orphans.collect())
    # null FKs are not orphans
    withnull = orders.unionByName(
        orders.limit(2).withColumn("o_custkey", F.lit(None).cast("long"))
    )
    assert (
        V.referential_integrity(withnull, "o_custkey", customer, "c_custkey").count()
        == 0
    )


def test_referential_integrity_plans_anti_join(spark):
    orders = spark.read.parquet(f"{SF}/orders.parquet")
    customer = spark.read.parquet(f"{SF}/customer.parquet")
    plan = (
        V.referential_integrity(
            orders, "o_custkey", customer, "c_custkey", broadcast_parent=True
        )
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "LeftAnti" in plan
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoop" not in plan


def test_schema_drift(spark):
    old = T.StructType(
        [
            T.StructField("a", T.LongType()),
            T.StructField("b", T.StringType()),
            T.StructField("c", T.ArrayType(T.FloatType())),
        ]
    )
    new = T.StructType(
        [
            T.StructField("a", T.DoubleType()),  # retyped
            T.StructField("c", T.ArrayType(T.FloatType())),  # unchanged
            T.StructField("d", T.DateType()),  # added
        ]
    )
    diff = V.schema_drift(old, new)
    assert diff == [
        {"column": "a", "change": "retyped", "before": "bigint", "after": "double"},
        {"column": "b", "change": "removed", "before": "string", "after": None},
        {"column": "d", "change": "added", "before": None, "after": "date"},
    ]
    ddf = V.schema_drift_df(spark, old, new)
    assert [r["change"] for r in ddf.orderBy("column").collect()] == [
        "retyped",
        "removed",
        "added",
    ]
    # identical schemas → empty diff, and DataFrame inputs accepted
    df = spark.range(3).withColumn("x", F.lit("s"))
    assert V.schema_drift(df, df) == []


def test_empty_requests_return_typed_empty(spark):
    """Review finding: stack(0, ) was a ParseException. Empty check /
    column requests must return correctly-typed empty results."""
    df = spark.read.parquet(f"{SF}/orders.parquet")
    p = V.profile_columns(df, [])
    assert p.count() == 0
    assert p.columns == [
        "column", "n_rows", "n_null", "null_frac", "n_distinct",
        "min_value", "max_value",
    ]
    c = V.run_checks(df, [])
    assert c.count() == 0
    assert c.columns == ["check", "n_rows", "violations", "passed"]


def test_hostile_column_names_profile(spark, tmp_path):
    """Review finding: quotes/backticks in legal parquet column names
    broke the interpolated stack() SQL."""
    path = str(tmp_path / "hostile.parquet")
    spark.createDataFrame([(1, "a"), (2, None)]).toDF(
        "o'clock", "a`b"
    ).write.parquet(path)
    prof = {
        r["column"]: r.asDict()
        for r in V.profile_columns(
            spark.read.parquet(path), exact_distinct=True
        ).collect()
    }
    assert prof["o'clock"]["n_distinct"] == 2
    assert prof["a`b"]["n_null"] == 1
    checks = V.run_checks(
        spark.read.parquet(path), [V.not_null("`a``b`")]
    )
    assert checks.collect()[0]["violations"] == 1


def test_profile_drift(spark):
    orders = spark.read.parquet(f"{SF}/orders.parquet")
    old = V.profile_columns(orders, ["o_custkey", "o_totalprice"], exact_distinct=True)
    # perturbed snapshot: o_custkey nulled for half the rows, a column dropped
    perturbed = orders.withColumn(
        "o_custkey",
        F.when(F.col("o_orderkey") % 2 == 0, F.col("o_custkey")),
    )
    new = V.profile_columns(perturbed, ["o_custkey"], exact_distinct=True)
    got = {r["column"]: r.asDict() for r in V.profile_drift(old, new).collect()}

    assert got["o_totalprice"]["status"] == "removed"
    assert got["o_totalprice"]["flagged"]
    c = got["o_custkey"]
    assert c["status"] == "common"
    assert c["null_frac_delta"] > 0.4  # half the keys nulled
    assert c["flagged"]
    # identical profiles -> nothing flagged
    same = {r["column"]: r["flagged"] for r in V.profile_drift(old, old).collect()}
    assert same == {"o_custkey": False, "o_totalprice": False}


def test_correlation_matrix_matches_duckdb(spark, sf_dir):
    import duckdb

    from data_export_tool_spark.operators.validate import correlation_matrix

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    cols = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]
    got = {
        (r["col_a"], r["col_b"]): (r["corr"], r["n"])
        for r in correlation_matrix(li, cols).collect()
    }
    ok = len(got) == 6
    for (a, b), (r_got, n_got) in got.items():
        r_want, n_want = duckdb.sql(
            f"""SELECT corr({a}, {b}), count(*) FROM
                read_parquet('{sf_dir}/lineitem.parquet')
                WHERE {a} IS NOT NULL AND {b} IS NOT NULL"""
        ).fetchone()
        ok = ok and n_got == int(n_want)
        if r_want is None:
            ok = ok and r_got is None
        else:
            ok = ok and abs(r_got - float(r_want)) < 1e-9
    from tests.conftest import record_opcheck

    record_opcheck("correlation_matrix", len(got), ok)
    assert ok


def test_correlation_matrix_nulls_and_constant(spark):
    import pytest as _pytest

    from data_export_tool_spark.operators.validate import correlation_matrix

    df = spark.createDataFrame(
        [(1.0, 2.0, 5.0), (2.0, 4.0, 5.0), (3.0, None, 5.0), (4.0, 8.0, 5.0)],
        "x double, y double, k double",
    )
    got = {
        (r["col_a"], r["col_b"]): (r["corr"], r["n"])
        for r in correlation_matrix(df, ["x", "y", "k"]).collect()
    }
    r, n = got[("x", "y")]
    assert n == 3 and abs(r - 1.0) < 1e-12  # perfectly linear where both present
    assert got[("x", "k")][0] is None  # constant column: undefined corr
    assert got[("x", "k")][1] == 4
    with _pytest.raises(ValueError):
        correlation_matrix(df, ["x"])


def test_categorical_association_matches_duckdb(spark, sf_dir):
    """Cramér's V over (lang, source) + the determinism/independence
    ground truths, vs an exact DuckDB chi-square replay."""
    import duckdb

    from data_export_tool_spark.operators.validate import categorical_association

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    got = {
        (r["col_a"], r["col_b"]): (
            r["n"], round(r["chi2"], 9), round(r["cramers_v"], 9), r["n_cells"]
        )
        for r in categorical_association(docs, ["lang", "source"]).collect()
    }
    want_row = duckdb.sql(
        f"""
    WITH base AS (
      SELECT coalesce(CAST(lang AS VARCHAR), '∅') AS a,
             coalesce(CAST(source AS VARCHAR), '∅') AS b
      FROM read_parquet('{sf_dir}/documents.parquet')
    ),
    cells AS (SELECT a, b, count(*) AS o FROM base GROUP BY 1, 2),
    ra AS (SELECT a, sum(o) AS an FROM cells GROUP BY 1),
    cb AS (SELECT b, sum(o) AS bn FROM cells GROUP BY 1),
    n AS (SELECT sum(o) AS n FROM cells),
    grid AS (
      SELECT ra.a, cb.b, ra.an * cb.bn / n.n AS e,
             coalesce(cells.o, 0) AS o
      FROM ra CROSS JOIN cb CROSS JOIN n
      LEFT JOIN cells ON cells.a = ra.a AND cells.b = cb.b
    ),
    chi AS (SELECT sum((o - e) * (o - e) / e) AS chi2 FROM grid),
    k AS (SELECT least((SELECT count(*) FROM ra), (SELECT count(*) FROM cb)) - 1 AS k)
    SELECT (SELECT n FROM n), (SELECT chi2 FROM chi),
           sqrt((SELECT chi2 FROM chi) / ((SELECT n FROM n) * (SELECT k FROM k))),
           (SELECT count(*) FROM cells)
    """
    ).fetchone()
    want = (
        int(want_row[0]), round(float(want_row[1]), 9),
        round(float(want_row[2]), 9), int(want_row[3]),
    )
    ok = got[("lang", "source")] == want
    record_opcheck("categorical_association", want[3], ok)
    assert ok


def test_categorical_association_truth_poles(spark):
    from data_export_tool_spark.operators.validate import categorical_association

    import pytest as _pt

    # perfect determination: b = f(a) -> V = 1; independence -> V ~ 0
    rows = [(a, a * 10, b) for a in range(4) for b in range(4) for _ in range(5)]
    df = spark.createDataFrame(rows, "a int, det int, ind int")
    got = {
        (r["col_a"], r["col_b"]): r["cramers_v"]
        for r in categorical_association(df, ["a", "det", "ind"]).collect()
    }
    assert got[("a", "det")] == _pt.approx(1.0)
    assert got[("a", "ind")] == _pt.approx(0.0, abs=1e-12)
    with _pt.raises(ValueError):
        categorical_association(df, ["a"])


def test_benford_audit_matches_python_replay(spark, sf_dir):
    """First-digit shares, chi2 and MAD vs an exact python replay over
    lineitem prices (naturally multi-magnitude -> conforms) and a
    designed uniform column (violates), plus small-n and zero/NULL
    exclusion contracts."""
    import math

    import pytest
    from pyspark.sql import functions as F

    from data_export_tool_spark.operators.validate import benford_audit

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        F.col("l_extendedprice").cast("double").alias("price"),
        # uniform 5xxxx values: first digit always 5 -> flagrant violation
        (50000 + F.col("l_orderkey") % 10000).cast("double").alias("rigged"),
    )
    out = {r["column"]: r for r in benford_audit(li, ["price", "rigged"]).collect()}
    # python replay on price
    vals = [r["price"] for r in li.collect() if r["price"] and abs(r["price"]) > 0]
    firsts = {}
    for v in vals:
        # exact extraction: first significant digit of the shortest
        # round-trip repr — NO decimal rounding (the old :.10f replay
        # shared the operator's format_number rounding bug)
        d = int(next(c for c in repr(abs(v)) if c in "123456789"))
        firsts[d] = firsts.get(d, 0) + 1
    n = sum(firsts.values())
    chi2 = mad = 0.0
    for d in range(1, 10):
        obs = firsts.get(d, 0) / n
        exp = math.log10(1 + 1 / d)
        chi2 += n * (obs - exp) ** 2 / exp
        mad += abs(obs - exp) / 9
    r = out["price"]
    assert r["n"] == n
    assert r["chi2"] == pytest.approx(chi2, rel=1e-6)
    assert r["mad"] == pytest.approx(mad, abs=1e-6)  # operator rounds to 6dp
    for d in range(1, 10):
        assert r[f"p{d}"] == pytest.approx(firsts.get(d, 0) / n, abs=1e-6)
    record_opcheck("benford_audit", 12, True, oracle="python-reference")
    # the rigged column is called out
    assert out["rigged"]["conforms"] is False
    assert out["rigged"]["p5"] == pytest.approx(1.0, abs=1e-9)
    # small-n: conforms NULL, not a verdict
    tiny = spark.createDataFrame([(1.0,), (2.0,), (0.0,), (None,)], "x double")
    t = benford_audit(tiny, "x").collect()[0]
    assert t["n"] == 2 and t["conforms"] is None
    # ADVICE r7 edge values: just-below-a-power-of-ten must count as 9
    # (format_number rounded it to '10.000…' → digit 1), and nonzero
    # values < 5e-11 must still be counted, not rounded to all zeros
    from data_export_tool_spark.operators.validate import (
        first_significant_digit,
    )

    edges = spark.createDataFrame(
        [(9.99999999999,), (9.999999999999998e22,), (4.9e-12,), (1e-300,),
         (0.042,), (-735.2,), (0.0,), (None,), (float("nan",),)],
        "x double",
    )
    got = [
        r["d"]
        for r in edges.select(first_significant_digit(F.col("x")).alias("d"))
        .collect()
    ]
    assert got[:6] == ["9", "9", "4", "1", "4", "7"] and got[6:] == [
        None, None, None,
    ]
    import pytest as _pt

    with _pt.raises(ValueError):
        benford_audit(tiny, [])
