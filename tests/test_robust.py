"""Per-key MAD outlier detection vs a DuckDB median/quantile_cont
replay, plus the mad=0 and NULL contracts."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from tests.conftest import record_opcheck
from data_export_tool_spark.operators.robust import mad_outliers


def test_mad_outliers_matches_duckdb(spark, sf_dir):
    li = (
        spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        .select(
            "l_orderkey",
            "l_linenumber",
            "l_returnflag",
            F.col("l_extendedprice").cast("double").alias("price"),
        )
        # deterministic subset: limit() re-picks rows per evaluation,
        # so operator and oracle would see different data
        .where(F.col("l_orderkey") % 29 == 0)
    )
    # k = 1.2: synthetic prices are near-uniform (max modified-z
    # ~1.4), so the standard 3.5 would flag nothing and the
    # separation assertion below would be vacuous
    out = mad_outliers(li, "price", by=["l_returnflag"], k=1.2)
    # the driver's synthetic lineitem has DUPLICATE (orderkey,
    # linenumber) keys, so compare sorted row multisets, not a dict
    got = sorted(
        (
            r["l_orderkey"], r["l_linenumber"], r["price"],
            round(r["group_median"], 6), round(r["group_mad"], 6),
            r["robust_z"], r["is_outlier"],
        )
        for r in out.collect()
    )
    con = duckdb.connect()
    con.register("li", li.toPandas())
    want = sorted(
        (
            int(o), int(ln), p, round(m, 6), round(d, 6),
            round(z, 6) if z is not None else None, f,
        )
        for o, ln, p, m, d, z, f in con.sql(
            """
        WITH med AS (
          SELECT l_returnflag, quantile_cont(price, 0.5) AS m
          FROM li GROUP BY 1
        ), mad AS (
          SELECT li.l_returnflag,
                 quantile_cont(abs(li.price - med.m), 0.5) AS d
          FROM li JOIN med USING (l_returnflag) GROUP BY 1
        )
        SELECT li.l_orderkey, li.l_linenumber, li.price, med.m, mad.d,
               CASE WHEN mad.d > 0
                    THEN round(0.6745 * (li.price - med.m) / mad.d, 6) END,
               CASE WHEN mad.d > 0
                    THEN abs(0.6745 * (li.price - med.m) / mad.d) > 1.2
                    ELSE li.price != med.m END
        FROM li JOIN med USING (l_returnflag) JOIN mad USING (l_returnflag)
        """
        ).fetchall()
    )
    assert len(got) == len(want)
    n_out = 0
    for g, w in zip(got, want):
        assert g[:2] == w[:2] and g[2] == pytest.approx(w[2])
        assert g[3] == pytest.approx(w[3], rel=1e-9)
        assert g[4] == pytest.approx(w[4], rel=1e-9)
        if w[5] is None:
            assert g[5] is None, (g, w)
        else:
            assert g[5] == pytest.approx(w[5], abs=2e-6), (g, w)
        assert g[6] == w[6], (g, w)
        n_out += bool(w[6])
    assert 0 < n_out < len(want)  # the rule actually separates
    record_opcheck("mad_outliers", len(want), True, oracle="duckdb")


def test_mad_outliers_contracts(spark):
    # mad = 0: over half the group is one value -> z NULL, flagged iff
    # different from the median; NULL values pass through unflagged
    df = spark.createDataFrame(
        [("g", 5.0), ("g", 5.0), ("g", 5.0), ("g", 9.0), ("g", None)],
        "k string, v double",
    )
    got = {
        (r["v"],): (r["robust_z"], r["is_outlier"])
        for r in mad_outliers(df, "v", by="k").collect()
    }
    assert got[(5.0,)] == (None, False)
    assert got[(9.0,)] == (None, True)
    assert got[(None,)] == (None, None)
    # ungrouped (global) mode works and the approx path agrees on an
    # easy distribution
    g = spark.createDataFrame(
        [(float(i),) for i in range(101)] + [(1e6,)], "v double"
    )
    exact = {r["v"]: r["is_outlier"] for r in mad_outliers(g, "v").collect()}
    approx = {
        r["v"]: r["is_outlier"]
        for r in mad_outliers(g, "v", approx=True).collect()
    }
    assert exact[1e6] and approx[1e6]
    assert sum(exact.values()) == sum(approx.values()) == 1
    with pytest.raises(ValueError):
        mad_outliers(g, "v", k=0)
