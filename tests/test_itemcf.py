"""Item-item CF (operators/itemcf.py): DuckDB relational oracle on
coarsened co-purchase data, hand cosine case, hot-user cap laws."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_export_tool_spark.operators.itemcf import (
    item_item_recommend,
    item_item_topk,
)

_UI = """
SELECT DISTINCT l_orderkey AS u, l_partkey % 211 AS i
FROM read_parquet('{d}/lineitem.parquet')
"""


def test_itemcf_hand_case(spark):
    # users 1..3: {a,b}, {a,b}, {a,c}
    rows = [(1, "a"), (1, "b"), (2, "a"), (2, "b"), (3, "a"), (3, "c")]
    df = spark.createDataFrame(rows, "u long, i string")
    got = {
        (r["item"], r["neighbor"]): (
            r["n_co"], r["n_item"], r["n_neighbor"],
            pytest.approx(r["cosine"]), r["rank"],
        )
        for r in item_item_topk(
            df, "u", "i", k=5, max_user_items=None, min_cooccur=1
        ).collect()
    }
    # deg: a=3 b=2 c=1; co: (a,b)=2 (a,c)=1 (b,c)=0
    import math

    assert got[("a", "b")][:3] == (2, 3, 2)
    assert got[("a", "b")][3] == pytest.approx(2 / math.sqrt(6))
    assert got[("b", "a")][:3] == (2, 2, 3)
    assert got[("a", "c")][3] == pytest.approx(1 / math.sqrt(3))
    assert ("b", "c") not in got
    # a's neighbors ranked: b (0.816) then c (0.577)
    assert got[("a", "b")][4] == 1 and got[("a", "c")][4] == 2


def test_itemcf_cap_semantics(spark):
    rows = [(1, "a"), (1, "b"), (2, "a"), (2, "b")]
    df = spark.createDataFrame(rows, "u long, i string")
    # cap=1: each user witnesses one item -> no pairs at all
    assert (
        item_item_topk(df, "u", "i", max_user_items=1, min_cooccur=1)
        .count() == 0
    )
    # degrees stay full-table even when capped (checked via uncapped
    # run: the cap only removes witnesses, never changes n_item)
    full = item_item_topk(df, "u", "i", max_user_items=None,
                          min_cooccur=1).collect()
    assert all(r["n_item"] == 2 and r["n_neighbor"] == 2 for r in full)


def test_itemcf_duckdb_oracle(spark, sf_dir):
    import duckdb

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").selectExpr(
        "l_orderkey AS u", "l_partkey % 211 AS i"
    )
    got = {
        (r["item"], r["neighbor"]): (
            r["n_co"], r["n_item"], r["n_neighbor"],
            round(r["cosine"], 9), r["rank"],
        )
        for r in item_item_topk(
            li, "u", "i", k=5, max_user_items=None, min_cooccur=2
        ).collect()
    }
    con = duckdb.connect()
    rows = con.sql(
        f"""
        WITH ui AS ({_UI.format(d=sf_dir)}),
        deg AS (SELECT i, COUNT(*) AS n FROM ui GROUP BY i),
        co AS (
          SELECT a.i AS ia, b.i AS ib, COUNT(*) AS n_co
          FROM ui a JOIN ui b USING (u) WHERE a.i < b.i
          GROUP BY 1, 2 HAVING COUNT(*) >= 2
        ),
        sym AS (
          SELECT ia, ib, n_co FROM co
          UNION ALL SELECT ib, ia, n_co FROM co
        ),
        scored AS (
          SELECT ia, ib, n_co, da.n AS ni, db.n AS nj,
                 n_co / sqrt(CAST(da.n AS DOUBLE) * db.n) AS c
          FROM sym JOIN deg da ON da.i = sym.ia
                   JOIN deg db ON db.i = sym.ib
        )
        SELECT * FROM (
          SELECT ia, ib, n_co, ni, nj, c,
                 ROW_NUMBER() OVER (
                   PARTITION BY ia ORDER BY c DESC, ib ASC) AS rk
          FROM scored
        ) WHERE rk <= 5
        """
    ).fetchall()
    want = {
        (int(ia), int(ib)): (int(n), int(ni), int(nj), round(c, 9), int(rk))
        for ia, ib, n, ni, nj, c, rk in rows
    }
    assert len(want) > 100  # non-vacuous
    assert got == want
    from tests.conftest import record_opcheck

    record_opcheck(
        "item_item_topk", len(want), True, oracle="duckdb",
        value=float(len(want)),
    )

    sims = item_item_topk(
        li, "u", "i", k=5, max_user_items=None, min_cooccur=2
    )
    rec = {
        (r["user"], r["item"]): (round(r["score"], 6), r["rank"])
        for r in item_item_recommend(li, sims, "u", "i", k=3).collect()
    }
    rrows = con.sql(
        f"""
        WITH ui AS ({_UI.format(d=sf_dir)}),
        deg AS (SELECT i, COUNT(*) AS n FROM ui GROUP BY i),
        co AS (
          SELECT a.i AS ia, b.i AS ib, COUNT(*) AS n_co
          FROM ui a JOIN ui b USING (u) WHERE a.i < b.i
          GROUP BY 1, 2 HAVING COUNT(*) >= 2
        ),
        sym AS (
          SELECT ia, ib, n_co FROM co
          UNION ALL SELECT ib, ia, n_co FROM co
        ),
        scored AS (
          SELECT ia, ib, n_co / sqrt(CAST(da.n AS DOUBLE) * db.n) AS c
          FROM sym JOIN deg da ON da.i = sym.ia
                   JOIN deg db ON db.i = sym.ib
        ),
        topk AS (
          SELECT * FROM (
            SELECT ia, ib, c, ROW_NUMBER() OVER (
                     PARTITION BY ia ORDER BY c DESC, ib ASC) AS rk
            FROM scored
          ) WHERE rk <= 5
        ),
        cand AS (
          SELECT ui.u, t.ib AS cand, SUM(t.c) AS score
          FROM ui JOIN topk t ON t.ia = ui.i
          GROUP BY 1, 2
        ),
        unseen AS (
          SELECT c.* FROM cand c
          ANTI JOIN ui ON ui.u = c.u AND ui.i = c.cand
        )
        SELECT * FROM (
          SELECT u, cand, score, ROW_NUMBER() OVER (
                   PARTITION BY u ORDER BY score DESC, cand ASC) AS rk
          FROM unseen
        ) WHERE rk <= 3
        """
    ).fetchall()
    rwant = {
        (int(u), int(c)): (round(s, 6), int(rk)) for u, c, s, rk in rrows
    }
    assert len(rwant) > 100
    assert rec == rwant
    record_opcheck(
        "item_item_recommend", len(rwant), True, oracle="duckdb",
    )


def test_itemcf_validation(spark):
    df = spark.createDataFrame([(1, "a")], "u long, i string")
    with pytest.raises(ValueError, match="k"):
        item_item_topk(df, "u", "i", k=0)
    with pytest.raises(ValueError, match="min_cooccur"):
        item_item_topk(df, "u", "i", min_cooccur=0)


def test_itemcf_hot_cold_split_matches_pure_window(spark):
    # r11: the cap windows only OVER-CAP users (hot/cold split); the
    # witnessed set must equal the pure per-user window's — lowest
    # xxhash64(i) per user, cap applied to hot users only
    import random

    from pyspark.sql import Window

    rng = random.Random(7)
    rows = [
        (u, f"i{rng.randrange(40)}")
        for u in range(30)
        for _ in range(rng.choice([1, 2, 3, 9, 12]))
    ]
    df = spark.createDataFrame(rows, "u long, i string")
    cap = 4
    got = item_item_topk(df, "u", "i", k=50, max_user_items=cap,
                         min_cooccur=1).collect()
    # reference: same pipeline with the ORIGINAL single-window cap
    ui = df.distinct()
    w = Window.partitionBy("u").orderBy(F.xxhash64("i"), F.col("i"))
    wit = (
        ui.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= cap)
        .drop("__rn")
    )
    a = wit.select("u", F.col("i").alias("ia"))
    b = wit.select("u", F.col("i").alias("ib"))
    co = (
        a.join(b, "u")
        .where(F.col("ia") < F.col("ib"))
        .groupBy("ia", "ib")
        .agg(F.count(F.lit(1)).alias("n_co"))
    )
    ref = {
        (r["ia"], r["ib"]): r["n_co"] for r in co.collect()
    }
    got_pairs = {
        (r["item"], r["neighbor"]): r["n_co"]
        for r in got
        if r["item"] < r["neighbor"]
    }
    assert got_pairs == ref
