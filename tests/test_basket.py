"""Market-basket frequent pairs (operators/basket.py) vs an exact
DuckDB replay over lineitem co-purchases, plus the apriori prune,
basket-size guard, and NULL contracts."""

from __future__ import annotations

import duckdb
import pytest

from tests.conftest import record_opcheck
from data_export_tool_spark.operators.basket import frequent_pairs


def test_frequent_pairs_matches_duckdb(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    got = {
        (r["item_a"], r["item_b"]): (
            r["n_pair"], r["n_a"], r["n_b"],
            round(r["support"], 9), round(r["conf_a_to_b"], 9),
            round(r["conf_b_to_a"], 9), round(r["lift"], 9),
            round(r["chi2"], 6),
        )
        for r in frequent_pairs(
            li, "l_orderkey", "l_partkey", min_support_count=2
        ).collect()
    }
    want = {
        (a, b): (
            int(np_), int(na), int(nb),
            round(float(s), 9), round(float(cab), 9),
            round(float(cba), 9), round(float(lf), 9),
            round(float(x2), 6),
        )
        for a, b, np_, na, nb, s, cab, cba, lf, x2 in duckdb.sql(
            f"""
        WITH bi AS (
          SELECT DISTINCT l_orderkey AS basket, l_partkey AS item
          FROM read_parquet('{sf_dir}/lineitem.parquet')
        ),
        n AS (SELECT count(DISTINCT basket) AS nb FROM bi),
        ic AS (SELECT item, count(*) AS n_item FROM bi GROUP BY 1),
        freq AS (SELECT * FROM ic WHERE n_item >= 2),
        fbi AS (SELECT bi.basket, bi.item, freq.n_item
                FROM bi JOIN freq USING (item)),
        p AS (
          SELECT l.item AS a, r.item AS b, count(*) AS n_pair,
                 any_value(l.n_item) AS n_a, any_value(r.n_item) AS n_b
          FROM fbi l JOIN fbi r ON l.basket = r.basket AND l.item < r.item
          GROUP BY 1, 2
        )
        SELECT a, b, n_pair, n_a, n_b,
               n_pair / CAST(n.nb AS DOUBLE) AS support,
               n_pair / CAST(n_a AS DOUBLE) AS cab,
               n_pair / CAST(n_b AS DOUBLE) AS cba,
               n.nb * n_pair / (CAST(n_a AS DOUBLE) * n_b) AS lift,
               CASE WHEN (n_a) * (n.nb - n_a) * (n_b) * (n.nb - n_b) > 0
                    THEN n.nb * pow(n_pair * (n.nb - n_a - n_b + n_pair)
                         - (n_a - n_pair) * (n_b - n_pair), 2)
                         / (CAST(n_a AS DOUBLE) * (n.nb - n_a) * n_b * (n.nb - n_b))
                    ELSE 0.0 END AS chi2
        FROM p CROSS JOIN n
        """
        ).fetchall()
    }
    record_opcheck("frequent_pairs", len(want), got == want)
    assert got == want and len(want) > 0


def test_frequent_pairs_apriori_prune(spark):
    # item 'z' appears once -> below min_support_count=2 -> no pair
    # containing it may appear, even though (a, z) co-occurs
    df = spark.createDataFrame(
        [(1, "a"), (1, "z"), (2, "a"), (2, "b"), (3, "a"), (3, "b")],
        "basket int, item string",
    )
    out = frequent_pairs(df, "basket", "item", min_support_count=2).collect()
    pairs = {(r["item_a"], r["item_b"]) for r in out}
    assert pairs == {("a", "b")}
    row = out[0]
    assert (row["n_pair"], row["n_a"], row["n_b"]) == (2, 3, 2)
    assert row["lift"] == pytest.approx(3 * 2 / (3 * 2))
    assert row["n_baskets"] == 3 and row["n_dropped_baskets"] == 0


def test_frequent_pairs_basket_guard_and_dedup(spark):
    # basket 9 has 4 distinct items > max 3 -> dropped and counted;
    # duplicate (basket,item) rows collapse before counting
    rows = [(9, x) for x in "abcd"] + [(1, "a"), (1, "a"), (1, "b"), (2, "a"), (2, "b")]
    df = spark.createDataFrame(rows, "basket int, item string")
    out = frequent_pairs(df, "basket", "item", max_basket_items=3).collect()
    assert {(r["item_a"], r["item_b"]) for r in out} == {("a", "b")}
    r = out[0]
    assert r["n_pair"] == 2 and r["n_baskets"] == 2 and r["n_dropped_baskets"] == 1


def test_frequent_pairs_validation(spark):
    df = spark.createDataFrame([(None, "a"), (1, None)], "basket int, item string")
    with pytest.raises(ValueError):
        frequent_pairs(df, "basket", "item")  # all rows NULL-excluded
    with pytest.raises(ValueError):
        frequent_pairs(df, "basket", "item", min_support_count=0)
