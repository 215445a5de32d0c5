"""Inter-annotator agreement (operators/agreement.py): textbook
worked examples, a DuckDB replay over synthesized rater labels on the
documents table, and the NULL/single-rating contracts."""

from __future__ import annotations

import duckdb
import pytest

from tests.conftest import record_opcheck
from data_export_tool_spark.operators.agreement import cohen_kappa, fleiss_kappa


def test_cohen_kappa_textbook(spark):
    # classic 2x2 worked example: 45 yes/yes, 15 yes/no, 25 no/yes,
    # 15 no/no -> po=0.60, pe=0.60*0.70 + 0.40*0.30 = 0.54, k=0.1304...
    rows = (
        [("y", "y")] * 45 + [("y", "n")] * 15 + [("n", "y")] * 25 + [("n", "n")] * 15
    )
    df = spark.createDataFrame(rows, "a string, b string")
    r = cohen_kappa(df, "a", "b").collect()[0]
    assert r["n_items"] == 100
    assert r["po"] == pytest.approx(0.60)
    assert r["pe"] == pytest.approx(0.54)
    assert r["kappa"] == pytest.approx((0.60 - 0.54) / (1 - 0.54))


def test_cohen_kappa_perfect_and_null(spark):
    df = spark.createDataFrame(
        [("x", "x"), ("y", "y"), (None, "x"), ("x", None)], "a string, b string"
    )
    r = cohen_kappa(df, "a", "b").collect()[0]
    assert r["n_items"] == 2 and r["kappa"] == 1.0  # pe==1 guard path not hit
    one = spark.createDataFrame([("x", "x")], "a string, b string")
    assert cohen_kappa(one, "a", "b").collect()[0]["kappa"] == 1.0  # pe==1 guard
    empty = spark.createDataFrame([(None, "x")], "a string, b string")
    with pytest.raises(ValueError):
        cohen_kappa(empty, "a", "b")


def test_fleiss_kappa_textbook(spark):
    # Fleiss 1971's canonical 10-item, 14-rater psychiatric example
    # has k~0.21; use a smaller exactly-computable case instead:
    # 2 items x 3 raters
    rows = [(1, "a"), (1, "a"), (1, "b"), (2, "b"), (2, "b"), (2, "b")]
    df = spark.createDataFrame(rows, "item int, label string")
    r = fleiss_kappa(df, "item", "label").collect()[0]
    # P_1 = (2*1 + 0)/(3*2) = 1/3; P_2 = 6/6 = 1 -> p_bar = 2/3
    # marginals: a=2/6, b=4/6 -> pe = 1/9 + 4/9 = 5/9
    assert r["n_items"] == 2 and r["n_ratings"] == 6
    assert r["p_bar"] == pytest.approx(2 / 3)
    assert r["pe"] == pytest.approx(5 / 9)
    assert r["kappa"] == pytest.approx((2 / 3 - 5 / 9) / (1 - 5 / 9))


def test_fleiss_single_rating_items_excluded(spark):
    rows = [(1, "a"), (1, "a"), (2, "b")]  # item 2 has one rating
    df = spark.createDataFrame(rows, "item int, label string")
    r = fleiss_kappa(df, "item", "label").collect()[0]
    assert r["n_items"] == 1 and r["n_ratings"] == 2
    # marginals restricted to multi-rated items: only 'a' -> pe = 1,
    # p_bar = 1 -> kappa = 1 by the degenerate-agreement guard
    assert r["kappa"] == 1.0
    with pytest.raises(ValueError):
        fleiss_kappa(df.where("item = 2"), "item", "label")


def test_kappas_match_duckdb(spark, sf_dir):
    """Synthesized deterministic raters over documents: rater A =
    lang, rater B = lang degraded on md5 parity; Fleiss over 3
    pseudo-raters in long format. Exact DuckDB replays."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    from pyspark.sql import functions as F

    wide = docs.select(
        "doc_id",
        F.col("lang").alias("ra"),
        F.when(
            F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1) < "8",
            F.col("lang"),
        ).otherwise(F.lit("en")).alias("rb"),
    )
    got = cohen_kappa(wide, "ra", "rb").collect()[0]
    want = duckdb.sql(
        f"""
        WITH w AS (
          SELECT lang AS ra,
                 CASE WHEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 1) < '8'
                      THEN lang ELSE 'en' END AS rb
          FROM read_parquet('{sf_dir}/documents.parquet')
          WHERE lang IS NOT NULL
        ),
        n AS (SELECT count(*) AS n FROM w),
        po AS (SELECT count(*) / (SELECT CAST(n AS DOUBLE) FROM n) AS po
               FROM w WHERE ra = rb),
        pe AS (
          SELECT sum(pa * pb) AS pe FROM (
            SELECT ra AS k, count(*) / (SELECT CAST(n AS DOUBLE) FROM n) AS pa
            FROM w GROUP BY 1
          ) a JOIN (
            SELECT rb AS k, count(*) / (SELECT CAST(n AS DOUBLE) FROM n) AS pb
            FROM w GROUP BY 1
          ) b USING (k)
        )
        SELECT (SELECT n FROM n) AS n, (SELECT po FROM po) AS po,
               (SELECT pe FROM pe) AS pe
        """
    ).fetchone()
    ok = (
        got["n_items"] == want[0]
        and got["po"] == pytest.approx(float(want[1]), abs=1e-12)
        and got["pe"] == pytest.approx(float(want[2]), abs=1e-12)
        and got["kappa"]
        == pytest.approx((float(want[1]) - float(want[2])) / (1 - float(want[2])), abs=1e-12)
    )
    record_opcheck("cohen_kappa", int(want[0]), ok)
    assert ok

    long = docs.select(
        "doc_id", F.explode(F.array(F.lit(1), F.lit(2), F.lit(3))).alias("rater")
    ).withColumn(
        "label",
        F.when(
            F.substring(
                F.md5(F.concat(F.col("doc_id").cast("string"), F.col("rater").cast("string"))),
                1, 1,
            ) < "c",
            F.lit("keep"),
        ).otherwise(F.lit("drop")),
    )
    got_f = fleiss_kappa(long, "doc_id", "label").collect()[0]
    want_f = duckdb.sql(
        f"""
        WITH l AS (
          SELECT doc_id, r.rater,
                 CASE WHEN substring(md5(CAST(doc_id AS VARCHAR) ||
                      CAST(r.rater AS VARCHAR)), 1, 1) < 'c'
                      THEN 'keep' ELSE 'drop' END AS label
          FROM read_parquet('{sf_dir}/documents.parquet'),
               (VALUES (1), (2), (3)) r(rater)
        ),
        nik AS (SELECT doc_id, label, count(*) AS nik FROM l GROUP BY 1, 2),
        per AS (
          SELECT doc_id, sum(nik) AS ni, sum(nik * (nik - 1)) AS agree
          FROM nik GROUP BY 1 HAVING sum(nik) >= 2
        ),
        pb AS (SELECT count(*) AS n_items, sum(ni) AS n_ratings,
                      avg(agree / (ni * (ni - 1.0))) AS p_bar FROM per),
        marg AS (
          SELECT sum(pow(nk / CAST(tot AS DOUBLE), 2)) AS pe FROM (
            SELECT label, sum(nik) AS nk,
                   (SELECT sum(nik) FROM nik JOIN per USING (doc_id)) AS tot
            FROM nik JOIN per USING (doc_id) GROUP BY label
          )
        )
        SELECT n_items, n_ratings, p_bar, (SELECT pe FROM marg) FROM pb
        """
    ).fetchone()
    pe_f = float(want_f[3])
    kappa_f = (float(want_f[2]) - pe_f) / (1 - pe_f)
    ok_f = (
        got_f["n_items"] == want_f[0]
        and got_f["n_ratings"] == want_f[1]
        and got_f["p_bar"] == pytest.approx(float(want_f[2]), abs=1e-12)
        and got_f["pe"] == pytest.approx(pe_f, abs=1e-12)
        and got_f["kappa"] == pytest.approx(kappa_f, abs=1e-12)
    )
    record_opcheck("fleiss_kappa", int(want_f[0]), ok_f)
    assert ok_f
