"""Featurization (operators/features.py): the hashed embedding against
its stdlib replay twin, bins/scalers against DuckDB."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from tests.conftest import record_opcheck
from data_export_tool_spark.operators.features import (
    apply_quantile_bins,
    apply_scaler,
    fit_quantile_bins,
    fit_scaler,
    hashed_embedding,
    py_hashed_embedding,
)


def test_hashed_embedding_matches_stdlib_replay(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(200)
    got = {
        r["doc_id"]: r["embedding"]
        for r in hashed_embedding(docs, dim=32).select("doc_id", "embedding").collect()
    }
    src = {r["doc_id"]: r["text"] for r in docs.select("doc_id", "text").collect()}
    ok = True
    for k, text in src.items():
        want = py_hashed_embedding(text, dim=32)
        g = got[k]
        if want is None or g is None:
            ok = ok and want == g
        else:
            ok = ok and len(g) == 32 and all(
                abs(a - b) < 1e-12 for a, b in zip(g, want)
            )
    record_opcheck(
        "hashed_embedding", len(src), ok, oracle="stdlib-crc32-replay"
    )
    assert ok


def test_hashed_embedding_feeds_ann(spark):
    """End-to-end text → vector → exact cosine top-k without any
    external model: near-identical texts must rank closest."""
    from data_export_tool_spark.operators.similarity import brute_force_topk

    rows = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "the quick brown fox jumped over a lazy dog"),
        (3, "completely unrelated text about spark shuffles"),
        (4, None),
    ]
    df = hashed_embedding(
        spark.createDataFrame(rows, "doc_id long, text string"), dim=32
    )
    corpus = df.where(F.col("doc_id") > 1).selectExpr(
        "doc_id AS vec_id", "embedding"
    )
    queries = df.where(F.col("doc_id") == 1).selectExpr(
        "doc_id AS query_id", "embedding AS query_vec"
    )
    top = brute_force_topk(corpus, queries, k=2).orderBy("rank").collect()
    assert [r["neighbor_id"] for r in top] == [2, 3]
    # NULL text -> NULL vector, excluded from cosine by the zero guard
    assert df.where(F.col("doc_id") == 4).first()["embedding"] is None


def test_hashed_embedding_is_projection(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    plan = (
        hashed_embedding(docs)._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan


def test_quantile_bins_monotone_and_balanced(spark, sf_dir):
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    cuts = fit_quantile_bins(orders, "o_totalprice", 4, relative_error=0.0)
    assert cuts == sorted(cuts) and len(cuts) == 3
    binned = apply_quantile_bins(orders, "o_totalprice", cuts)
    rows = binned.select("o_totalprice", "o_totalprice_bin").collect()
    # replay the cut-counting rule exactly
    ok = all(
        r["o_totalprice_bin"] == sum(1 for c in cuts if r["o_totalprice"] > c)
        for r in rows
    )
    record_opcheck("quantile_bins", len(rows), ok, oracle="cut-rule-replay")
    assert ok
    # exact quantile cuts => near-balanced occupancy
    sizes = [
        r["n"]
        for r in binned.groupBy("o_totalprice_bin")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    ]
    assert len(sizes) == 4
    assert max(sizes) - min(sizes) <= len(rows) * 0.05 + 2


def test_scaler_matches_duckdb(spark, sf_dir):
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    params = fit_scaler(orders, ["o_totalprice"])
    m, s, lo, hi = duckdb.sql(
        f"SELECT avg(o_totalprice), stddev_samp(o_totalprice),"
        f" min(o_totalprice), max(o_totalprice)"
        f" FROM read_parquet('{sf_dir}/orders.parquet')"
    ).fetchone()
    p = params["o_totalprice"]
    fit_ok = (
        abs(p["mean"] - m) < 1e-6
        and abs(p["std"] - s) < 1e-6
        and p["min"] == lo
        and p["max"] == hi
    )
    z = apply_scaler(orders, params, "zscore").select(
        "o_totalprice", "o_totalprice_scaled"
    )
    sample = z.limit(50).collect()
    z_ok = all(
        abs(r["o_totalprice_scaled"] - (r["o_totalprice"] - p["mean"]) / p["std"])
        < 1e-9
        for r in sample
    )
    mm = apply_scaler(orders, params, "minmax")
    bounds = mm.agg(
        F.min("o_totalprice_scaled"), F.max("o_totalprice_scaled")
    ).first()
    mm_ok = abs(bounds[0] - 0.0) < 1e-12 and abs(bounds[1] - 1.0) < 1e-12
    record_opcheck(
        "feature_scaler", len(sample), fit_ok and z_ok and mm_ok
    )
    assert fit_ok and z_ok and mm_ok


def test_scaler_degenerate_and_null(spark):
    df = spark.createDataFrame(
        [(1, 5.0), (2, 5.0), (3, None)], "id long, x double"
    )
    params = fit_scaler(df, ["x"])
    out = {
        r["id"]: r["x_scaled"]
        for r in apply_scaler(df, params, "minmax").collect()
    }
    assert out == {1: 0.0, 2: 0.0, 3: None}
    outz = {
        r["id"]: r["x_scaled"]
        for r in apply_scaler(df, params, "zscore").collect()
    }
    assert outz == {1: 0.0, 2: 0.0, 3: None}
    with pytest.raises(ValueError):
        apply_scaler(df, params, "robust")
    with pytest.raises(ValueError):
        fit_quantile_bins(df, "x", 1)


def test_winsorize_clamps_to_quantile_band(spark):
    from data_export_tool_spark.operators.features import winsorize

    # 1000 uniform values + extreme outliers + NULLs
    rows = [(i, float(i % 100)) for i in range(1000)]
    rows += [(1000, 1e12), (1001, -1e12), (1002, None)]
    df = spark.createDataFrame(rows, "id long, x double")
    got = {r["id"]: r["x_wins"] for r in winsorize(df, ["x"], 0.05, 0.95).collect()}
    lo, hi = df.stat.approxQuantile("x", [0.05, 0.95], 0.0001)
    ok = got[1000] == hi and got[1001] == lo and got[1002] is None
    # interior values untouched; everything inside the band
    for i in range(1000):
        v = float(i % 100)
        want = min(max(v, lo), hi)
        ok = ok and got[i] == want
    vals = [v for v in got.values() if v is not None]
    ok = ok and min(vals) == lo and max(vals) == hi
    record_opcheck("winsorize", len(got), ok, oracle="python-reference")
    assert ok

    import pytest as _pytest

    with _pytest.raises(ValueError):
        winsorize(df, ["x"], 0.9, 0.1)
