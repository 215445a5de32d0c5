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


def test_pca_fit_matches_numpy_oracle(spark, sf_dir):
    """pca_fit's distributed moments vs a full numpy replay on the
    collected embeddings — same covariance definition (population,
    /n), same eigh, same sign rule."""
    import numpy as np

    from data_export_tool_spark.operators.features import pca_fit

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    model = pca_fit(emb, k=8)

    X = np.array([r["embedding"] for r in emb.collect()], dtype="float64")
    mu = X.mean(axis=0)
    cov = (X.T @ X) / len(X) - np.outer(mu, mu)
    cov = (cov + cov.T) / 2.0
    w, v = np.linalg.eigh(cov)
    order = np.argsort(w)[::-1][:8]
    ev = np.clip(w[order], 0.0, None)
    P = v[:, order].T
    flip = np.sign(P[np.arange(8), np.abs(P).argmax(axis=1)])
    flip[flip == 0] = 1.0
    P = P * flip[:, None]

    ok = (
        model["n"] == len(X)
        and np.allclose(model["mean"], mu, atol=1e-9)
        and np.allclose(model["eigvals"], ev, atol=1e-8)
        and np.allclose(model["components"], P, atol=1e-6)
        and np.all(np.diff(model["eigvals"]) <= 1e-12)  # descending
    )
    record_opcheck(
        "pca_fit", 8, bool(ok), oracle="python-reference",
        value=float(sum(model["explained_variance"])),
    )
    assert ok


def test_pca_transform_projects_and_whitens(spark, sf_dir):
    import numpy as np

    from data_export_tool_spark.operators.features import pca_fit, pca_transform

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    model = pca_fit(emb, k=8)
    out = pca_transform(emb, model, whiten=False).select("vec_id", "pca")
    rows = {r["vec_id"]: np.array(r["pca"]) for r in out.collect()}

    X = {r["vec_id"]: np.array(r["embedding"], dtype="float64")
         for r in emb.collect()}
    mu = np.array(model["mean"])
    P = np.array(model["components"])
    for vid in list(rows)[:50]:
        assert np.allclose(rows[vid], (X[vid] - mu) @ P.T, atol=1e-8)

    # whitened projection has ~unit variance per component and ~zero
    # off-diagonal covariance on the fitted corpus
    W = np.array(
        [r["pca"] for r in pca_transform(emb, model, whiten=True)
         .select("pca").collect()]
    )
    C = np.cov(W, rowvar=False, ddof=0)
    assert np.allclose(np.diag(C), 1.0, atol=1e-3)
    off = C - np.diag(np.diag(C))
    assert np.abs(off).max() < 1e-3


def test_pca_null_and_validation(spark):
    import pytest as _pytest

    from data_export_tool_spark.operators.features import pca_fit, pca_transform

    df = spark.createDataFrame(
        [(1, [1.0, 2.0]), (2, None), (3, [])],
        "vec_id long, embedding array<double>",
    )
    model = pca_fit(df, k=1)
    assert model["n"] == 1
    got = {r["vec_id"]: r["pca"] for r in pca_transform(df, model).collect()}
    assert got[1] is not None and got[2] is None and got[3] is None
    with _pytest.raises(ValueError):
        pca_fit(df, k=0)
    with _pytest.raises(ValueError):
        pca_fit(df, k=5)  # exceeds dim 2


def test_target_encode_matches_duckdb(spark, sf_dir):
    import duckdb

    from data_export_tool_spark.operators.features import target_encode

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").withColumn(
        "y", (F.col("doc_id") % 3 == 0).cast("int")
    )
    M = 20.0
    got = target_encode(docs, "source", "y", smoothing=M).select(
        "doc_id", "source_te"
    )
    want = duckdb.sql(
        f"""
        WITH base AS (
          SELECT doc_id, source, CAST(doc_id % 3 = 0 AS INT) AS y
          FROM read_parquet('{sf_dir}/documents.parquet')
        ), prior AS (SELECT AVG(y) p FROM base),
        stats AS (SELECT source, SUM(y) s, COUNT(y) n FROM base GROUP BY 1)
        SELECT b.doc_id,
               (st.s + {M} * pr.p) / (st.n + {M}) AS source_te
        FROM base b JOIN stats st USING (source) CROSS JOIN prior pr
        """
    ).df().set_index("doc_id")["source_te"]
    rows = {r["doc_id"]: r["source_te"] for r in got.collect()}
    ok = len(rows) == len(want) and all(
        abs(rows[k] - want[k]) < 1e-12 for k in rows
    )
    record_opcheck("target_encode", len(rows), bool(ok))
    assert ok


def test_target_encode_loo_and_null_edges(spark):
    from data_export_tool_spark.operators.features import target_encode

    df = spark.createDataFrame(
        [
            (1, "a", 1.0), (2, "a", 0.0), (3, "a", 1.0),
            (4, "b", 1.0),                 # singleton category
            (5, None, 0.0), (6, None, 1.0),  # NULL category group
            (7, "a", None),                # NULL label row
        ],
        "id long, cat string, y double",
    )
    prior = 4 / 6  # mean over non-NULL labels
    m = 3.0
    got = {
        r["id"]: r["cat_te"]
        for r in target_encode(df, "cat", "y", smoothing=m).collect()
    }
    assert abs(got[1] - (2 + m * prior) / (3 + m)) < 1e-12
    assert abs(got[4] - (1 + m * prior) / (1 + m)) < 1e-12
    assert abs(got[5] - (1 + m * prior) / (2 + m)) < 1e-12  # NULL cat real
    assert abs(got[7] - (2 + m * prior) / (3 + m)) < 1e-12  # NULL label enc'd

    loo = {
        r["id"]: r["cat_te"]
        for r in target_encode(
            df, "cat", "y", smoothing=m, leave_one_out=True
        ).collect()
    }
    assert abs(loo[1] - (1 + m * prior) / (2 + m)) < 1e-12  # own label out
    assert abs(loo[2] - (2 + m * prior) / (2 + m)) < 1e-12
    assert abs(loo[4] - (0 + m * prior) / (0 + m)) < 1e-12  # singleton→prior
    assert abs(loo[4] - prior) < 1e-12
    assert abs(loo[7] - (2 + m * prior) / (3 + m)) < 1e-12  # NULL label: full

    # smoothing=0 LOO singleton → 0/0 → NULL, never NaN
    z = {
        r["id"]: r["cat_te"]
        for r in target_encode(
            df, "cat", "y", smoothing=0.0, leave_one_out=True
        ).collect()
    }
    assert z[4] is None

    import pytest as _pytest

    with _pytest.raises(ValueError):
        target_encode(df, "cat", "y", smoothing=-1.0)
    with _pytest.raises(ValueError):
        target_encode(
            df.where(F.col("y").isNull()), "cat", "y"
        )


def test_random_projection_replay_and_jl_law(spark, sf_dir):
    import numpy as np

    from data_export_tool_spark.operators.features import random_projection

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    out = random_projection(emb, out_dim=32, seed=7)
    got = {r["vec_id"]: np.array(r["rp"]) for r in out.select("vec_id", "rp").collect()}

    X = {r["vec_id"]: np.array(r["embedding"], dtype="float64") for r in emb.collect()}
    d = len(next(iter(X.values())))
    rng = np.random.RandomState(7)
    signs = rng.choice([-1.0, 0.0, 1.0], size=(32, d), p=[1/6, 2/3, 1/6])
    R = signs / np.sqrt((1/3) * 32)
    ok = all(np.allclose(got[k], X[k] @ R.T, atol=1e-9) for k in got)
    # JL law: pairwise squared distances preserved on average (sample
    # the first 40 ids deterministically)
    ids = sorted(X)[:40]
    ratios = []
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            a, b = ids[i], ids[j]
            d0 = float(((X[a] - X[b]) ** 2).sum())
            d1 = float(((got[a] - got[b]) ** 2).sum())
            if d0 > 0:
                ratios.append(d1 / d0)
    mean_ratio = sum(ratios) / len(ratios)
    ok = ok and abs(mean_ratio - 1.0) < 0.1
    record_opcheck(
        "random_projection", len(got), bool(ok),
        oracle="python-reference", value=float(mean_ratio),
    )
    assert ok


def test_random_projection_guards(spark):
    import pytest as _pytest

    from data_export_tool_spark.operators.features import random_projection

    df = spark.createDataFrame(
        [(1, [1.0, 2.0]), (2, None), (3, [1.0])],  # id 3: ragged dim
        "vec_id long, embedding array<double>",
    )
    got = {r["vec_id"]: r["rp"] for r in random_projection(df, 4).collect()}
    assert got[1] is not None and len(got[1]) == 4
    assert got[2] is None and got[3] is None
    with _pytest.raises(ValueError):
        random_projection(df, 0)
    with _pytest.raises(ValueError):
        random_projection(df.where("vec_id = 2"), 4)


def test_fit_operators_survive_udf_built_vectors(spark, sf_dir):
    """Regression for the UDF-in-predicate crash class: every fit that
    consumes a vector column must work when that column is a pandas-UDF
    product over join/CASE-built text (strip_duplicate_spans output) —
    a WHERE on such a column fuses into the join condition and dies
    with [INTERNAL_ERROR] Cannot evaluate pythonUDF."""
    from data_export_tool_spark.operators.clustering import kmeans_fit
    from data_export_tool_spark.operators.features import (
        hashed_embedding,
        pca_fit,
        pca_transform,
        random_projection,
    )
    from data_export_tool_spark.operators.spans import strip_duplicate_spans

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    feats = hashed_embedding(strip_duplicate_spans(docs, n=8), dim=16)

    model = pca_fit(feats, k=4)
    assert model["n"] == 500 and len(model["components"]) == 4
    out = pca_transform(feats, model).where(F.col("pca").isNotNull())
    assert out.count() == 500

    C = kmeans_fit(feats, 3, iters=2, id_col="doc_id")
    assert len(C) == 3

    rp = random_projection(feats, out_dim=4)
    assert rp.where(F.col("rp").isNotNull()).count() == 500


def test_woe_iv_matches_duckdb(spark, sf_dir):
    """WOE/IV table vs an exact DuckDB replay of the smoothed formula
    over (lang -> long-doc label), plus encoding-join and NULL-class
    contracts."""
    import duckdb
    import pytest
    from pyspark.sql import functions as F

    from data_export_tool_spark.operators.features import woe_iv_encode

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "lang",
        (F.size(F.split("text", r"\s+")) > 60).cast("int").alias("y"),
    )
    enc, table = woe_iv_encode(docs, "lang", "y", min_count=0.5)
    got = {
        r["lang"]: (r["n_events"], r["n_non_events"], r["woe"], r["iv_contrib"])
        for r in table.collect()
    }
    want_rows = duckdb.sql(f"""
      WITH base AS (
        SELECT COALESCE(lang, '∅') AS cat,
               CASE WHEN len(string_split(text, ' ')) > 60 THEN 1.0 ELSE 0.0 END AS y
        FROM '{sf_dir}/documents.parquet'
      ), cells AS (
        SELECT cat, SUM(y) AS ev, SUM(1-y) AS ne FROM base GROUP BY cat
      ), tot AS (
        SELECT SUM(ev) AS te, SUM(ne) AS tn, COUNT(*) AS nc FROM cells
      )
      SELECT cat, CAST(ev AS BIGINT), CAST(ne AS BIGINT),
             ROUND(ln(((ev+0.5)/(te+0.5*nc)) / ((ne+0.5)/(tn+0.5*nc))), 6),
             ROUND((((ev+0.5)/(te+0.5*nc)) - ((ne+0.5)/(tn+0.5*nc)))
                   * ln(((ev+0.5)/(te+0.5*nc)) / ((ne+0.5)/(tn+0.5*nc))), 6)
      FROM cells, tot
    """).fetchall()
    # the spark tokenizer splits on \s+; duckdb on ' ' — identical for
    # this corpus (single-space text) but guard the assumption
    want = {c: (int(e), int(n), float(w), float(iv)) for c, e, n, w, iv in want_rows}
    assert set(got) == set(want)
    ok = all(
        got[c][0] == want[c][0] and got[c][1] == want[c][1]
        and got[c][2] == pytest.approx(want[c][2], abs=2e-6)
        and got[c][3] == pytest.approx(want[c][3], abs=2e-6)
        for c in want
    )
    record_opcheck("woe_iv_encode", len(want) * 4, ok)
    assert ok
    # encoding join: every row got its category's woe; row count kept
    assert enc.count() == docs.count()
    sample = enc.select("lang", "lang_woe").distinct().collect()
    for r in sample:
        key = r["lang"] if r["lang"] is not None else "∅"
        assert r["lang_woe"] == pytest.approx(got[key][2], abs=1e-9)
    # IV of a predictive column exceeds IV of pure noise
    noisy = docs.withColumn("coin", (F.col("doc_id") % 2).cast("string"))
    _, t2 = woe_iv_encode(noisy, "coin", "y")
    iv_noise = sum(r["iv_contrib"] for r in t2.collect())
    iv_lang = sum(v[3] for v in got.values())
    assert iv_noise < 0.02
    with pytest.raises(ValueError):
        woe_iv_encode(docs.where("y = 1"), "lang", "y")


def test_rank_transform_exact_and_scale_shape(spark, sf_dir):
    """Global rank / percent_rank vs the classic single-window form
    (exact equality, ties included), inverse-normal vs the stdlib
    NormalDist replay, NULL passthrough, and the no-global-sort plan
    pin."""
    import re
    from statistics import NormalDist

    import pytest
    from pyspark.sql import Window, functions as F

    from data_export_tool_spark.operators.features import rank_transform

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_orderkey", "l_linenumber", "l_quantity"
    ).withColumn(
        "q",
        F.when(F.col("l_orderkey") % 97 == 0, None).otherwise(
            F.col("l_quantity").cast("double")
        ),
    )
    # SQL rank is a pure function of the value (ties share the min
    # rank), so the q -> rank map is complete evidence of equality —
    # and robust to this synthetic lineitem's non-unique
    # (orderkey, linenumber) pairs
    classic = li.where(F.col("q").isNotNull()).withColumn(
        "want_rank", F.rank().over(Window.orderBy("q"))
    )
    want = {r["q"]: r["want_rank"] for r in classic.collect()}
    got_df = rank_transform(li, "q", method="rank", num_ranges=16)
    got_rows = got_df.where(F.col("q").isNotNull()).collect()
    got = {r["q"]: r["q_rank"] for r in got_rows}
    assert got == want
    assert len(got_rows) == classic.count()  # row multiplicity kept
    n = len(got_rows)
    nd = NormalDist()
    pr = {
        r["q"]: r["q_percent_rank"]
        for r in rank_transform(li, "q", method="percent_rank")
        .where(F.col("q").isNotNull()).collect()
    }
    inv = {
        r["q"]: r["q_inverse_normal"]
        for r in rank_transform(li, "q", method="inverse_normal")
        .where(F.col("q").isNotNull()).collect()
    }
    ok = 0
    for q, rk in want.items():
        assert pr[q] == pytest.approx((rk - 1) / (n - 1), abs=1e-12)
        assert inv[q] == pytest.approx(
            nd.inv_cdf((rk - 0.375) / (n + 0.25)), abs=1e-6
        )
        ok += 1
    record_opcheck("rank_transform", ok * 3, True, oracle="python-reference")
    # NULLs pass through untransformed
    n_null = li.where(F.col("q").isNull()).count()
    assert got_df.where(F.col("q").isNull() & F.col("q_rank").isNull()).count() == n_null
    # plan pin: every rank window carries the range key (no global
    # single-partition sort of the data path); the only orderBy-global
    # window is the <=num_ranges offsets frame
    plan = got_df._jdf.queryExecution().optimizedPlan().toString()
    for spec in re.findall(r"windowspecdefinition\(([^)]*)\)", plan):
        head = spec.split(" ASC")[0]
        if "__rng" not in head:
            raise AssertionError(f"un-ranged window: {spec}")
        # offsets window partitions a metadata frame; data window must
        # carry __rng as PARTITION key (first position)
    with pytest.raises(ValueError):
        rank_transform(li, "q", method="nope")


def test_quantile_normalize_matches_python_replay(spark, sf_dir):
    """Cross-group quantile normalization vs an exact numpy-style
    replay (value-grain percent_rank per group + linear interpolation
    on the exact pooled-percentile lattice), plus the two laws that
    make the operator what it is: within-group order preserved, and
    normalized group quantiles collapse onto the pooled reference."""
    import pytest
    from pyspark.sql import functions as F

    from data_export_tool_spark.operators.features import quantile_normalize

    li = (
        spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        .where(F.col("l_orderkey") % 37 == 0)
        .select(
            "l_orderkey",
            "l_linenumber",
            "l_returnflag",
            F.col("l_extendedprice").cast("double").alias("price"),
        )
    )
    GRID = 100
    out = quantile_normalize(li, "price", "l_returnflag", grid=GRID)
    got = sorted(
        (r["l_returnflag"], r["price"], r["price_qnorm"])
        for r in out.collect()
    )
    # replay
    rows = [
        (r["l_returnflag"], r["price"])
        for r in li.collect()
        if r["price"] is not None
    ]
    pooled = sorted(p for _, p in rows)

    def pooled_q(p):
        # numpy 'linear' / SQL percentile interpolation
        pos = p * (len(pooled) - 1)
        i = int(pos)
        f = pos - i
        j = min(i + 1, len(pooled) - 1)
        return pooled[i] * (1 - f) + pooled[j] * f

    lattice = [pooled_q(i / GRID) for i in range(GRID + 1)]
    by_g: dict = {}
    for g, p in rows:
        by_g.setdefault(g, []).append(p)
    want = []
    for g, vs in by_g.items():
        distinct = sorted(set(vs))
        n = len(vs)
        smaller = {}
        c = 0
        from collections import Counter

        cnt = Counter(vs)
        for v in distinct:
            smaller[v] = c
            c += cnt[v]
        for v in vs:
            pct = (smaller[v] + 1 - 1.0) / (n - 1.0) if n > 1 else 0.5
            pos = pct * GRID
            i = int(pos)
            f = pos - i
            j = min(i + 1, GRID)
            q = lattice[i] * (1 - f) + lattice[j] * f
            want.append((g, v, round(q, 9)))
    want.sort()
    assert len(got) == len(want)
    for g, w in zip(got, want):
        assert g[0] == w[0] and g[1] == pytest.approx(w[1])
        assert g[2] == pytest.approx(w[2], abs=1e-6), (g, w)
    from tests.conftest import record_opcheck

    record_opcheck(
        "quantile_normalize", len(want), True, oracle="python-reference"
    )
    # law 1: within-group order preserved (value-grain monotone)
    per_g: dict = {}
    for g, v, q in got:
        per_g.setdefault(g, []).append((v, q))
    for g, pairs in per_g.items():
        pairs.sort()
        qs = [q for _, q in pairs]
        assert qs == sorted(qs), g
    # law 2: each group's median lands near the pooled median
    pm = pooled_q(0.5)
    for g, pairs in per_g.items():
        vs = sorted(q for _, q in pairs)
        med = vs[len(vs) // 2]
        assert abs(med - pm) / max(abs(pm), 1e-9) < 0.1, (g, med, pm)
    # NULLs pass through
    withnull = li.unionByName(
        spark.createDataFrame(
            [(0, 0, "A", None)],
            "l_orderkey long, l_linenumber int, l_returnflag string,"
            " price double",
        )
    )
    on = quantile_normalize(withnull, "price", "l_returnflag").where(
        F.col("price").isNull()
    )
    assert [r["price_qnorm"] for r in on.collect()] == [None]
    with pytest.raises(ValueError):
        quantile_normalize(li, "price", "l_returnflag", grid=1)
