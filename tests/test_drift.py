"""Distribution drift (operators/drift.py) against a full Python
replay of the bucket/PSI/KS/TVD arithmetic, plus behavioral pins
(self-drift is zero, null-rate shifts count, new categories surface
through OTHER, KS is numeric-only)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from tests.conftest import record_opcheck
from data_export_tool_spark.operators.drift import (
    distribution_drift,
    fit_drift_bins,
    fit_drift_vocab,
    snapshot_histograms,
)


def _mk(spark, rows):
    return spark.createDataFrame(rows, "x double, c string")


@pytest.fixture(scope="module")
def snapshots(spark):
    # Deterministic synthetic distributions: old ~ triangular-ish on
    # [0, 100], new shifted by +15 with a fatter tail, 5% vs 12% nulls,
    # and a category mix that changes plus a brand-new category.
    old_rows, new_rows = [], []
    for i in range(2000):
        u = ((i * 2654435761) % 1000) / 1000.0
        x_old = None if i % 20 == 0 else round(100 * u * u, 6)
        x_new = None if i % 8 == 0 else round(100 * u * u + 15 + 10 * u, 6)
        c_old = None if i % 50 == 0 else ("web" if u < 0.6 else "pdf" if u < 0.9 else "book")
        c_new = None if i % 50 == 0 else (
            "web" if u < 0.3 else "pdf" if u < 0.5 else "book" if u < 0.8 else "forum"
        )
        old_rows.append((x_old, c_old))
        new_rows.append((x_new, c_new))
    return _mk(spark, old_rows), _mk(spark, new_rows), old_rows, new_rows


BINS = {"x": [10.0, 25.0, 45.0, 70.0]}
VOCAB = {"c": ["book", "pdf", "web"]}


def _py_hist(rows, bins, vocab):
    """Python replay of snapshot_histograms' bucket rule."""
    out = {}
    cuts = bins["x"]
    h = {f"bin_{b}": 0 for b in range(len(cuts) + 1)}
    h["NULL"] = 0
    for x, _ in rows:
        if x is None:
            h["NULL"] += 1
        else:
            h[f"bin_{sum(1 for c in cuts if x > c)}"] += 1
    out["x"] = h
    cats = vocab["c"]
    h = {f"cat_{v}": 0 for v in cats}
    h["OTHER"] = 0
    h["NULL"] = 0
    for _, c in rows:
        if c is None:
            h["NULL"] += 1
        elif c in cats:
            h[f"cat_{c}"] += 1
        else:
            h["OTHER"] += 1
    out["c"] = h
    return out


def _py_stats(ho, hn, eps=1e-6):
    labels = list(ho)
    n_old, n_new = sum(ho.values()), sum(hn.values())
    po = [ho[k] / n_old for k in labels]
    pn = [hn[k] / n_new for k in labels]
    psi = sum(
        (max(b, eps) - max(a, eps)) * math.log(max(b, eps) / max(a, eps))
        for a, b in zip(po, pn)
    )
    tvd = 0.5 * sum(abs(b - a) for a, b in zip(po, pn))
    ob = [(k, ho[k], hn[k]) for k in labels if k != "NULL"]
    so, sn = sum(a for _, a, _ in ob), sum(b for _, _, b in ob)
    ks, co, cn = 0.0, 0.0, 0.0
    for _, a, b in ob:
        co += a / so
        cn += b / sn
        ks = max(ks, abs(co - cn))
    return psi, ks, tvd, n_old, n_new


def test_drift_matches_python_replay(spark, snapshots):
    old, new, old_rows, new_rows = snapshots
    got = {
        r["column"]: r
        for r in distribution_drift(
            spark, old, new, ["x"], ["c"], bins=BINS, vocab=VOCAB
        ).collect()
    }
    want_h_old = _py_hist(old_rows, BINS, VOCAB)
    want_h_new = _py_hist(new_rows, BINS, VOCAB)

    # Histogram pass replay (exact counts).
    assert snapshot_histograms(old, BINS, VOCAB) == want_h_old
    assert snapshot_histograms(new, BINS, VOCAB) == want_h_new

    ok = True
    for c in ("x", "c"):
        psi, ks, tvd, n_old, n_new = _py_stats(want_h_old[c], want_h_new[c])
        r = got[c]
        ok = ok and abs(r["psi"] - psi) < 1e-9 and abs(r["tvd"] - tvd) < 1e-9
        ok = ok and r["n_old"] == n_old and r["n_new"] == n_new
        if c == "x":
            ok = ok and r["kind"] == "numeric" and abs(r["ks"] - ks) < 1e-9
        else:
            ok = ok and r["kind"] == "categorical" and r["ks"] is None
        ok = ok and r["flagged"] == (psi >= 0.2)
    # The engineered shift is large enough to alert on both columns.
    assert got["x"]["flagged"] and got["c"]["flagged"]
    record_opcheck(
        "distribution_drift",
        len(got),
        ok,
        oracle="python-reference",
        value=round(got["x"]["psi"], 6),
    )
    assert ok


def test_self_drift_is_zero(spark, snapshots):
    old, _, _, _ = snapshots
    rows = distribution_drift(
        spark, old, old, ["x"], ["c"], bins=BINS, vocab=VOCAB
    ).collect()
    for r in rows:
        assert abs(r["psi"]) < 1e-12 and r["tvd"] == 0.0 and not r["flagged"]
        if r["kind"] == "numeric":
            assert r["ks"] == 0.0


def test_null_rate_shift_is_drift(spark):
    old = _mk(spark, [(float(i % 10), "a") for i in range(1000)])
    new = _mk(
        spark,
        [
            (None if (i // 10) % 2 == 0 else float(i % 10), "a")
            for i in range(1000)
        ],
    )
    r = distribution_drift(
        spark, old, new, ["x"], bins={"x": [4.0]}
    ).collect()[0]
    # Values are identical where present; only the NULL bucket moved.
    assert r["psi"] > 0.2 and r["flagged"]
    # Binned KS ignores the NULL bucket — the non-null shape is unchanged.
    assert r["ks"] == 0.0


def test_new_category_lands_in_other(spark):
    old = _mk(spark, [(1.0, "a") for _ in range(100)])
    new = _mk(spark, [(1.0, "a" if i % 2 else "zzz") for i in range(100)])
    r = distribution_drift(
        spark, old, new, categorical_cols=["c"], vocab={"c": ["a"]}
    ).collect()[0]
    assert r["kind"] == "categorical" and r["ks"] is None
    assert abs(r["tvd"] - 0.5) < 1e-9  # 50% of mass moved to OTHER


def test_fitted_path_sane(spark, snapshots):
    old, new, _, _ = snapshots
    bins = fit_drift_bins(old, ["x"], n_bins=8)
    assert bins["x"] == sorted(bins["x"]) and len(bins["x"]) <= 7
    vocab = fit_drift_vocab(old, ["c"], top_k=2)
    assert vocab["c"] == ["pdf", "web"]  # the two most frequent, sorted
    rows = distribution_drift(spark, old, new, ["x"], ["c"], n_bins=8, top_k=2)
    got = {r["column"]: r for r in rows.collect()}
    assert got["x"]["psi"] > 0 and got["c"]["psi"] > 0


def test_ks_exact_matches_python_replay(spark, sf_dir):
    """Exact two-sample KS vs a full python ECDF replay on real data
    (shifted prices), the identical-distribution null, and the
    non-empty contract."""
    import math

    import pytest
    from pyspark.sql import functions as F

    from data_export_tool_spark.operators.drift import ks_exact

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    old = li.select(F.col("l_extendedprice").cast("double").alias("x"))
    new = li.select((F.col("l_extendedprice") * 1.07 + 50).cast("double").alias("x"))
    got = ks_exact(old, new, "x").collect()[0]

    xo = sorted(r["x"] for r in old.collect())
    xn = sorted(r["x"] for r in new.collect())

    def ecdf(xs, v):
        import bisect

        return bisect.bisect_right(xs, v) / len(xs)

    values = sorted(set(xo) | set(xn))
    d = max(abs(ecdf(xo, v) - ecdf(xn, v)) for v in values)
    assert got["n_old"] == len(xo) and got["n_new"] == len(xn)
    assert got["ks"] == pytest.approx(d, abs=1e-9)
    lam = d * math.sqrt(len(xo) * len(xn) / (len(xo) + len(xn)))
    p = min(max(2 * sum(
        (-1) ** (k - 1) * math.exp(-2 * (k * lam) ** 2) for k in range(1, 101)
    ), 0.0), 1.0)
    assert got["p_value"] == pytest.approx(p, abs=1e-9)
    record_opcheck("ks_exact", len(values), True, oracle="python-reference")
    # identical distributions: D = 0, p = 1
    same = ks_exact(old, old, "x").collect()[0]
    assert same["ks"] == 0.0 and same["p_value"] == 1.0
    with pytest.raises(ValueError):
        ks_exact(old.limit(0), new, "x")
