"""Poisson bootstrap CI (operators/bootstrap.py): exact pipeline
replay via the shared weight generator, CI laws, determinism."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from data_export_tool_spark.operators.bootstrap import (
    np_poisson_weights,
    poisson_bootstrap_ci,
)

B = 120
SEED = 17


def test_bootstrap_matches_replay(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    got = {
        r["l_returnflag"]: (
            r["estimate"], r["ci_lo"], r["ci_hi"], r["n"]
        )
        for r in poisson_bootstrap_ci(
            li, "l_orderkey", "l_extendedprice", by=["l_returnflag"],
            n_replicates=B, seed=SEED,
        ).collect()
    }
    rows = li.select(
        "l_returnflag",
        F.xxhash64("l_orderkey").alias("k"),
        F.col("l_extendedprice").cast("double").alias("x"),
    ).collect()
    groups: dict = {}
    for r in rows:
        groups.setdefault(r["l_returnflag"], []).append((r["k"], r["x"]))
    for g, pairs in groups.items():
        keys = np.array([p[0] for p in pairs], dtype=np.int64)
        x = np.array([p[1] for p in pairs])
        W = np_poisson_weights(keys, B, SEED)
        swx = (W * x[:, None]).sum(axis=0)
        sw = W.sum(axis=0)
        means = swx[sw > 0] / sw[sw > 0]
        lo, hi = np.percentile(means, [2.5, 97.5])
        est, clo, chi, n = got[g]
        assert est == pytest.approx(x.mean(), rel=1e-12)
        assert n == len(x)
        assert clo == pytest.approx(lo, rel=1e-9)
        assert chi == pytest.approx(hi, rel=1e-9)
        # the CI is a real interval around the estimate
        assert clo < est < chi
    from tests.conftest import record_opcheck

    record_opcheck(
        "poisson_bootstrap_ci", len(groups) * B, True,
        oracle="python-reference",
    )


def test_bootstrap_laws(spark):
    # width shrinks ~1/sqrt(n); runs are deterministic
    big = spark.range(0, 4000).select(
        F.col("id"), (F.col("id") % 100).cast("double").alias("v")
    )
    small = big.limit(400)
    wide = poisson_bootstrap_ci(small, "id", "v", n_replicates=B).first()
    tight = poisson_bootstrap_ci(big, "id", "v", n_replicates=B).first()
    assert (tight["ci_hi"] - tight["ci_lo"]) < (
        wide["ci_hi"] - wide["ci_lo"]
    )
    again = poisson_bootstrap_ci(big, "id", "v", n_replicates=B).first()
    assert again["ci_lo"] == tight["ci_lo"]
    assert again["ci_hi"] == tight["ci_hi"]


def test_bootstrap_validation(spark):
    df = spark.range(5).select("id", F.lit(1.0).alias("v"))
    with pytest.raises(ValueError, match="n_replicates"):
        poisson_bootstrap_ci(df, "id", "v", n_replicates=5)
    with pytest.raises(ValueError, match="alpha"):
        poisson_bootstrap_ci(df, "id", "v", alpha=1.5)


def test_bootstrap_null_group_keys_excluded(spark):
    from data_export_tool_spark.operators.bootstrap import (
        poisson_bootstrap_ci,
    )

    df = spark.createDataFrame(
        [(1, 10.0, 100), (2, 12.0, 100), (3, 99.0, None), (4, 11.0, 200)],
        "id long, x double, g int",
    )
    out = poisson_bootstrap_ci(df, "id", "x", by=["g"], n_replicates=20)
    rows = {r["g"]: r for r in out.collect()}
    # NULL-group rows are excluded up front (documented), never emitted
    # as a NaN-keyed group under the integer Arrow schema
    assert set(rows) == {100, 200}
    assert rows[100]["n"] == 2
