"""Bloom semi/anti joins (operators/bloomjoin.py): exact equality
with plain left_semi/left_anti, measured FPR of the approximate mode,
NULL semantics, empty-key edges, and the pre-filter plan shape."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.conftest import record_opcheck
from data_export_tool_spark.operators.bloomjoin import (
    bloom_anti_join,
    bloom_semi_join,
    build_key_bloom,
)


@pytest.fixture(scope="module")
def tables(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_orderkey", "l_partkey", "l_quantity"
    ).withColumn(
        "l_partkey",
        F.when(F.col("l_orderkey") % 101 == 0, None).otherwise(
            F.col("l_partkey")
        ),
    )
    keys = spark.read.parquet(f"{sf_dir}/part.parquet").select(
        F.col("p_partkey").alias("l_partkey")
    ).where(F.col("l_partkey") % 7 == 0)  # ~14% selective dim
    return li, keys


def test_bloom_semi_join_exact_equality(spark, tables):
    li, keys = tables
    cols = li.columns
    got = bloom_semi_join(li, keys, "l_partkey").select(cols).collect()
    want = li.join(keys.distinct(), "l_partkey", "left_semi").select(cols).collect()
    gs = sorted(map(tuple, got))
    ws = sorted(map(tuple, want))
    ok = gs == ws and len(ws) > 0
    record_opcheck("bloom_semi_join", len(ws), ok, oracle="spark-left-semi")
    assert ok
    # NULL fact keys never match
    ki = cols.index("l_partkey")
    assert all(r[ki] is not None for r in gs)


def test_bloom_anti_join_exact_equality(spark, tables):
    li, keys = tables
    keyfn = lambda t: tuple((x is None, x) for x in t)  # NULL-sortable
    cols = li.columns  # pin projection order: joins reorder the key first
    got = sorted(
        map(tuple, bloom_anti_join(li, keys, "l_partkey").select(cols).collect()),
        key=keyfn,
    )
    want = sorted(
        map(
            tuple,
            li.join(keys.distinct(), "l_partkey", "left_anti").select(cols).collect(),
        ),
        key=keyfn,
    )
    ok = got == want and len(want) > 0
    record_opcheck("bloom_anti_join", len(want), ok, oracle="spark-left-anti")
    assert ok
    # NULL fact keys are kept (ANSI anti semantics)
    n_null = li.where(F.col("l_partkey").isNull()).count()
    ki = cols.index("l_partkey")
    assert sum(1 for r in got if r[ki] is None) == n_null


def test_bloom_approximate_mode_fpr(spark, tables):
    """exact=False: every TRUE member passes (no false negatives —
    the Bloom guarantee) and the measured FPR stays within ~5x the
    declared fpp."""
    li, keys = tables
    fpp = 0.01
    pre = bloom_semi_join(li, keys, "l_partkey", fpp=fpp, exact=False)
    true_sel = li.join(keys.distinct(), "l_partkey", "left_semi")
    n_pre, n_true = pre.count(), true_sel.count()
    assert n_pre >= n_true  # no false negatives
    n_nonmember = li.where(F.col("l_partkey").isNotNull()).count() - n_true
    fpr = (n_pre - n_true) / max(n_nonmember, 1)
    record_opcheck(
        "bloom_join_fpr", n_nonmember, fpr <= 5 * fpp,
        oracle="measured-vs-declared", value=round(fpr, 6), floor=None,
    )
    assert fpr <= 5 * fpp, fpr


def test_bloom_edges_and_reuse(spark, tables):
    li, keys = tables
    empty = keys.limit(0)
    assert bloom_semi_join(li, empty, "l_partkey").count() == 0
    assert bloom_anti_join(li, empty, "l_partkey").count() == li.count()
    with pytest.raises(ValueError):
        build_key_bloom(keys, "l_partkey", fpp=0.0)
    # prebuilt filter reuse gives identical results
    bloom = build_key_bloom(keys, "l_partkey", fpp=0.001)
    a = sorted(map(tuple, bloom_semi_join(li, keys, "l_partkey", bloom=bloom).collect()))
    b = sorted(map(tuple, bloom_semi_join(li, keys, "l_partkey").collect()))
    assert a == b
