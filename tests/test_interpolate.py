"""Linear interpolation (operators/timeseries.py interpolate_linear):
hand laws, python replay on a gappy real rollup, timestamp grain."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_export_tool_spark.operators.timeseries import (
    fill_gaps,
    interpolate_linear,
    resample,
)


def test_interpolate_hand_case(spark):
    rows = [
        ("k", 0, 10.0), ("k", 1, None), ("k", 2, None), ("k", 3, None),
        ("k", 4, 20.0), ("k", 5, None),  # trailing NULL: no extrapolation
        ("j", 0, None), ("j", 1, 5.0),   # leading NULL: no extrapolation
    ]
    df = spark.createDataFrame(rows, "k string, t int, v double")
    got = {
        (r["k"], r["t"]): r["v_interp"]
        for r in interpolate_linear(
            df, ["v"], keys=["k"], order_col="t"
        ).collect()
    }
    assert got[("k", 0)] == 10.0
    assert got[("k", 1)] == pytest.approx(12.5)
    assert got[("k", 2)] == pytest.approx(15.0)
    assert got[("k", 3)] == pytest.approx(17.5)
    assert got[("k", 4)] == 20.0
    assert got[("k", 5)] is None
    assert got[("j", 0)] is None
    assert got[("j", 1)] == 5.0


def test_interpolate_irregular_spacing(spark):
    # non-uniform order positions weight by DISTANCE, not row count
    rows = [("k", 0, 0.0), ("k", 10, None), ("k", 40, 40.0)]
    df = spark.createDataFrame(rows, "k string, t int, v double")
    got = {
        r["t"]: r["v_interp"]
        for r in interpolate_linear(df, ["v"], ["k"], "t").collect()
    }
    assert got[10] == pytest.approx(10.0)


def test_interpolate_real_rollup_replay(spark, sf_dir):
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").selectExpr(
        "cast(ts as timestamp) ts", "event_type", "value"
    )
    hourly = resample(
        ev.where(F.col("event_type") == "purchase"),
        "1 hour",
        {"v": F.avg("value")},
        keys=["event_type"],
    )
    grid = fill_gaps(hourly, 3600, keys=["event_type"])
    out = interpolate_linear(
        grid, ["v"], keys=["event_type"], order_col="bucket_start"
    ).collect()
    # python replay over the ordered series
    series = sorted(
        ((r["bucket_start"], r["v"], r["v_interp"]) for r in out),
        key=lambda x: x[0],
    )
    xs = [s[0].timestamp() for s in series]
    vs = [s[1] for s in series]
    want = []
    for i in range(len(series)):
        if vs[i] is not None:
            want.append(vs[i])
            continue
        prev = next(
            ((xs[j], vs[j]) for j in range(i - 1, -1, -1)
             if vs[j] is not None), None
        )
        nxt = next(
            ((xs[j], vs[j]) for j in range(i + 1, len(series))
             if vs[j] is not None), None
        )
        if prev is None or nxt is None:
            want.append(None)
        else:
            (x0, v0), (x1, v1) = prev, nxt
            want.append(v0 + (v1 - v0) * (xs[i] - x0) / (x1 - x0))
    n_interp = 0
    for (b, v, vi), wv in zip(series, want):
        if wv is None:
            assert vi is None
        else:
            assert vi == pytest.approx(wv, rel=1e-9)
            if v is None:
                n_interp += 1
    assert n_interp > 0  # the rollup actually had gaps
    from tests.conftest import record_opcheck

    record_opcheck(
        "interpolate_linear", len(want), True,
        oracle="python-reference", value=float(n_interp),
    )


def test_interpolate_validation(spark):
    df = spark.createDataFrame([("k", 1, 1.0)], "k string, t int, v double")
    with pytest.raises(ValueError, match="value_cols"):
        interpolate_linear(df, [], ["k"], "t")


def _randomized_resample(spark, seed: int, with_ts: bool = True):
    """A synthetic resample-shaped frame with gaps, NULL observed
    values (leading/interior/trailing), single-row keys, and a second
    aggregate column for the LOCF interplay."""
    import random

    rng = random.Random(seed)
    rows = []
    for k in range(8):
        buckets = sorted(rng.sample(range(50), rng.randint(1, 20)))
        for b in buckets:
            v = None if rng.random() < 0.35 else round(rng.uniform(-5, 5), 3)
            g = None if rng.random() < 0.35 else round(rng.uniform(0, 9), 3)
            rows.append((f"k{k}", b, v, g))
    df = spark.createDataFrame(rows, "k string, b int, v double, g double")
    if with_ts:
        df = df.select(
            "k",
            F.timestamp_seconds(F.col("b") * 3600).alias("bucket_start"),
            "v",
            "g",
        )
    return df


@pytest.mark.parametrize("seed", [1, 2])
@pytest.mark.parametrize("locf", [(), ("g",), ("v", "g")])
def test_fused_fill_gaps_interpolated_equals_composition(spark, seed, locf):
    # the r11 fused operator must return EXACTLY the composed result —
    # rows, schema, and doubles (same blend expressions, different plan)
    from data_export_tool_spark.operators.timeseries import (
        fill_gaps_interpolated,
    )

    df = _randomized_resample(spark, seed)
    composed = interpolate_linear(
        fill_gaps(df, 3600, keys=["k"], locf_cols=locf),
        ["v"],
        keys=["k"],
        order_col="bucket_start",
    )
    fused = fill_gaps_interpolated(
        df, 3600, ["v"], keys=["k"], locf_cols=locf
    )
    assert fused.schema == composed.schema
    assert fused.exceptAll(composed).count() == 0
    assert composed.exceptAll(fused).count() == 0


def test_fused_keyless_falls_back_to_composition(spark):
    from data_export_tool_spark.operators.timeseries import (
        fill_gaps_interpolated,
    )

    rows = [(0, 1.0), (2, None), (3, 4.0)]
    df = spark.createDataFrame(rows, "b int, v double").select(
        F.timestamp_seconds(F.col("b") * 3600).alias("bucket_start"), "v"
    )
    composed = interpolate_linear(
        fill_gaps(df, 3600), ["v"], order_col="bucket_start"
    )
    fused = fill_gaps_interpolated(df, 3600, ["v"])
    assert sorted(map(tuple, fused.collect())) == sorted(
        map(tuple, composed.collect())
    )


def test_fused_validation(spark):
    from data_export_tool_spark.operators.timeseries import (
        fill_gaps_interpolated,
    )

    df = spark.createDataFrame(
        [("k", 0, 1.0)], "k string, bucket_start int, v double"
    )
    with pytest.raises(ValueError, match="value_cols"):
        fill_gaps_interpolated(df, 3600, [], keys=["k"])
    with pytest.raises(ValueError, match="not in the aggregate"):
        fill_gaps_interpolated(df, 3600, ["nope"], keys=["k"])


def test_fill_gaps_duplicate_bucket_tolerated(spark):
    # ADVICE r10: contract-violating duplicate (key, bucket) rows must
    # not raise "illegal sequence boundaries" — the duplicate densifies
    # to itself (the old axis-join tolerance)
    rows = [("k", 0, 1.0), ("k", 0, 2.0), ("k", 2, 3.0)]
    df = spark.createDataFrame(rows, "k string, b int, v double").select(
        "k", F.timestamp_seconds(F.col("b") * 3600).alias("bucket_start"), "v"
    )
    out = fill_gaps(df, 3600, keys=["k"]).collect()
    assert len(out) == 4  # dup row + dup row + gap row at t=1 + t=2
