"""Time-series resampling and gap filling (hypertable-rollup family).

Metric/event tables are queried at coarser grains than they are
written: ``resample`` is the time-bucket rollup, and ``fill_gaps``
materializes the dense per-key time axis (a bucket row for EVERY
period between a key's first and last observation) with
last-observation-carried-forward for the value columns — the shape
dashboards and join-ready feature tables need.

Scale shapes:

- ``resample``: one partial-aggregable ``groupBy(key, bucket)`` —
  the exchange carries one row per (key, bucket), and AQE coalesces.
- ``fill_gaps``: the dense axis comes from ``sequence()`` + explode
  off a per-key (min, max) aggregate — generated column-side, never
  collected. LOCF is a per-key ordered window; its partition size is
  the key's BUCKET COUNT (time range / period), which is bounded by
  the calendar, not by row volume — a key with a billion raw events
  still has only 8760 hourly buckets a year. This is the rare case
  where a per-key window is scale-safe by construction.
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def resample(
    df: DataFrame,
    period: str,
    aggs: Mapping[str, Column],
    keys: Sequence[str] = (),
    ts_col: str = "ts",
) -> DataFrame:
    """Roll rows up to ``period`` buckets (any ``window()`` duration:
    '1 hour', '15 minutes', '1 day'): one row per (*keys, bucket_start)
    with the given aggregate expressions. Null timestamps are
    excluded (they belong to no bucket)."""
    if isinstance(keys, str):
        keys = [keys]
    return (
        df.where(F.col(ts_col).isNotNull())
        .groupBy(*keys, F.window(ts_col, period).alias("__w"))
        .agg(*[c.alias(name) for name, c in aggs.items()])
        .select(
            *keys,
            F.col("__w.start").alias("bucket_start"),
            *aggs.keys(),
        )
    )


def fill_gaps(
    resampled: DataFrame,
    period_seconds: int,
    keys: Sequence[str] = (),
    bucket_col: str = "bucket_start",
    locf_cols: Sequence[str] = (),
) -> DataFrame:
    """Densify a ``resample`` output: emit a row for EVERY period
    between each key's first and last bucket. Missing buckets get
    NULL aggregates, then ``locf_cols`` are filled with the last
    observed value (LOCF); other columns stay NULL so a count column
    can honestly read 0-after-coalesce while a gauge carries forward.

    Adds ``is_gap`` (true on synthesized rows).
    """
    if isinstance(keys, str):
        keys = [keys]
    if isinstance(locf_cols, str):
        locf_cols = [locf_cols]
    step = F.expr(f"INTERVAL {period_seconds} SECONDS")

    bounds = resampled.groupBy(*keys).agg(
        F.min(bucket_col).alias("__lo"), F.max(bucket_col).alias("__hi")
    )
    axis = bounds.select(
        *keys,
        F.explode(F.sequence(F.col("__lo"), F.col("__hi"), step)).alias(
            bucket_col
        ),
    )
    joined = axis.join(
        resampled.withColumn("__present", F.lit(True)),
        on=[*keys, bucket_col],
        how="left",
    )
    out = joined.withColumn(
        "is_gap", F.coalesce(F.col("__present"), F.lit(False)) == False  # noqa: E712
    ).drop("__present")
    if locf_cols:
        w = (
            Window.partitionBy(*keys)
            .orderBy(bucket_col)
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        for c in locf_cols:
            out = out.withColumn(c, F.last(c, ignorenulls=True).over(w))
    return out


def rolling(
    resampled: DataFrame,
    period_seconds: int,
    window_periods: int,
    aggs: Mapping[str, tuple[str, str]],
    keys: Sequence[str] = (),
    bucket_col: str = "bucket_start",
) -> DataFrame:
    """Trailing-window aggregates over a ``resample`` output: for each
    (key, bucket) row, aggregate the last ``window_periods`` buckets
    (current included) per ``aggs`` — ``{out_name: (in_col, fn)}``
    with ``fn`` in avg/sum/min/max/count. The moving-average /
    rolling-sum tier dashboards layer over the rollup.

    Computed with a RANGE window over the bucket epoch (missing
    buckets simply contribute nothing — compose with ``fill_gaps``
    first for gap-aware denominators). Scale: the window partition is
    per key over BUCKETS, calendar-bounded like ``fill_gaps``'s LOCF —
    never proportional to raw row volume.
    """
    if isinstance(keys, str):
        keys = [keys]
    if window_periods < 1:
        raise ValueError(f"window_periods must be >= 1: {window_periods}")
    fns = {"avg": F.avg, "sum": F.sum, "min": F.min, "max": F.max,
           "count": F.count}
    lo = -(window_periods - 1) * period_seconds
    w = (
        Window.partitionBy(*keys)
        .orderBy(F.unix_timestamp(F.col(bucket_col)))
        .rangeBetween(lo, 0)
    )
    out = resampled
    for name, (col, fn) in aggs.items():
        if fn not in fns:
            raise ValueError(f"unsupported rolling fn {fn!r} for {name}")
        out = out.withColumn(name, fns[fn](F.col(col)).over(w))
    return out


def detect_anomalies(
    resampled: DataFrame,
    period_seconds: int,
    window_periods: int,
    value_col: str,
    keys: Sequence[str] = (),
    n_sigmas: float = 3.0,
    min_periods: int = 3,
    bucket_col: str = "bucket_start",
) -> DataFrame:
    """Rolling z-score anomaly flags over a ``resample`` grid: each
    bucket's value is compared against the mean/stddev of the
    ``window_periods`` buckets strictly BEFORE it (the classic
    trailing baseline — excluding the current bucket, so a spike
    cannot mask itself by inflating its own baseline).

    Adds ``baseline_mean``, ``baseline_std``, ``is_anomaly``
    (|x − mean| > n_sigmas·std). ``is_anomaly`` is NULL while the
    baseline holds fewer than ``min_periods`` observed buckets (cold
    start) and false when the baseline variance is zero-or-NULL but
    the value equals the mean. Same calendar-bounded per-key window
    scale argument as ``rolling``/LOCF.
    """
    if isinstance(keys, str):
        keys = [keys]
    if window_periods < 1:
        raise ValueError(f"window_periods must be >= 1: {window_periods}")
    w = (
        Window.partitionBy(*keys)
        .orderBy(F.unix_timestamp(F.col(bucket_col)))
        .rangeBetween(-window_periods * period_seconds, -period_seconds)
    )
    mean = F.avg(value_col).over(w)
    std = F.stddev_samp(value_col).over(w)
    n = F.count(value_col).over(w)
    dev = F.abs(F.col(value_col) - F.col("baseline_mean"))
    return (
        resampled.withColumn("baseline_mean", mean)
        .withColumn("baseline_std", std)
        .withColumn("__n_base", n)
        .withColumn(
            "is_anomaly",
            F.when(F.col("__n_base") < min_periods, F.lit(None).cast("boolean"))
            .otherwise(
                dev > F.lit(n_sigmas) * F.coalesce(F.col("baseline_std"), F.lit(0.0))
            ),
        )
        .drop("__n_base")
    )
