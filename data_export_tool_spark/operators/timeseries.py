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
    agg_cols = [
        c for c in resampled.columns if c not in (*keys, bucket_col)
    ]

    if keys:
        # keyed path (r10): each observed row GENERATES itself plus the
        # missing buckets strictly before its successor — one lead
        # window + one explode over the observed grain. The old shape
        # (per-key bounds groupBy + sequence axis + LEFT join back)
        # referenced the input twice, so every downstream action paid
        # the upstream aggregation two times plus a join exchange.
        # LOCF runs at the OBSERVED grain first (same window spec as
        # the lead — one exchange+sort) so a NULL observed value is
        # carried through exactly like the old dense-grain LOCF did;
        # gap rows then inherit their generating row's (filled) value.
        # The input contract is a resample output (unique per
        # (keys, bucket)); on contract-violating duplicate rows lead()
        # returns the SAME bucket, so the sequence stop is clamped to
        # the start (greatest) — the duplicate densifies to itself,
        # matching the old axis-join tolerance, instead of raising
        # "illegal sequence boundaries" (ADVICE r10).
        w = Window.partitionBy(*keys).orderBy(bucket_col)
        w_locf = w.rowsBetween(Window.unboundedPreceding, 0)
        obs = resampled.select(
            *keys,
            *[
                F.last(c, ignorenulls=True).over(w_locf).alias(c)
                if c in locf_cols
                else F.col(c)
                for c in agg_cols
            ],
            F.col(bucket_col).alias("__obs"),
            F.lead(bucket_col).over(w).alias("__nxt"),
        )
        dense = obs.select(
            *keys,
            *agg_cols,
            "__obs",
            F.explode(
                F.sequence(
                    F.col("__obs"),
                    F.greatest(
                        F.col("__obs"),
                        F.coalesce(F.col("__nxt") - step, F.col("__obs")),
                    ),
                    step,
                )
            ).alias(bucket_col),
        )
        gap = F.col(bucket_col) != F.col("__obs")
        return dense.select(
            *keys,
            bucket_col,
            *[
                F.col(c)
                if c in locf_cols
                else F.when(~gap, F.col(c)).alias(c)
                for c in agg_cols
            ],
            gap.alias("is_gap"),
        )

    # keyless path: the global bounds row is metadata-sized, and the
    # keyed lead-window alternative would need an Exchange
    # SinglePartition over the whole observed grain — keep the
    # axis-join shape here
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


def cusum_changepoints(
    resampled: DataFrame,
    value_col: str,
    keys: Sequence[str] = (),
    k_sigma: float = 0.5,
    h_sigma: float = 5.0,
    bucket_col: str = "bucket_start",
    target: float | None = None,
    sigma: float | None = None,
) -> DataFrame:
    """Two-sided CUSUM change-point flags (Page 1954) over a
    ``resample`` grid.

    The textbook recursion S⁺_t = max(0, S⁺_{t−1} + x_t − μ − κ)
    is not partial-aggregable, but it has the classic closed form

        S⁺_t = A_t − min(0, min_{j≤t} A_j),   A_t = Σ_{i≤t} z_i

    so the whole detector is ONE cumulative sum + ONE running min per
    direction — plain window algebra, SQL-oracle-replayable, over the
    same calendar-bounded per-key bucket partitions as ``rolling``
    (never proportional to raw row volume).

    κ = ``k_sigma``·σ (drift allowance), alarm at S > ``h_sigma``·σ.
    μ/σ default to the per-key series mean/stddev (the usual
    estimated-parameter caveat: a huge shift inflates the pooled σ and
    desensitizes the detector — pass explicit ``target``/``sigma``
    from a reference period when you have one). Keys with σ NULL
    (single bucket) or 0 (no variation) never alarm. Adds ``s_pos``,
    ``s_neg``, ``is_change``, ``direction`` ('up'/'down'/NULL).
    """
    if isinstance(keys, str):
        keys = [keys]
    wk = Window.partitionBy(*keys).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    mu = F.lit(float(target)) if target is not None else F.avg(value_col).over(wk)
    sd = (
        F.lit(float(sigma))
        if sigma is not None
        else F.stddev_samp(value_col).over(wk)
    )
    out = resampled.withColumn("__mu", mu).withColumn("__sd", sd)
    wcum = (
        Window.partitionBy(*keys)
        .orderBy(F.unix_timestamp(F.col(bucket_col)))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    kappa = F.lit(float(k_sigma)) * F.col("__sd")
    out = (
        out.withColumn(
            "__ap", F.sum(F.col(value_col) - F.col("__mu") - kappa).over(wcum)
        )
        .withColumn(
            "__an", F.sum(F.col("__mu") - F.col(value_col) - kappa).over(wcum)
        )
    )
    out = (
        out.withColumn("s_pos", F.col("__ap") - F.least(F.lit(0.0), F.min("__ap").over(wcum)))
        .withColumn("s_neg", F.col("__an") - F.least(F.lit(0.0), F.min("__an").over(wcum)))
    )
    h = F.lit(float(h_sigma)) * F.col("__sd")
    armed = F.col("__sd").isNotNull() & (F.col("__sd") > 0)
    up = armed & (F.col("s_pos") > h)
    down = armed & (F.col("s_neg") > h)
    return (
        out.withColumn("is_change", F.coalesce(up | down, F.lit(False)))
        .withColumn(
            "direction",
            F.when(up & down, F.lit("both"))
            .when(up, F.lit("up"))
            .when(down, F.lit("down")),
        )
        .drop("__mu", "__sd", "__ap", "__an")
    )


def holt_winters_forecast(
    resampled: DataFrame,
    value_col: str,
    key_col: str,
    season_length: int,
    horizon: int = 1,
    alpha: float = 0.3,
    beta: float = 0.1,
    gamma: float = 0.2,
    bucket_col: str = "bucket_start",
    max_group_rows: int = 2_000_000,
) -> DataFrame:
    """Per-key additive Holt-Winters (triple exponential smoothing)
    forecasts over a DENSE ``resample``/``fill_gaps`` grid — the
    capacity-planning / ingest-volume-projection step.

    The smoothing recursions are sequential by nature (each state
    depends on the previous), so this is honestly an executor-side
    per-key fold via ``applyInPandas`` — legitimate at scale for the
    same reason as LOCF: the partition is a key's BUCKET COUNT,
    bounded by the calendar, not raw row volume; ``max_group_rows``
    guards the contract with a readable error (the grouped-IRLS
    policy).

    Pinned conventions (the python oracle replays them exactly):
    dense series sorted by bucket, NULL values rejected (fill gaps
    first — a gap would silently misalign the season index); needs
    ≥ 2·season_length points; init level = mean(season 1), trend =
    (mean(season 2) − mean(season 1))/m, season_i = x_i − level;
    standard additive recursions; h-step forecast = level + h·trend +
    season[(n+h−1) mod m] from the LAST fitted season vector.

    Output: one row per (key, h in 1..horizon) with ``yhat``,
    ``forecast_ts`` (grid-spaced from the last bucket), plus the
    in-sample one-step SSE for model auditing.
    """
    if season_length < 2:
        raise ValueError(f"season_length must be >= 2: {season_length}")
    if horizon < 1:
        raise ValueError(f"horizon must be >= 1: {horizon}")
    for nm, v in (("alpha", alpha), ("beta", beta), ("gamma", gamma)):
        if not 0 < v < 1:
            raise ValueError(f"{nm} must be in (0, 1): {v}")
    m = int(season_length)
    h_max = int(horizon)
    a, b, g = float(alpha), float(beta), float(gamma)

    base = resampled.select(
        F.col(key_col).cast("string").alias("__g"),
        F.col(bucket_col).alias("__t"),
        F.col(value_col).cast("double").alias("__x"),
    )

    def fit(pdf):
        import pandas as pd

        key = pdf["__g"].iloc[0] if len(pdf) else None
        if pdf["__x"].isna().any():
            raise ValueError(
                f"holt_winters: NULL values in key {key!r} — fill gaps"
                " first (a gap misaligns the season index)"
            )
        if len(pdf) > max_group_rows:
            raise ValueError(
                f"key {key!r} has {len(pdf)} buckets >"
                f" max_group_rows={max_group_rows}"
            )
        pdf = pdf.sort_values("__t")
        x = pdf["__x"].to_numpy(dtype="float64")
        n = len(x)
        if n < 2 * m:
            return pd.DataFrame(
                columns=["__g", "h", "forecast_ts", "yhat", "sse"]
            )
        ts = pd.to_datetime(pdf["__t"])
        step = ts.iloc[-1] - ts.iloc[-2] if n >= 2 else pd.Timedelta(0)
        lvl = float(x[:m].mean())
        trd = float((x[m : 2 * m].mean() - x[:m].mean()) / m)
        season = [float(v - lvl) for v in x[:m]]
        sse = 0.0
        for t in range(n):
            s = season[t % m]
            pred = lvl + trd + s
            if t >= m:  # one-step errors only once a full season seeded
                sse += (x[t] - pred) ** 2
            new_lvl = a * (x[t] - s) + (1 - a) * (lvl + trd)
            trd = b * (new_lvl - lvl) + (1 - b) * trd
            season[t % m] = g * (x[t] - new_lvl) + (1 - g) * s
            lvl = new_lvl
        rows = []
        for h in range(1, h_max + 1):
            yhat = lvl + h * trd + season[(n + h - 1) % m]
            rows.append(
                (key, h, ts.iloc[-1] + h * step, float(yhat), float(sse))
            )
        return pd.DataFrame(
            rows, columns=["__g", "h", "forecast_ts", "yhat", "sse"]
        )

    out = base.groupBy("__g").applyInPandas(
        fit, schema="__g string, h int, forecast_ts timestamp, yhat double, sse double"
    )
    return out.select(
        F.col("__g").alias(key_col), "h", "forecast_ts", "yhat", "sse"
    )


def mann_kendall_trend(
    resampled: DataFrame,
    value_col: str,
    key_col: str,
    bucket_col: str = "bucket_start",
    max_group_rows: int = 30_000,
) -> DataFrame:
    """Per-key Mann-Kendall monotonic-trend test (Mann 1945 / Kendall)
    over a ``resample`` grid — "is this metric drifting?" without
    assuming linearity or a distribution (the nonparametric sibling of
    CUSUM's level-shift detector): S = Σ_{i<j} sgn(x_j − x_i), the
    tie-corrected normal approximation for Var(S), the ±1 continuity
    correction, and Sen's slope (median of pairwise slopes — the
    robust trend magnitude).

    S is inherently pairwise, so this is an executor-side per-key
    ``applyInPandas`` fold, legitimate by the SAME calendar-bounded
    argument as Holt-Winters (a key's bucket count, never raw volume),
    with the grouped-IRLS ``max_group_rows`` guard. The pairwise work
    is CHUNKED (ADVICE r6): S and the tie counts accumulate per
    O(B·n) block, and only the Sen slope values (n(n−1)/2 doubles —
    the exact median needs them all) are materialized, never a dense
    n×n matrix; the ``max_group_rows`` guard is sized to THAT slope
    storage (30k default ≈ 3.6 GiB of slopes — comfortable executor
    headroom, and keys in the 10k–100k bucket range that the chunked
    rewrite handles fine no longer hard-fail; the error says exactly
    which knob to raise and what it costs). NULL values excluded per key (MK needs no
    dense grid; gaps
    just drop pairs). Keys with < 3 usable buckets are excluded (no
    test). Output: (key, n, s, var_s, z, p_value, sen_slope,
    direction) with direction in up/down/none at p < 0.05.
    """
    base = resampled.select(
        F.col(key_col).cast("string").alias("__g"),
        F.col(bucket_col).alias("__t"),
        F.col(value_col).cast("double").alias("__x"),
    ).where(F.col("__x").isNotNull() & F.col("__t").isNotNull())

    def fit(pdf):
        import math

        import numpy as np
        import pandas as pd

        key = pdf["__g"].iloc[0] if len(pdf) else None
        if len(pdf) > max_group_rows:
            n_ = len(pdf)
            raise ValueError(
                f"key {key!r} has {n_} buckets >"
                f" max_group_rows={max_group_rows}: the bound tracks Sen"
                f" slope storage only (~n²/2 doubles ≈"
                f" {n_ * n_ * 4 / 2**30:.1f} GiB here; S and ties are"
                f" chunked O(B·n)) — raise max_group_rows if the executor"
                f" has that much headroom"
            )
        pdf = pdf.sort_values("__t")
        x = pdf["__x"].to_numpy(dtype="float64")
        n = len(x)
        if n < 3:
            return pd.DataFrame(
                columns=["__g", "n", "s", "var_s", "z", "p_value",
                         "sen_slope", "direction"]
            )
        ts = pd.to_datetime(pdf["__t"]).astype("datetime64[ns]").astype("int64").to_numpy() / 1e9
        # chunked pairwise accumulation: per block of B source rows,
        # diff/dt blocks are O(B·n); only the slope values (needed in
        # full for the exact median) are kept
        B = 2048
        s = 0.0
        slopes = []
        for i0 in range(0, n - 1, B):
            i1 = min(i0 + B, n - 1)
            d_blk = x[None, i0 + 1:] - x[i0:i1, None]    # (B, n-i0-1)
            dt_blk = ts[None, i0 + 1:] - ts[i0:i1, None]
            # mask the lower-triangle spill (pairs with j <= i)
            jj = np.arange(i0 + 1, n)[None, :]
            ii = np.arange(i0, i1)[:, None]
            keep = jj > ii
            d_pairs = d_blk[keep]
            dt_pairs = dt_blk[keep]
            s += float(np.sign(d_pairs).sum())
            ok = dt_pairs != 0
            if ok.any():
                slopes.append(d_pairs[ok] / dt_pairs[ok])
        # tie correction over value groups
        _, counts = np.unique(x, return_counts=True)
        var_s = (
            n * (n - 1) * (2 * n + 5)
            - sum(int(t) * (t - 1) * (2 * t + 5) for t in counts)
        ) / 18.0
        if var_s > 0:
            z = (s - 1) / math.sqrt(var_s) if s > 0 else (
                (s + 1) / math.sqrt(var_s) if s < 0 else 0.0
            )
        else:
            z = 0.0
        p = math.erfc(abs(z) / math.sqrt(2.0))
        sen = float(np.median(np.concatenate(slopes))) if slopes else 0.0
        direction = "up" if (p < 0.05 and s > 0) else (
            "down" if (p < 0.05 and s < 0) else "none"
        )
        return pd.DataFrame(
            [(key, n, s, var_s, z, p, sen, direction)],
            columns=["__g", "n", "s", "var_s", "z", "p_value",
                     "sen_slope", "direction"],
        )

    out = base.groupBy("__g").applyInPandas(
        fit,
        schema="__g string, n long, s double, var_s double, z double,"
        " p_value double, sen_slope double, direction string",
    )
    return out.select(F.col("__g").alias(key_col), "n", "s", "var_s", "z",
                      "p_value", "sen_slope", "direction")


def py_pelt_l2(x: list, penalty: float, min_size: int = 2) -> list:
    """Exact PELT segmentation (Killick, Fearnhead & Eckley 2012) for
    the L2 (piecewise-constant-mean) cost — ONE shared implementation
    (executors and the test oracle import the same function, the
    py_viterbi convention). Returns the sorted changepoint indices
    (first index of each NEW segment; [] = no change).

    Cost of a segment is its residual sum of squares around its own
    mean, O(1) per candidate via prefix sums; PELT's pruning keeps
    the candidate set small when changes are frequent, with the exact
    optimum guaranteed for any penalty."""
    import math

    n = len(x)
    if n < 2 * min_size:
        return []
    S = [0.0] * (n + 1)
    S2 = [0.0] * (n + 1)
    for i, v in enumerate(x):
        S[i + 1] = S[i] + v
        S2[i + 1] = S2[i] + v * v

    def cost(a: int, b: int) -> float:  # segment x[a:b]
        m = b - a
        s = S[b] - S[a]
        return (S2[b] - S2[a]) - s * s / m

    INF = math.inf
    F_ = [INF] * (n + 1)
    F_[0] = -penalty
    last = [0] * (n + 1)
    cands = [0]
    for t in range(min_size, n + 1):
        # s becomes a legal last-changepoint candidate exactly when a
        # min_size segment fits after it (s = t − min_size joins now —
        # never earlier, so pruning below only ever sees eligible s)
        s_new = t - min_size
        if s_new > 0 and F_[s_new] < INF:
            cands.append(s_new)
        best, barg = INF, 0
        for s in cands:
            val = F_[s] + cost(s, t) + penalty
            # strict < keeps the SMALLEST candidate on ties (fewer,
            # earlier changepoints — deterministic)
            if val < best:
                best, barg = val, s
        F_[t], last[t] = best, barg
        # PELT prune (K = 0 for the L2 cost): a candidate whose
        # unpenalized path already exceeds F[t] can never win again
        cands = [s for s in cands if F_[s] + cost(s, t) <= F_[t]]
    cps = []
    t = n
    while t > 0:
        s = last[t]
        if s > 0:
            cps.append(s)
        t = s
    return sorted(cps)


def pelt_changepoints(
    resampled: DataFrame,
    value_col: str,
    key_col: str,
    bucket_col: str = "bucket_start",
    penalty: float | None = None,
    min_size: int = 2,
    max_group_rows: int = 100_000,
) -> DataFrame:
    """Per-key exact penalized changepoint segmentation over a
    ``resample`` grid — the BATCH-EXACT member of the change-detection
    trio (X119 CUSUM is the online level-shift monitor; X147
    Mann-Kendall the monotone-trend test; PELT finds the globally
    OPTIMAL piecewise-constant segmentation for a given penalty,
    catching multiple shifts CUSUM's single-alarm reset can smear).

    ``penalty=None`` uses the BIC default 2·σ̂²·log n with σ̂² the
    median of per-key first-difference variances halved (the standard
    robust noise estimate), computed per key inside the fold — no
    global pass. Executor-side per-key ``applyInPandas`` (the
    Holt-Winters calendar-bounded argument); prefix-sum O(1) segment
    costs, PELT pruning, exact optimum. NULLs excluded per key.

    Output: one row per (key, segment): ``(key, segment, start_bucket,
    end_bucket, n, mean)`` — segment 0 is the earliest; keys with no
    change yield one whole-series row.
    """
    if min_size < 1:
        raise ValueError(f"min_size must be >= 1: {min_size}")
    base = resampled.select(
        F.col(key_col).cast("string").alias("__g"),
        F.col(bucket_col).alias("__t"),
        F.col(value_col).cast("double").alias("__x"),
    ).where(F.col("__x").isNotNull() & F.col("__t").isNotNull())

    def fit(pdf):
        import numpy as np
        import pandas as pd

        cols = ["__g", "segment", "start_bucket", "end_bucket", "n", "mean"]
        key = pdf["__g"].iloc[0] if len(pdf) else None
        if len(pdf) > max_group_rows:
            raise ValueError(
                f"key {key!r} has {len(pdf)} buckets >"
                f" max_group_rows={max_group_rows}"
            )
        pdf = pdf.sort_values("__t")
        x = pdf["__x"].to_numpy(dtype="float64")
        n = len(x)
        if n == 0:
            return pd.DataFrame(columns=cols)
        if penalty is None:
            if n >= 3:
                d = np.diff(x)
                sig2 = max(float(np.median(d * d) / 2.0), 1e-12)
            else:
                sig2 = 1e-12
            pen = 2.0 * sig2 * float(np.log(max(n, 2)))
        else:
            pen = float(penalty)
        cps = py_pelt_l2([float(v) for v in x], pen, min_size) if n >= 2 * min_size else []
        bounds = [0] + cps + [n]
        rows = []
        ts = pdf["__t"].to_numpy()
        for i in range(len(bounds) - 1):
            a, b = bounds[i], bounds[i + 1]
            rows.append(
                (key, i, ts[a], ts[b - 1], b - a, float(np.mean(x[a:b])))
            )
        return pd.DataFrame(rows, columns=cols)

    out = base.groupBy("__g").applyInPandas(
        fit,
        schema=f"__g string, segment int, start_bucket timestamp,"
        f" end_bucket timestamp, n long, mean double",
    )
    return out.select(
        F.col("__g").alias(key_col), "segment", "start_bucket",
        "end_bucket", "n", F.round("mean", 6).alias("mean"),
    )


def ohlc_bars(
    df: DataFrame,
    period: str,
    value_col: str,
    keys: Sequence[str] = (),
    ts_col: str = "ts",
) -> DataFrame:
    """Open/high/low/close bars per (keys, period bucket) — the
    finance-standard rollup, equally the right shape for any gauge
    (first/last reading per device per hour). One partial-aggregable
    groupBy: open/close are ``min_by``/``max_by`` on a NULL-masked
    (ts, value) ordering struct — a NULL reading never becomes the
    open/close, and same-timestamp ties break deterministically by
    value (min for open, max for close); high/low/volume ride the
    same aggregate. NO window anywhere — the classic mistake is
    first()/last() over an unordered groupBy (nondeterministic) or a
    per-key ordered window (serializes hot keys).

    NULL values are excluded from all five statistics; buckets with
    only NULL values don't appear (no reading, no bar). NTZ-tolerant.
    """
    if isinstance(keys, str):
        keys = [keys]
    v = F.col(value_col).cast("double")
    ts = F.col(ts_col).cast("timestamp")
    ordk = F.when(v.isNotNull(), F.struct(ts.alias("t"), v.alias("v")))
    return (
        df.where(F.col(ts_col).isNotNull() & v.isNotNull())
        .groupBy(*keys, F.window(ts_col, period).alias("__w"))
        .agg(
            F.min_by(v, ordk).alias("open"),
            F.max(v).alias("high"),
            F.min(v).alias("low"),
            F.max_by(v, ordk).alias("close"),
            F.count(v).alias("n"),
            F.round(F.sum(v), 6).alias("volume"),
        )
        .select(
            *keys, F.col("__w.start").alias("bucket_start"),
            "open", "high", "low", "close", "n", "volume",
        )
    )


def seasonal_decompose(
    df: DataFrame,
    period: int,
    value_col: str,
    order_col: str = "bucket_start",
    keys: Sequence[str] = (),
) -> DataFrame:
    """Classical additive seasonal decomposition per key:
    ``value = trend + seasonal + resid`` (the moving-average method —
    Hyndman & Athanasopoulos FPP §3.4; the model-free baseline every
    "is this spike seasonal or real?" question wants before anything
    ARIMA-shaped).

    Input must be a REGULAR grid per key (``resample`` → ``fill_gaps``
    upstream — gaps would silently misalign phases). Steps, all
    relational:

    1. trend: centered moving average over one season — for even
       ``period`` the standard 2×m MA (half-weight endpoints), for odd
       a plain centered mean; the first/last ⌊m/2⌋ rows have NULL
       trend (honest edges, no padding).
    2. seasonal: per (key, phase = position mod period) mean of the
       detrended values, then centered so Σ seasonal = 0 per key (the
       identifiability fix).
    3. resid = value − trend − seasonal (NULL where trend is NULL).

    Scale shape: one per-key window pass (row_number + the MA frame —
    partition bounded by key history), one (key, phase) groupBy —
    ≤ keys × period rows, metadata — joined back on (key, phase).
    Output: input columns + ``phase, trend, seasonal, resid``.
    """
    if isinstance(keys, str):
        keys = [keys]
    keys = list(keys)
    if period < 2:
        raise ValueError(f"period must be >= 2: {period}")
    x = F.col(value_col).cast("double")
    w_ord = (
        Window.partitionBy(*keys).orderBy(order_col)
        if keys
        else Window.partitionBy().orderBy(order_col)
    )
    base = df.withColumn("__rn", F.row_number().over(w_ord)).withColumn(
        "phase", (F.col("__rn") - 1) % period
    )
    h = period // 2
    if period % 2 == 0:
        # 2×m MA: (0.5·x[−h] + x[−h+1..h−1] + 0.5·x[h]) / m, defined
        # only where the full frame exists
        frame = w_ord.rowsBetween(-h, h)
        cnt = F.count(x).over(frame)
        s_all = F.sum(x).over(frame)
        first_v = F.first(x).over(frame)
        last_v = F.last(x).over(frame)
        trend = F.when(
            cnt == 2 * h + 1,
            (s_all - 0.5 * first_v - 0.5 * last_v) / period,
        )
    else:
        frame = w_ord.rowsBetween(-h, h)
        cnt = F.count(x).over(frame)
        trend = F.when(cnt == 2 * h + 1, F.avg(x).over(frame))
    base = base.withColumn("trend", trend)
    detr = base.withColumn("__d", x - F.col("trend"))
    ph = detr.groupBy(*keys, "phase").agg(F.avg("__d").alias("__pm"))
    w_keys = Window.partitionBy(*keys) if keys else Window.partitionBy()
    ph = ph.withColumn("seasonal", F.col("__pm") - F.avg("__pm").over(w_keys))
    # no broadcast hint: the phase table is keys × period rows —
    # bounded per key but unbounded in keys; AQE broadcasts when small
    out = detr.join(ph.select(*keys, "phase", "seasonal"), [*keys, "phase"])
    return out.withColumn(
        "resid", x - F.col("trend") - F.col("seasonal")
    ).drop("__rn", "__d")


def seasonal_anomalies(
    df: DataFrame,
    period: int,
    value_col: str,
    order_col: str = "bucket_start",
    keys: Sequence[str] = (),
    k: float = 3.5,
    approx: bool = False,
) -> DataFrame:
    """Seasonality-aware anomaly detection per key: decompose
    (:func:`seasonal_decompose` — value = trend + seasonal + resid)
    and flag rows whose RESIDUAL is a robust outlier
    (``robust.mad_outliers`` on ``resid``, the |0.6745·(x−med)/MAD| >
    k rule). The composition answers the question neither piece
    answers alone: "is this spike real, or just the daily peak?" — a
    raw-value MAD flags every seasonal crest; scoring the residual
    flags only departures FROM the seasonal+trend pattern.

    Same input contract as the decomposition (regular grid per key —
    ``resample``/``fill_gaps`` upstream). Edge rows with NULL trend
    (the first/last ⌊period/2⌋ per key) have NULL resid and pass
    through unflagged — honest edges, matching both components'
    documented NULL semantics. Output: the decomposition columns plus
    ``group_median, group_mad, robust_z, is_outlier`` (computed over
    resid). ``approx`` swaps exact medians for the GK sketch — the
    web-scale key-grain path.
    """
    from data_export_tool_spark.operators.robust import mad_outliers

    dec = seasonal_decompose(
        df, period, value_col, order_col=order_col, keys=keys
    )
    return mad_outliers(dec, "resid", by=keys, k=k, approx=approx)


def _order_pos(dtype: str, order_col: str) -> Column:
    """The fractional-position expression ``interpolate_linear`` uses
    for its distance weights (epoch micros for timestamps, epoch days
    for dates, plain double otherwise) — shared by the fused
    :func:`fill_gaps_interpolated` so both paths blend with EXACTLY the
    same doubles."""
    if dtype.startswith("timestamp"):
        return F.unix_micros(F.col(order_col)).cast("double")
    if dtype == "date":
        return F.datediff(F.col(order_col), F.lit("1970-01-01")).cast(
            "double"
        )
    return F.col(order_col).cast("double")


def interpolate_linear(
    df: DataFrame,
    value_cols: Sequence[str],
    keys: Sequence[str] = (),
    order_col: str = "bucket_start",
    suffix: str = "_interp",
) -> DataFrame:
    """Linear interpolation across NULL runs per key — the gauge-
    series companion to :func:`fill_gaps`' LOCF: a sensor that read
    10 at t₀ and 20 at t₄ most plausibly passed 12.5/15/17.5 in
    between, not 10-10-10. Appends ``{col}{suffix}`` per value
    column: observed values pass through exactly; interior NULLs get
    the distance-weighted blend of the nearest observed neighbors;
    leading/trailing NULLs stay NULL (no extrapolation — honest
    edges, the ``seasonal_decompose`` convention).

    Two per-key window passes (previous/next observed
    ``(position, value)`` pair via ``last/first ignorenulls`` over an
    unbounded frame), pure column algebra between them — the LOCF
    plan shape doubled, no extra exchange. Works on any orderable
    numeric/time ``order_col``; weights use the order column's
    fractional position (epoch seconds for timestamps).
    """
    if isinstance(value_cols, str):
        value_cols = [value_cols]
    value_cols = list(value_cols)
    if not value_cols:
        raise ValueError("value_cols must name at least one column")
    if isinstance(keys, str):
        keys = [keys]
    keys = list(keys)
    out = df.withColumn("__pos", _order_pos(dict(df.dtypes)[order_col], order_col))
    w_prev = (
        Window.partitionBy(*keys)
        .orderBy("__pos")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    # the "next observed" lookup must NOT use a (0, unboundedFollowing)
    # frame: Spark's UnboundedFollowingWindowFunctionFrame re-evaluates
    # the aggregate from scratch per row — O(rows²) per key (measured:
    # 310s for 720-bucket keys at sf0.1). A running last() over the
    # REVERSED ordering is the same value in O(rows).
    w_next = (
        Window.partitionBy(*keys)
        .orderBy(F.col("__pos").desc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    for c in value_cols:
        v = F.col(c).cast("double")
        obs = F.when(
            v.isNotNull(),
            F.struct(F.col("__pos").alias("p"), v.alias("val")),
        )
        prev = F.last(obs, ignorenulls=True).over(w_prev)
        nxt = F.last(obs, ignorenulls=True).over(w_next)
        p0, v0 = prev["p"], prev["val"]
        p1, v1 = nxt["p"], nxt["val"]
        frac = F.when(
            p1 != p0, (F.col("__pos") - p0) / (p1 - p0)
        ).otherwise(F.lit(0.0))
        interp = F.when(v.isNotNull(), v).otherwise(
            F.when(
                prev.isNotNull() & nxt.isNotNull(),
                v0 + (v1 - v0) * frac,
            )
        )
        out = out.withColumn(c + suffix, interp)
    return out.drop("__pos")


def fill_gaps_interpolated(
    resampled: DataFrame,
    period_seconds: int,
    value_cols: Sequence[str],
    keys: Sequence[str] = (),
    bucket_col: str = "bucket_start",
    locf_cols: Sequence[str] = (),
    suffix: str = "_interp",
) -> DataFrame:
    """Fused ``fill_gaps`` → ``interpolate_linear``: identical result
    (row-for-row, same doubles — equivalence test-pinned), different
    plan. The composed form sorts the DENSE grid twice (ascending for
    the prev-observed window, descending for next-observed) on top of
    ``fill_gaps``' own observed-grain sort; but every interpolation
    input — the previous/next non-NULL observed neighbor — is constant
    across the gap run one observed row generates, so it can be
    computed BEFORE the explode, at the observed grain (r11, guide
    §2.2/§2.4: same (keys, bucket) exchange serves the lead, the LOCF
    and both neighbor lookups; the dense grid is never sorted at all).

    Contract: ``value_cols`` ⊆ the aggregate columns; keys required
    (the keyless path has no explode to fuse past — falls back to the
    composition). Semantics notes inherited from the two operators:
    LOCF runs before interpolation (a ``value_cols`` ∩ ``locf_cols``
    column interpolates over its FILLED values), leading/trailing
    NULLs stay NULL, observed values pass through exactly.
    """
    if isinstance(value_cols, str):
        value_cols = [value_cols]
    value_cols = list(value_cols)
    if not value_cols:
        raise ValueError("value_cols must name at least one column")
    if isinstance(keys, str):
        keys = [keys]
    keys = list(keys)
    if isinstance(locf_cols, str):
        locf_cols = [locf_cols]
    if not keys:
        return interpolate_linear(
            fill_gaps(
                resampled, period_seconds, keys, bucket_col, locf_cols
            ),
            value_cols,
            keys,
            order_col=bucket_col,
            suffix=suffix,
        )
    agg_cols = [
        c for c in resampled.columns if c not in (*keys, bucket_col)
    ]
    missing = [c for c in value_cols if c not in agg_cols]
    if missing:
        raise ValueError(
            f"value_cols not in the aggregate columns: {missing}"
        )
    step = F.expr(f"INTERVAL {period_seconds} SECONDS")
    dtype = dict(resampled.dtypes)[bucket_col]

    def obs_struct(c: str) -> Column:
        v = F.col(c).cast("double")
        return F.when(
            v.isNotNull(),
            F.struct(
                _order_pos(dtype, bucket_col).alias("p"), v.alias("val")
            ),
        )

    # pass 1 (ascending — ONE exchange + sort at the observed grain):
    # LOCF fill + the successor bucket, exactly fill_gaps' keyed shape
    w = Window.partitionBy(*keys).orderBy(bucket_col)
    w_run = w.rowsBetween(Window.unboundedPreceding, 0)
    obs = resampled.select(
        *keys,
        *[
            F.last(c, ignorenulls=True).over(w_run).alias(c)
            if c in locf_cols
            else F.col(c)
            for c in agg_cols
        ],
        bucket_col,
        F.lead(bucket_col).over(w).alias("__nxt"),
    )
    # pass 2 (same ordering — no new sort): previous non-NULL observed
    # (position, value) per value column, current row included, over
    # the POST-LOCF values — interpolate_linear's w_prev at the
    # observed grain (gap rows never hold the last non-NULL, so the
    # dense-grid lookup collapses to this)
    obs = obs.select(
        "*",
        *[
            F.last(obs_struct(c), ignorenulls=True)
            .over(w_run)
            .alias(f"__pnn_{c}")
            for c in value_cols
        ],
    )
    # pass 3 (descending sort, same partitioning — no new exchange):
    # next non-NULL observed STRICTLY after this row (frame excludes
    # the current row: a non-NULL row is its own "previous", never its
    # own "next"; its gap run's next neighbor is the first non-NULL
    # successor)
    w_rev = (
        Window.partitionBy(*keys)
        .orderBy(F.col(bucket_col).desc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    obs = obs.select(
        "*",
        *[
            F.last(obs_struct(c), ignorenulls=True)
            .over(w_rev)
            .alias(f"__nnn_{c}")
            for c in value_cols
        ],
    )
    dense = obs.select(
        *keys,
        *agg_cols,
        *[f"__pnn_{c}" for c in value_cols],
        *[f"__nnn_{c}" for c in value_cols],
        F.col(bucket_col).alias("__obs"),
        F.explode(
            F.sequence(
                F.col(bucket_col),
                F.greatest(
                    F.col(bucket_col),
                    F.coalesce(F.col("__nxt") - step, F.col(bucket_col)),
                ),
                step,
            )
        ).alias(bucket_col),
    )
    gap = F.col(bucket_col) != F.col("__obs")

    def interp(c: str) -> Column:
        vm = F.col(c) if c in locf_cols else F.when(~gap, F.col(c))
        v = vm.cast("double")
        prev, nxt = F.col(f"__pnn_{c}"), F.col(f"__nnn_{c}")
        p0, v0 = prev["p"], prev["val"]
        p1, v1 = nxt["p"], nxt["val"]
        pos = _order_pos(dtype, bucket_col)
        frac = F.when(p1 != p0, (pos - p0) / (p1 - p0)).otherwise(
            F.lit(0.0)
        )
        return F.when(v.isNotNull(), v).otherwise(
            F.when(prev.isNotNull() & nxt.isNotNull(), v0 + (v1 - v0) * frac)
        )

    return dense.select(
        *keys,
        bucket_col,
        *[
            F.col(c)
            if c in locf_cols
            else F.when(~gap, F.col(c)).alias(c)
            for c in agg_cols
        ],
        gap.alias("is_gap"),
        *[interp(c).alias(c + suffix) for c in value_cols],
    )
