"""Deterministic sampling and shard packing (training-data pipeline).

A 100 TB corpus is never trained on wholesale: pipelines down-sample
per-source/per-language to a target *mixture*, then pack the survivors
into fixed-token-budget shards. Both steps here are deterministic
functions of the row key — no RNG state, so re-runs, retries and
incremental backfills all select the same rows (the property
``df.sample()`` cannot give you across jobs).

Everything is pure column algebra (md5 + integer arithmetic + window
sums) — JVM-side, codegen-friendly, reproducible bit-for-bit in any
engine with md5 (the DuckDB oracles replay the same expressions).
"""

from __future__ import annotations

from collections.abc import Mapping

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

#: resolution of sampling rates: rate is quantized to 1/1e6
SAMPLE_MOD = 1_000_000


def sample_bucket(key: Column, mod: int = SAMPLE_MOD) -> Column:
    """Uniform deterministic bucket in [0, mod) from a row key: the low
    32 bits of md5(key), mod ``mod``. Positive in 64-bit arithmetic, so
    the same expression reproduces anywhere (DuckDB:
    ``('0x' || substring(md5(k), 9, 8))::UBIGINT % mod``)."""
    return (
        F.conv(F.substring(F.md5(key.cast("string")), 9, 8), 16, 10).cast("long")
        % F.lit(mod)
    )


def deterministic_sample(
    df: DataFrame,
    key_col: str,
    rate: float | None = None,
    *,
    strata_col: str | None = None,
    rates: Mapping[str, float] | None = None,
    default_rate: float = 0.0,
    mod: int = SAMPLE_MOD,
) -> DataFrame:
    """Keep a deterministic ``rate`` fraction of rows (optionally a
    different rate per stratum — the "data mixture" operator).

    ``rates`` maps stratum value → keep-rate; strata not listed get
    ``default_rate``. Selection is ``sample_bucket(key) < rate*mod`` —
    a scan-level filter with no shuffle, no RNG, and nested sampling:
    the 10% sample is a superset of the 5% sample, so mixtures can be
    re-weighted without re-selecting disjoint rows.

    Scale: embarrassingly parallel (per-row filter on the scan); the
    only cost is one md5 per row.
    """
    if (rate is None) == (rates is None):
        raise ValueError("pass exactly one of rate= or rates=")
    bucket = sample_bucket(F.col(key_col), mod)
    # round, don't truncate: 0.3 * 1e6 is 299999.99…, and the threshold
    # must equal the integer an oracle writes as a literal
    if rates is None:
        return df.filter(bucket < int(round(rate * mod)))
    if strata_col is None:
        raise ValueError("rates= requires strata_col=")
    thresh: Column = F.lit(int(round(default_rate * mod)))
    for value, r in sorted(rates.items()):
        thresh = F.when(
            F.col(strata_col) == value, int(round(r * mod))
        ).otherwise(thresh)
    return df.filter(bucket < thresh)


def pack_token_shards(
    df: DataFrame,
    token_col: str,
    budget: int,
    order_col: str = "doc_id",
    strata_col: str | None = None,
) -> DataFrame:
    """Assign each row to a fixed-token-budget training shard.

    Rows are laid out in ``order_col`` order (within ``strata_col`` if
    given); a running token sum places each row at a byte-offset-like
    position, and the shard id is ``start_offset // budget`` — i.e.
    contiguous token ranges, deterministically, in one window pass.

    Adds ``cum_tokens`` (running total including this row) and
    ``shard_id``. A row straddling a boundary belongs to the shard its
    first token falls in (shards can overflow by at most one document,
    the standard "don't split documents" packing).

    Scale: one shuffle (the window partition/sort). With a stratum
    column, parallelism = number of strata and each stratum sorts
    independently; for a single giant stratum, pre-split into
    hash-ranges and pack per range (two-phase prefix sum) — the window
    form is kept here because shard layout is usually per-source/
    per-language anyway.
    """
    if strata_col is None:
        w = Window.orderBy(order_col)
    else:
        w = Window.partitionBy(strata_col).orderBy(order_col)
    cum = F.sum(token_col).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return df.withColumn("cum_tokens", cum).withColumn(
        "shard_id",
        F.floor((F.col("cum_tokens") - F.col(token_col)) / F.lit(budget)).cast(
            "long"
        ),
    )
