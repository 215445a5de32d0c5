"""Gaps-and-islands: consecutive-run detection per key.

The streak/outage primitive every engagement and reliability pipeline
needs — "how many consecutive days did this user show up", "which
sensor grains are missing", "longest uninterrupted activity run" —
re-expressed Spark-first. The reference's SQL corpus leans on
row-number windows for latest-per-entity (SURVEY §2e W1/W2); this is
the same window discipline applied to run detection, the classic
gaps-and-islands rewrite (Ben-Gan, SQL Server MVP Deep Dives 2009):

    island_id = grain − step · dense_rank() over (key ORDER BY grain)

is constant exactly while consecutive distinct grains differ by
``step``, so one per-key window pass + one (key, island) groupBy
yields every run with its bounds and length. ``dense_rank`` (not
``row_number``) keeps duplicate grains — two events on the same day —
inside one island instead of splitting it.

Scale shape
-----------
ONE hash exchange on the key (the window's partitionBy; the follow-up
groupBy keys on (key, island_id) — a superset, so AQE plans it
map-side on the window's partitioning). Per-key state is the window
sort, bounded by that key's row count — the same bound as every W1
dedup site in the reference corpus; there is no global sort and no
driver materialization. ``gaps()`` derives the complement (the holes
between islands) from the island frame itself with one more per-key
``lead`` window — metadata-sized relative to the input.

Oracle: the identical dense-rank arithmetic runs in DuckDB
(tests/test_islands.py → OPCHECK ``islands`` / ``gaps``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["islands", "gaps", "longest_streak"]


def _grain(col: str, dtype: str):
    """Integer grain expression: dates count days since epoch so a
    1-day step means calendar-consecutive; ints/longs pass through."""
    c = F.col(col)
    if dtype in ("date", "timestamp"):
        return F.datediff(c.cast("date"), F.lit("1970-01-01"))
    return c.cast("long")


def islands(
    df: DataFrame,
    key_cols: list[str],
    order_col: str,
    step: int = 1,
) -> DataFrame:
    """One row per maximal run of ``step``-consecutive grains per key.

    Returns ``key_cols + [island_start, island_end, island_length,
    n_rows]`` where start/end are in the original column's type,
    ``island_length`` counts DISTINCT grains in the run and ``n_rows``
    counts underlying rows (duplicates included).
    """
    if not key_cols:
        raise ValueError("key_cols must name at least one column")
    if step <= 0:
        raise ValueError(f"step must be positive, got {step}")
    dtype = dict(df.dtypes)[order_col]
    g = _grain(order_col, dtype)
    w = Window.partitionBy(*key_cols).orderBy(g)
    # dense_rank: duplicate grains share a rank, so grain - step*rank
    # stays constant across them and they land in one island
    marked = df.where(F.col(order_col).isNotNull()).withColumn(
        "__island", g - F.lit(step) * F.dense_rank().over(w)
    )
    return (
        marked.groupBy(*key_cols, "__island")
        .agg(
            F.min(order_col).alias("island_start"),
            F.max(order_col).alias("island_end"),
            F.count_distinct(F.col(order_col)).alias("island_length"),
            F.count(F.lit(1)).alias("n_rows"),
        )
        .drop("__island")
    )


def gaps(
    df: DataFrame,
    key_cols: list[str],
    order_col: str,
    step: int = 1,
) -> DataFrame:
    """The holes between a key's islands: one row per maximal missing
    run strictly inside the key's observed range. Returns
    ``key_cols + [gap_start, gap_end, gap_length]`` in GRAIN units
    (day numbers for dates — callers wanting dates add them back with
    ``date_add``; keeping the arithmetic integral keeps it exact).
    """
    isl = islands(df, key_cols, order_col, step)
    dtype = dict(df.dtypes)[order_col]
    end_g = _grain("island_end", dtype)
    start_g = _grain("island_start", dtype)
    w = Window.partitionBy(*key_cols).orderBy(start_g)
    nxt = F.lead(start_g).over(w)
    return (
        isl.select(*key_cols, end_g.alias("__end"), nxt.alias("__next"))
        .where(F.col("__next").isNotNull())
        .select(
            *key_cols,
            (F.col("__end") + step).alias("gap_start"),
            (F.col("__next") - step).alias("gap_end"),
            (
                (F.col("__next") - F.col("__end")) / step - 1
            ).cast("long").alias("gap_length"),
        )
    )


def longest_streak(
    df: DataFrame,
    key_cols: list[str],
    order_col: str,
    step: int = 1,
) -> DataFrame:
    """Each key's single longest island (ties broken by earliest
    start — deterministic): the leaderboard form. One more per-key
    top-1 window over the island frame (W1 discipline)."""
    isl = islands(df, key_cols, order_col, step)
    w = Window.partitionBy(*key_cols).orderBy(
        F.col("island_length").desc(), F.col("island_start").asc()
    )
    return (
        isl.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .drop("__rn")
    )
