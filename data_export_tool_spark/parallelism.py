"""Scan-parallelism guard for CPU-bound operators.

Spark sizes parquet scan partitions by *bytes*
(``spark.sql.files.maxPartitionBytes``), which is the right policy when
the cost of a task is dominated by I/O. The dedup / similarity / text
operators invert that: a few hundred bytes of text or a 64-float
embedding fans out into shingle explosion, 64-bit signature votes, or
interpreted higher-order-function cosine folds, so a "small" file that
arrives as one scan partition serializes the whole operator onto one
core (measured 8.1 s → 1.0 s for the sf0.1 shingle explode on
local[32]).

``fan_out`` repartitions **only when the plan has fewer partitions than
the session's parallelism** — at production scale (thousands of scan
partitions for a 100 TB table) it is a no-op and the plan keeps its
scan-aligned partitioning; on small inputs it costs one tiny shuffle
and unlocks every core. Catalyst still pushes filters/pruning through
the Repartition node, so scans keep their ``PushedFilters``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def fan_out(df: DataFrame, target: int | None = None) -> DataFrame:
    """Repartition ``df`` up to the session's default parallelism iff it
    currently has fewer partitions; no-op (and no shuffle) otherwise."""
    spark = df.sparkSession
    if target is None:
        target = spark.sparkContext.defaultParallelism
    try:
        current = df.rdd.getNumPartitions()
    except Exception:  # unresolvable plans (e.g. streaming) pass through
        return df
    if current < target:
        return df.repartition(target)
    return df
