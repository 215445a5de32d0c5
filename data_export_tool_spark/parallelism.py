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

import os

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: rows a single task absorbs comfortably for the two-phase degrade
#: policy below — metadata-narrow rows (id, key, count ≈ tens of
#: bytes), so 2M rows ≈ a few hundred MB of sort/window spill headroom
ROWS_PER_TASK = 2_000_000


def footer_row_count(path: str) -> int | None:
    """Row count from a local parquet file's footer — a driver-side
    metadata read, no Spark job. None when the layout isn't a local
    single file (e.g. a sharded production table): callers then keep
    the scale path rather than guessing."""
    try:
        import pyarrow.parquet as pq

        return pq.ParquetFile(path).metadata.num_rows
    except Exception:
        return None


def two_phase_preferred(
    path: str, rows_per_task: int = ROWS_PER_TASK
) -> bool:
    """THE tiny-input degrade policy, shared by every two-phase
    operator (exact-dedup join-back, shard packing, the funnel fold):
    keep the de-skewed two-phase scale shape unless the parquet footer
    PROVES the input fits one task's window, in which case the cheaper
    single-pass/window form is identical output for ~half the cost.
    Large or unreadable layouts always keep the scale shape;
    ``SPARK_GRAFT_FORCE_TWO_PHASE=1`` pins it for plan contracts."""
    if os.environ.get("SPARK_GRAFT_FORCE_TWO_PHASE"):
        return True
    rows = footer_row_count(path)
    return rows is None or rows > rows_per_task


def degraded_range_count(
    path: str, cap: int = 32, rows_per_task: int = ROWS_PER_TASK
) -> int:
    """Range count for two-phase range-partitioned operators under the
    same policy: ``cap`` at scale (or when the footer is unreadable /
    forced), else just enough ranges that each stays within one task's
    row budget — 1 for provably tiny inputs. Ceil division: a 3.9M-row
    table must get 2 ranges, not degrade to a single-task window
    nearly twice the per-range budget."""
    if os.environ.get("SPARK_GRAFT_FORCE_TWO_PHASE"):
        return cap
    rows = footer_row_count(path)
    if rows is None:
        return cap
    return max(1, min(cap, -(-rows // rows_per_task)))


def pin_above_exchange(col: Column) -> Column:
    """Wrap a projected column so a later ``where`` on it CANNOT be
    substituted and pushed below the projection (and hence below a
    ``fan_out`` repartition).

    ``shuffle(array(col))[0]`` is value-identical to ``col`` (a
    permutation of one element), but ``shuffle`` is flagged
    nondeterministic, which stops ``PushDownPredicates`` from moving a
    filter on the alias through the Project. The wrapper must be one
    the optimizer cannot strip: ``isnull(rand())`` folds away via
    nullability and Spark 4 folds out-of-range ``rand()``
    comparisons, but no rule rewrites a single-element shuffle. Use this ONLY for expensive verdict
    columns (higher-order folds over text) whose filter would otherwise
    sink below the fan-out exchange and run serially on a small scan:
    at production scale the scan is already parallel and ``fan_out`` is
    a no-op, so evaluating the verdict right above the scan instead of
    inside it costs nothing (parquet cannot evaluate these expressions
    either way), while on local/small inputs it keeps the evaluation on
    every core (measured 9.7 s → 1.2 s for d13's repetition verdict at
    sf0.1)."""
    return F.element_at(F.shuffle(F.array(col)), 1)


def sort_after_stage(df: DataFrame, *cols: str) -> DataFrame:
    """Global sort with a round-robin exchange inserted below it.

    A global ``orderBy`` needs range boundaries, and Spark computes
    them with a SAMPLING JOB that consumes the sort's entire child —
    re-executing every upstream expression — unless the child is a
    materialized shuffle stage. When the upstream is expensive per-row
    compute reached only through scans and broadcast joins (text
    folds, Arrow-batched decodes), that sampling pass silently doubles
    the query's cost at ANY scale. The inserted narrow exchange gives
    AQE a materialized stage to sample instead: one extra shuffle of
    the (already projected, payload-free) output rows in exchange for
    computing the expensive expressions exactly once. Use when
    upstream compute per row outweighs shuffling the output row; keep
    plain ``orderBy`` when the upstream is cheap or already ends in a
    shuffle (aggregate/window/join exchange)."""
    spark = df.sparkSession
    return df.repartition(spark.sparkContext.defaultParallelism).orderBy(*cols)


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
