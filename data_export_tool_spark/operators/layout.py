"""Multi-dimensional data-skipping layout: Z-order writes.

Parquet readers skip files/row-groups whose column min/max statistics
exclude a predicate. A single-column sort gives perfect skipping on
that column and none on any other; interleaving the bits of several
columns' bucket ranks (a Z-order / Morton curve — public technique,
used by every lake engine) bounds EVERY interleaved column's range
within each file, so selective predicates on any of them skip most of
a 100 TB table.

Everything is pure column algebra: per-column min/max from one tiny
aggregate (driver-side, 1 row), linear bucketing via ``width_bucket``,
bit interleave as a fixed chain of shift/or terms, then a single
``repartitionByRange`` + ``sortWithinPartitions`` on the Z value —
one range exchange, no UDFs, no driver data.

Linear (min/max) bucketing is the standard dependency-free variant;
heavily skewed columns get fewer effective buckets than a
quantile-based rank would give, which costs skipping ratio but never
correctness (stats-based skipping is safe for ANY layout).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def zorder_key(
    df: DataFrame, cols: Sequence[str], bits: int | None = None
) -> Column:
    """The 64-bit Z (Morton) value interleaving ``cols``.

    Each column is mapped to a ``bits``-bit bucket rank between its
    observed min and max (one driver-side aggregate on ``df``), and
    ranks are bit-interleaved column-major: bit ``b`` of column ``i``
    lands at position ``b·k + i``. ``bits`` defaults to the largest
    width fitting all columns in 63 bits (16 for 2-3 columns).
    NULLs rank lowest (bucket 0) — they cluster together, which is
    what a NULL-heavy scan wants.
    """
    k = len(cols)
    if k < 2:
        raise ValueError("zorder needs >= 2 columns (use a plain sort for 1)")
    if bits is None:
        bits = min(16, 63 // k)
    if bits * k > 63:
        raise ValueError(f"{bits} bits x {k} cols exceeds a 64-bit key")
    n_buckets = 1 << bits

    row = df.agg(
        *[F.min(c).cast("double").alias(f"mn_{i}") for i, c in enumerate(cols)],
        *[F.max(c).cast("double").alias(f"mx_{i}") for i, c in enumerate(cols)],
    ).first()

    z = F.lit(0).cast("long")
    for i, c in enumerate(cols):
        mn, mx = row[f"mn_{i}"], row[f"mx_{i}"]
        if mn is None or mx is None or mn == mx:
            continue  # constant/all-null column contributes nothing
        # width_bucket yields 1..n for in-range, 0/n+1 for the open
        # ends; clamp to 0..n-1
        q = F.least(
            F.lit(n_buckets - 1),
            F.greatest(
                F.lit(0),
                F.width_bucket(
                    F.col(c).cast("double"), F.lit(mn), F.lit(mx), F.lit(n_buckets)
                )
                - 1,
            ),
        ).cast("long")
        q = F.coalesce(q, F.lit(0))
        for b in range(bits):
            z = z.bitwiseOR(
                F.shiftleft(
                    F.shiftright(q, b).bitwiseAND(F.lit(1)), b * k + i
                )
            )
    return z


def write_zordered(
    df: DataFrame,
    path: str,
    cols: Sequence[str],
    num_files: int | None = None,
    bits: int | None = None,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` as parquet laid out along the Z-curve of ``cols``:
    range-partition on the Z value (→ ``num_files`` output files with
    disjoint Z ranges), sort within each partition, drop the key.
    Readers filtering on ANY of ``cols`` then skip files via parquet
    min/max stats. One range exchange total."""
    z = zorder_key(df, cols, bits)
    out = df.withColumn("__z", z)
    n = num_files or df.sparkSession.sparkContext.defaultParallelism
    (
        out.repartitionByRange(n, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode(mode)
        .parquet(path)
    )


def compact_parquet(
    spark,
    src: str,
    dst: str,
    target_mb: int = 256,
) -> int:
    """Small-file compaction: rewrite a parquet table into
    ``ceil(total_bytes / target_mb)`` files. Returns the output file
    count.

    The lake-maintenance op every streaming/incremental writer needs —
    a sink emitting one file per micro-batch per partition turns a
    table into millions of KB-files whose per-file open/footer cost
    dominates scans. Sizing reads file LENGTHS from the filesystem
    (driver-side metadata via the Hadoop FS API — works on any
    supported FS, no data read), and the rewrite uses ``coalesce``:
    pure compaction narrows partitions without a shuffle (repartition
    would shuffle every byte to achieve the same file count).
    """
    import math
    import os

    if os.path.abspath(src) == os.path.abspath(dst):
        # mode("overwrite") DELETES dst before the lazy read of src has
        # pulled a single row — in-place compaction would destroy the
        # table. Refuse; compact to a sibling dir and swap.
        raise ValueError(
            f"compact_parquet src and dst must differ (got {src!r}): "
            "overwrite deletes the destination before the source is "
            "read — write to a new path, then rename"
        )

    jvm = spark.sparkContext._jvm
    conf = spark.sparkContext._jsc.hadoopConfiguration()
    path = jvm.org.apache.hadoop.fs.Path(src)
    fs = path.getFileSystem(conf)
    total = 0
    it = fs.listFiles(path, True)
    while it.hasNext():
        f = it.next()
        name = f.getPath().getName()
        if not name.startswith("_") and not name.startswith("."):
            total += f.getLen()
    n_out = max(1, math.ceil(total / (target_mb * 1024 * 1024)))
    spark.read.parquet(src).coalesce(n_out).write.mode("overwrite").parquet(dst)
    return n_out


def write_sorted(
    df: DataFrame,
    path: str,
    cols: Sequence[str],
    num_files: int | None = None,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` as parquet globally range-laid-out on ``cols``:
    ``repartitionByRange`` (→ ``num_files`` files with pairwise
    disjoint key ranges) + ``sortWithinPartitions``. The single-key
    complement to ``write_zordered``: when scans filter on ONE key
    (time, tenant, primary key), disjoint per-file ranges give
    perfect footer-stats skipping — a point or range predicate reads
    exactly the files that can contain it, while a Z-order layout
    would dilute that key's resolution to make room for the others.

    One range exchange total (the range partitioner samples keys
    first — Spark's own machinery, no driver data); the in-file sort
    additionally tightens ROW-GROUP stats so even within a touched
    file the reader prunes pages."""
    if not cols:
        raise ValueError("write_sorted needs at least one column")
    n = num_files or df.sparkSession.sparkContext.defaultParallelism
    (
        df.repartitionByRange(n, *cols)
        .sortWithinPartitions(*cols)
        .write.mode(mode)
        .parquet(path)
    )


def scan_selectivity(
    spark,
    path: str,
    col: str,
    lo,
    hi,
) -> dict:
    """Measure how well a parquet layout skips for a range predicate
    ``lo <= col <= hi``: reads ONLY the file footers (driver-side
    metadata via the Hadoop FS + ParquetFileReader APIs — no data
    pages) and counts files whose [min, max] stats exclude the range.
    Returns ``{n_files, n_skipped, skip_ratio, rows_total,
    rows_in_candidates}``.

    The audit every layout decision (``write_sorted`` /
    ``write_zordered`` / ``compact_parquet``) should be judged by:
    run it before and after a rewrite and the skip ratio IS the read
    amplification you removed. Mirrors the reader's own file-level
    pruning rule (stats-disjoint ⇒ skippable), so the number is what
    Spark/any engine will actually do, not a heuristic."""
    jvm = spark.sparkContext._jvm
    conf = spark.sparkContext._jsc.hadoopConfiguration()
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(conf)
    n_files = n_skipped = rows_total = rows_cand = 0
    it = fs.listFiles(hpath, True)
    files = []
    while it.hasNext():
        f = it.next()
        name = f.getPath().getName()
        if name.endswith(".parquet") and not name.startswith(("_", ".")):
            files.append(str(f.getPath().toString()))
    import pyarrow.parquet as pq

    for fp in sorted(files):
        local = fp[len("file:"):] if fp.startswith("file:") else fp
        md = pq.ParquetFile(local).metadata
        idx = md.schema.names.index(col)
        mins, maxs, rows = [], [], 0
        for g in range(md.num_row_groups):
            st = md.row_group(g).column(idx).statistics
            rows += md.row_group(g).num_rows
            if st is not None and st.has_min_max:
                mins.append(st.min)
                maxs.append(st.max)
        n_files += 1
        rows_total += rows
        if mins and (max(maxs) < lo or min(mins) > hi):
            n_skipped += 1
        else:
            rows_cand += rows
    return {
        "n_files": n_files,
        "n_skipped": n_skipped,
        "skip_ratio": (n_skipped / n_files) if n_files else 0.0,
        "rows_total": rows_total,
        "rows_in_candidates": rows_cand,
    }
