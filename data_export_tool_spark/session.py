"""SparkSession factory with scale-oriented defaults.

The reference delegates all execution to a MySQL server
(``/root/reference/export.py:287``); here Catalyst+Tungsten play that
role. These defaults are chosen for the 100 TB design point and are
harmless on ``local[*]``:

- AQE on (runtime coalescing of shuffle partitions, skew-join
  splitting, dynamic join-strategy demotion to broadcast).
- Arrow on (any unavoidable Python stage is vectorized, not per-row).
- shuffle partitions sized to cores locally; on a real cluster this is
  overridden by AQE's coalescing from a high initial value.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(
    app_name: str = "data-export-tool-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession tuned for this engine.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` so the same code
    path runs under the driver harness and on a real cluster (where the
    master comes from spark-submit and this argument is left None but a
    session already exists).
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    builder = (
        SparkSession.builder.appName(app_name)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config(
            "spark.sql.shuffle.partitions",
            str(shuffle_partitions or DEFAULT_SHUFFLE_PARTITIONS),
        )
        # 128 MB parquet split targets keep scan tasks balanced at scale.
        .config("spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024))
        # The reference's dimension tables (and our dedup CTE outputs) are
        # small; let Spark broadcast aggressively. AQE will also demote
        # sort-merge joins to broadcast at runtime when a side turns out
        # small after filtering.
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # Let a join whose keys are a SUPERSET of both sides' identical
        # hash partitioning reuse that partitioning instead of
        # reshuffling on the full key list. This is what makes
        # bucket-by-client_id tables serve joins on (client_id, date)
        # — e.g. the as-of winners join-back — with zero exchanges
        # (plan-contract-tested). Trade-off: parallelism is capped at
        # the subset key's cardinality, which is exactly the bucketed
        # layout's intent.
        .config("spark.sql.requireAllClusterKeysForCoPartition", "false")
        .config("spark.sql.session.timeZone", "UTC")
        # TIMESTAMP(NANOS) parquet (the driver's events table) has no
        # native Spark type; read it as nanos-longs and normalize at
        # the catalog boundary. Declared HERE so the session-wide
        # semantics are visible up front, not only as a side effect of
        # the first Catalog.load.
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
    )
    if master is not None:
        builder = builder.master(master)
    elif SparkSession.getActiveSession() is None:
        builder = builder.master(f"local[{cpus}]")
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
