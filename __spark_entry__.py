"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` smoke-runs the flagship query at sf0.001;
``queries()`` exposes every implemented operator/query from
SURVEY.md §2 (+ the extended dedup/similarity/text surface);
``oracle_sql()`` gives the DuckDB-equivalent SQL for each
SQL-expressible entry.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from data_export_tool_spark.queries import all_queries

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    q03: latest-order-per-customer — the reference workload's workhorse
    shape (ROW_NUMBER latest-per-entity dedup + dimension join,
    SURVEY.md §2e W1).
    """
    from data_export_tool_spark.queries.relational import q03_latest_order_per_customer

    return q03_latest_order_per_customer(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator/query (SURVEY.md §2)."""
    return {name: spec.builder for name, spec in all_queries().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL per query; omitted entries (approximate
    ANN, SimHash) get the driver's rows-only check."""
    return {
        name: spec.oracle
        for name, spec in all_queries().items()
        if spec.oracle is not None
    }
