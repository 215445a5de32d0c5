"""The engine's driver-facing query workload.

Each query is a ``QuerySpec``: a DataFrame builder ``(spark, sf_dir) →
DataFrame`` plus (where SQL-expressible) the equivalent ANSI SQL an
external DuckDB oracle can run on the same parquet tables. Every
operator class in SURVEY.md §2 has at least one query here; the
docs/vectors/events modules carry the extended large-scale surface
(dedup, similarity, text analysis, event analytics).
"""

from __future__ import annotations

from dataclasses import dataclass
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class QuerySpec:
    """One catalog entry. ``oracle`` None → non-SQL-expressible
    (driver records a rows-only check)."""

    name: str
    builder: Callable[[SparkSession, str], DataFrame]
    oracle: str | None
    covers: str = ""  # SURVEY.md §2 rows exercised, for the parity audit


def all_queries() -> dict[str, QuerySpec]:
    from data_export_tool_spark.queries import (
        analytics,
        assets_q,
        docs,
        events_q,
        mamba_q,
        relational,
        vectors,
    )

    # Registration order IS grading order: the driver's correctness
    # gate grades the first 50 registered entries, so the reference-
    # parity reports (mamba_q) register right after the relational/
    # analytics/events core, before the extended surface. The whole
    # catalog is consolidated to exactly 50 entries so nothing falls
    # outside the window.
    specs: dict[str, QuerySpec] = {}
    for mod in (relational, analytics, events_q, mamba_q, docs, vectors, assets_q):
        for spec in mod.QUERIES:
            if spec.name in specs:
                raise ValueError(f"duplicate query name: {spec.name}")
            specs[spec.name] = spec
    return specs
