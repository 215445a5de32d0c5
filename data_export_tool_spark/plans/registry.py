"""Parameterized report registry + export runner.

Mirrors the reference's lifecycle (SURVEY.md §3): resolve the report
window from an Ethiopian month/year, run each registered query, append
the facility-identity columns, write one CSV per query, package with a
checksum. The config shape is compatible with the reference's
``export_config.json`` (``queries_path`` name → SQL file; the engine
additionally accepts registered DataFrame builders).

Execution is Catalyst end-to-end: SQL text goes through the dialect
shim into ``spark.sql``; DataFrame-built queries skip the shim.
"""

from __future__ import annotations

import json
import os
from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

from data_export_tool_spark.plans.dialect import shim_mysql_sql
from data_export_tool_spark.plans.report_window import ReportWindow, resolve_report_window
from data_export_tool_spark.sources.csv_sink import with_facility_columns, write_query_csv
from data_export_tool_spark.sources.packaging import zip_files_with_checksum


@dataclass
class FacilityIdentity:
    """S4: the four constants appended to every row
    (/root/reference/export.py:123-141,294-296)."""

    region: str
    woreda: str
    facility: str
    hmis_code: str


QueryBuilder = Callable[[SparkSession, ReportWindow], DataFrame]


@dataclass
class ReportRegistry:
    """name → SQL text or DataFrame builder, run in insertion order
    (the reference runs queries in dict order of ``queries_path``,
    export.py:96,281)."""

    sql_queries: dict[str, str] = field(default_factory=dict)
    df_queries: dict[str, QueryBuilder] = field(default_factory=dict)

    @classmethod
    def from_config(cls, config_path: str) -> "ReportRegistry":
        """Load an ``export_config.json``-shaped file: ``queries_path``
        maps names to SQL files relative to the config."""
        with open(config_path) as f:
            config = json.load(f)
        base = os.path.dirname(os.path.abspath(config_path))
        reg = cls()
        for name, rel in config.get("queries_path", {}).items():
            with open(os.path.join(base, rel)) as qf:
                reg.sql_queries[name] = qf.read()
        return reg

    def register_sql(self, name: str, sql: str) -> None:
        self.sql_queries[name] = sql

    def register_builder(self, name: str, builder: QueryBuilder) -> None:
        self.df_queries[name] = builder

    def names(self) -> list[str]:
        return list(self.sql_queries) + list(self.df_queries)


def run_export(
    spark: SparkSession,
    registry: ReportRegistry,
    facility: FacilityIdentity,
    eth_month: int | str,
    eth_year: int,
    out_dir: str,
    zip_name: str | None = None,
    month_label: str | None = None,
) -> dict[str, str | None]:
    """Run every registered report for the Ethiopian month/year window.

    Returns name → written CSV path (None where the result was empty —
    skipped, matching export.py:307-308). When ``zip_name`` is given
    the CSVs are packaged into ``{zip_name}_packaged18.zip``.
    """
    window = resolve_report_window(eth_month, eth_year)
    label = month_label or str(eth_month)
    written: dict[str, str | None] = {}

    for name, sql in registry.sql_queries.items():
        df = spark.sql(shim_mysql_sql(sql, window.as_params()))
        written[name] = _sink(df, out_dir, name, facility, label, eth_year)
    for name, builder in registry.df_queries.items():
        df = builder(spark, window)
        written[name] = _sink(df, out_dir, name, facility, label, eth_year)

    if zip_name:
        zip_files_with_checksum(out_dir, zip_name)
    return written


def _sink(
    df: DataFrame,
    out_dir: str,
    name: str,
    facility: FacilityIdentity,
    month_label: str,
    year: int,
) -> str | None:
    full = with_facility_columns(
        df, facility.region, facility.woreda, facility.facility, facility.hmis_code
    )
    return write_query_csv(
        full, out_dir, name, facility.facility, facility.hmis_code, month_label, year
    )
