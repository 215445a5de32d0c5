"""Command-line export runner — the engine's answer to the reference's
Tk app (/root/reference/export.py:350-420: pick a month/year, click
export).

    python -m data_export_tool_spark \
        --config export_config.json --month Sene --year 2015 \
        --out exported_data [--zip-name NAME] \
        [--parquet-warehouse DIR]

Reads the reference-shaped ``export_config.json`` (queries_path +
db_properties), connects the warehouse (JDBC from db_properties, or a
directory of ``<table>.parquet`` for offline runs), resolves the
facility identity from the location tables (S4), runs every report for
the Ethiopian reporting window, and writes the checksummed zip package.
"""

from __future__ import annotations

import argparse
import os
import sys

from pyspark.sql import SparkSession


def register_parquet_warehouse(spark: SparkSession, warehouse_dir: str) -> list[str]:
    """Register every ``<name>.parquet`` under ``warehouse_dir`` as a
    temp view; returns the registered names."""
    names = []
    for entry in sorted(os.listdir(warehouse_dir)):
        if not entry.endswith(".parquet"):
            continue
        name = entry[: -len(".parquet")]
        spark.read.parquet(os.path.join(warehouse_dir, entry)).createOrReplaceTempView(
            name
        )
        names.append(name)
    return names


def main(argv: list[str] | None = None) -> int:
    from data_export_tool_spark.plans.registry import ReportRegistry, run_export
    from data_export_tool_spark.session import get_spark

    ap = argparse.ArgumentParser(prog="data_export_tool_spark")
    ap.add_argument("--config", required=True, help="export_config.json path")
    ap.add_argument("--month", required=True, help="Ethiopian month name or 1-13")
    ap.add_argument("--year", required=True, type=int, help="Ethiopian year")
    ap.add_argument("--out", default="exported_data", help="output directory")
    ap.add_argument(
        "--zip-name",
        default=None,
        help="package name; default {Facility}{HMIS}_{month}_{year} like the reference",
    )
    ap.add_argument(
        "--parquet-warehouse",
        default=None,
        help="directory of <table>.parquet to use instead of JDBC",
    )
    ap.add_argument(
        "--keep-csvs",
        action="store_true",
        help="keep per-report CSVs after packaging (reference deletes them)",
    )
    args = ap.parse_args(argv)

    spark = get_spark("data-export-tool")
    registry = ReportRegistry.from_config(args.config)
    if args.parquet_warehouse:
        registered = register_parquet_warehouse(spark, args.parquet_warehouse)
        print(f"registered {len(registered)} parquet tables", file=sys.stderr)
    else:
        registry.connect_warehouse(spark)

    from data_export_tool_spark.mamba.facility import lookup_facility_identity

    facility = lookup_facility_identity(spark)
    month_label = str(args.month)
    zip_name = args.zip_name or (
        f"{facility.facility_sanitized}{facility.hmis_code}_{month_label}_{args.year}"
    )
    mon: int | str = int(args.month) if str(args.month).isdigit() else args.month

    written = run_export(
        spark,
        registry,
        facility,
        mon,
        args.year,
        args.out,
        zip_name=zip_name,
        month_label=month_label,
        cleanup_csvs=not args.keep_csvs,
    )
    for name, path in written.items():
        print(f"{name}: {path or 'EMPTY (skipped)'}")
    print(os.path.join(args.out, f"{zip_name}_packaged18.zip"))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
