"""Generic reader / format-conversion tests."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from data_export_tool_spark.sources.readers import convert_dataset, read_dataset


def test_roundtrip_parquet_csv_json(spark, sf_dir, tmp_path):
    src = read_dataset(spark, os.path.join(sf_dir, "nation.parquet"))
    for fmt in ("csv", "json", "orc"):
        out = str(tmp_path / fmt)
        convert_dataset(src, out, fmt=fmt, coalesce=1)
        back = read_dataset(
            spark, out, fmt=fmt, schema=src.schema if fmt != "csv" else None
        )
        assert back.count() == src.count()
        assert {r.n_name for r in back.collect()} == {
            r.n_name for r in src.collect()
        }


def test_partitioned_write_prunes(spark, sf_dir, tmp_path):
    orders = read_dataset(spark, os.path.join(sf_dir, "orders.parquet"))
    out = str(tmp_path / "orders_by_status")
    convert_dataset(orders, out, partition_by=["o_orderstatus"])
    # hive-style partition dirs exist
    assert any(d.startswith("o_orderstatus=") for d in os.listdir(out))
    back = read_dataset(spark, out)
    pruned = back.filter(F.col("o_orderstatus") == "F")
    assert pruned.count() == orders.filter(F.col("o_orderstatus") == "F").count()


def test_csv_permissive_corrupt_rows(spark, tmp_path):
    p = tmp_path / "rows.json"
    p.write_text('{"a": 1, "b": "x"}\n{"a": broken\n{"a": 3, "b": "z"}\n')
    df = read_dataset(
        spark,
        str(p),
        fmt="json",
        schema="a long, b string, _corrupt_record string",
    )
    rows = df.collect()
    assert len(rows) == 3
    assert sum(r._corrupt_record is not None for r in rows) == 1
