"""Spark-free fixture materialization for the driver gate.

The driver's correctness runner builds the ORACLE SQL strings before it
runs any Spark query, so the mamba fixture parquet the oracles read
must exist at import time — before a SparkSession exists. This module
writes the seeded fixture tables (``mamba.fixtures.generate_all``) as
single-file parquet via pyarrow, once per (seed, n_patients) version
directory, and returns name → file path.

Both execution sides read THESE files (Spark via ``spark.read.parquet``
for the native line-lists, DuckDB via path literals in the oracle SQL),
so they always agree on the input bytes.
"""

from __future__ import annotations

import os

from pyspark.sql.types import DateType, IntegerType, LongType, StringType, StructType

from data_export_tool_spark.mamba import fixtures as FX
from data_export_tool_spark.mamba import schemas as S

DEFAULT_SEED = 42
DEFAULT_N_PATIENTS = 200


def _arrow_schema(spark_schema: StructType):
    import pyarrow as pa

    mapping = {
        LongType: pa.int64(),
        IntegerType: pa.int32(),
        StringType: pa.string(),
        DateType: pa.date32(),
    }
    return pa.schema(
        [(f.name, mapping[type(f.dataType)]) for f in spark_schema.fields]
    )


def fixture_dir(seed: int = DEFAULT_SEED, n_patients: int = DEFAULT_N_PATIENTS) -> str:
    base = os.environ.get("SPARK_GRAFT_FIXTURE_DIR", "/tmp/spark_graft_fixtures")
    return os.path.join(base, f"seed{seed}_n{n_patients}")


def ensure_fixture_parquet(
    seed: int = DEFAULT_SEED, n_patients: int = DEFAULT_N_PATIENTS
) -> dict[str, str]:
    """Write every fixture table as one parquet file (idempotent; a
    marker file skips rewrites) and return table name → file path."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    out_dir = fixture_dir(seed, n_patients)
    schemas = S.all_table_schemas()
    paths = {
        name: os.path.join(out_dir, f"{name}.parquet") for name in schemas
    }
    marker = os.path.join(out_dir, "_ALL_TABLES_WRITTEN")
    if os.path.exists(marker):
        return paths

    os.makedirs(out_dir, exist_ok=True)
    tables = FX.generate_all(seed, n_patients)
    for name, rows in tables.items():
        schema = _arrow_schema(schemas[name])
        cols = [f.name for f in schemas[name].fields]
        arrays = [
            pa.array([row[i] for row in rows], type=schema.field(c).type)
            for i, c in enumerate(cols)
        ]
        pq.write_table(pa.Table.from_arrays(arrays, schema=schema), paths[name])
    with open(marker, "w") as f:
        f.write("ok")
    return paths
