"""Generic dataset readers and format conversion.

The reference is a single-purpose MySQL→CSV extractor; the engine
generalizes both ends (SURVEY.md §7 north star): read any of the
common lake formats with explicit schemas, convert/partition at scale.

Scale notes: conversions are single-pass streaming writes — no
collect, no driver materialization. ``partition_by`` columns turn into
directory partitions (partition pruning for downstream readers);
``bucket_by`` requires a table sink (see catalog.write_bucketed).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

READ_FORMATS = ("parquet", "csv", "json", "orc")


def read_dataset(
    spark: SparkSession,
    path: str,
    fmt: str = "parquet",
    schema: StructType | str | None = None,
    **options,
) -> DataFrame:
    """Schema-explicit scan of a lake dataset.

    CSV/JSON default to permissive parsing with a `_corrupt_record`
    column retained when a schema is given — at 100 TB a handful of
    malformed rows must not kill the job, and silently dropping them is
    worse.
    """
    if fmt not in READ_FORMATS:
        raise ValueError(f"unsupported format {fmt!r}; one of {READ_FORMATS}")
    reader = spark.read.format(fmt)
    if fmt == "csv":
        reader = reader.option("header", options.pop("header", True))
    if fmt in ("csv", "json"):
        reader = reader.option("mode", options.pop("mode", "PERMISSIVE"))
    if schema is not None:
        reader = reader.schema(schema)
    elif fmt == "csv":
        reader = reader.option("inferSchema", True)
    return reader.options(**options).load(path)


def convert_dataset(
    df: DataFrame,
    out_path: str,
    fmt: str = "parquet",
    partition_by: list[str] | None = None,
    coalesce: int | None = None,
    mode: str = "overwrite",
    **options,
) -> None:
    """Parallel format conversion / re-layout.

    ``partition_by`` writes hive-style partition directories (choose
    low-cardinality columns: date, region — not ids). ``coalesce``
    bounds output file count without a shuffle; prefer leaving it unset
    and letting AQE size the files.
    """
    writer = df.write.mode(mode).format(fmt)
    if coalesce:
        writer = df.coalesce(coalesce).write.mode(mode).format(fmt)
    if fmt == "csv":
        writer = writer.option("header", options.pop("header", True))
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.options(**options).save(out_path)
