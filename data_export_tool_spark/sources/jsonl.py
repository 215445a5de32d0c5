"""Line-oriented corpus ingestion (JSONL + headerless CSV) with a
quarantine contract.

LLM corpora arrive as JSON-lines; at 100 TB a malformed record must
neither kill the job (FAILFAST) nor silently become a row of NULLs
(default PERMISSIVE with the corrupt column dropped). ``load_jsonl``
reads the file as TEXT and parses each line with ``from_json`` under
the PERMISSIVE corrupt-record contract, splitting into (good,
quarantine): good rows carry exactly the declared columns, quarantined
rows carry the raw offending line for a repair queue.

Why text + from_json instead of the JSON datasource: Spark refuses a
query that selects ONLY the corrupt-record column from a raw JSON
scan ([UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_RECORD_COLUMN] — the
documented workaround is caching the scan, a non-starter at 100 TB).
The text source has no such restriction, both halves stay plain
filters over ONE scan, and the quarantine gets the byte-exact source
line rather than the parser's reconstruction.

Explicit schema is the scale contract: schema inference over JSONL is
a full extra pass of the data, and a drifting producer would silently
re-shape the table run to run.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType

CORRUPT_COL = "_corrupt_record"


def load_jsonl(
    spark: SparkSession,
    path: str,
    schema: StructType | str,
) -> tuple[DataFrame, DataFrame]:
    """Read JSONL at ``path`` against the declared ``schema``.

    Returns ``(good, quarantine)``:

    - ``good`` — rows that parsed; columns exactly the declared schema.
    - ``quarantine`` — one row per malformed line: ``(raw string)``.
      A record is malformed when it is not valid JSON **or** when a
      declared field's value cannot be coerced to its declared type
      (the PERMISSIVE contract); missing fields are NULL, extra fields
      are ignored — those are schema evolution, not corruption. Blank
      lines are skipped entirely (JSONL framing, not data).
    """
    if isinstance(schema, str):
        from pyspark.sql.types import _parse_datatype_string

        schema = _parse_datatype_string(schema)
    if CORRUPT_COL in schema.fieldNames():
        raise ValueError(f"schema must not declare {CORRUPT_COL!r}")
    read_schema = StructType(
        list(schema.fields) + [StructField(CORRUPT_COL, StringType(), True)]
    )
    parsed = (
        spark.read.text(path)
        .where(F.trim(F.col("value")) != "")
        .select(
            F.col("value"),
            F.from_json(
                F.col("value"),
                read_schema,
                {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": CORRUPT_COL},
            ).alias("__r"),
        )
    )
    # from_json yields NULL (not a struct) for irrecoverably bad input
    bad = F.col("__r").isNull() | F.col(f"__r.{CORRUPT_COL}").isNotNull()
    good = parsed.where(~bad).select(
        *[F.col(f"__r.{f.name}").alias(f.name) for f in schema.fields]
    )
    quarantine = parsed.where(bad).select(F.col("value").alias("raw"))
    return good, quarantine


def load_csv(
    spark: SparkSession,
    path: str,
    schema: StructType | str,
    sep: str = ",",
) -> tuple[DataFrame, DataFrame]:
    """The CSV twin of ``load_jsonl``: headerless CSV shards (the
    standard large-scale layout — schema lives outside the data)
    parsed with ``from_csv`` under the same PERMISSIVE quarantine
    contract and the same single-scan split. A record quarantines when
    a declared field's value cannot be coerced to its type OR the row
    has fewer fields than the schema (``from_csv`` is strict about
    arity — stricter than the csv datasource's silent NULL-padding,
    which is the point: a producer that dropped a column should land
    in the repair queue, not as NULLs). Files WITH a header row should
    drop it upstream or let it quarantine (a header rarely coerces to
    a typed schema)."""
    if isinstance(schema, str):
        from pyspark.sql.types import _parse_datatype_string

        schema = _parse_datatype_string(schema)
    if CORRUPT_COL in schema.fieldNames():
        raise ValueError(f"schema must not declare {CORRUPT_COL!r}")
    read_schema = StructType(
        list(schema.fields) + [StructField(CORRUPT_COL, StringType(), True)]
    )
    parsed = (
        spark.read.text(path)
        .where(F.trim(F.col("value")) != "")
        .select(
            F.col("value"),
            F.from_csv(
                F.col("value"),
                read_schema.simpleString(),
                {
                    "mode": "PERMISSIVE",
                    "columnNameOfCorruptRecord": CORRUPT_COL,
                    "sep": sep,
                },
            ).alias("__r"),
        )
    )
    bad = F.col("__r").isNull() | F.col(f"__r.{CORRUPT_COL}").isNotNull()
    good = parsed.where(~bad).select(
        *[F.col(f"__r.{f.name}").alias(f.name) for f in schema.fields]
    )
    quarantine = parsed.where(bad).select(F.col("value").alias("raw"))
    return good, quarantine


def write_jsonl(df: DataFrame, path: str, compression: str | None = "gzip"):
    """Write a corpus back out as JSONL (sharded by partition — the
    standard corpus interchange layout)."""
    w = df.write.mode("overwrite")
    if compression:
        w = w.option("compression", compression)
    w.json(path)
