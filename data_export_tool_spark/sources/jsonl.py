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


def _observed_simple_type(v) -> str:
    """JSON value → Spark simpleString for the drift report."""
    if v is None:
        return "void"
    if isinstance(v, bool):  # before int: bool is an int subclass
        return "boolean"
    if isinstance(v, int):
        return "bigint"
    if isinstance(v, float):
        return "double"
    if isinstance(v, str):
        return "string"
    if isinstance(v, list):
        return "array"
    return "struct"


#: declared-type prefixes each observed JSON shape is COMPATIBLE with —
#: JSON can't distinguish int widths, carries timestamps/dates as
#: strings, and decimals arrive as numbers, so only coarse-class
#: conflicts count as drift (a declared bigint observed as "bigint" is
#: not news; observed as "string" is)
_COMPAT = {
    "bigint": ("tinyint", "smallint", "int", "bigint", "float", "double", "decimal"),
    "double": ("float", "double", "decimal"),
    "string": ("string", "varchar", "char", "date", "timestamp", "binary"),
    "boolean": ("boolean",),
    "array": ("array",),
    "struct": ("struct", "map"),
}


def jsonl_schema_drift(
    spark: SparkSession,
    path: str,
    schema: StructType | str,
    sample_lines: int = 1024,
    full_scan: bool = False,
) -> DataFrame:
    """Drift report for a JSONL source vs its declared schema, routed
    through ``validate.schema_drift`` — the lake-ingestion answer to a
    producer that evolved upstream: new columns report as ``added``,
    columns absent from every record as ``removed`` (a rename shows up
    as one of each), coarse type-class conflicts as ``retyped``.

    Detection cost is BOUNDED by contract: types come from the first
    ``sample_lines`` non-blank lines (one driver-side pass over a
    ``limit`` — never a full-corpus inference pass, which at 100 TB
    would double the read). ``full_scan=True`` upgrades the added /
    removed KEY detection to exact via one distinct-keys aggregate
    (``json_object_keys`` explode — a second scan that shuffles only
    key strings, opt-in because it is a full pass); typed drift stays
    sample-based either way.
    """
    import json as _json

    from data_export_tool_spark.operators.validate import schema_drift_df

    if isinstance(schema, str):
        from pyspark.sql.types import _parse_datatype_string

        schema = _parse_datatype_string(schema)
    declared = {f.name: f.dataType.simpleString() for f in schema.fields}

    lines = (
        spark.read.text(path)
        .where(F.trim(F.col("value")) != "")
        .limit(sample_lines)
        .collect()
    )
    # per key: observed shape → occurrence count. A column only counts
    # as retyped when NO observed shape is compatible with the declared
    # type — a lone malformed record (one string among thousands of
    # ints) is the QUARANTINE's business, not producer drift
    observed: dict[str, dict[str, int]] = {}
    for row in lines:
        try:
            obj = _json.loads(row["value"])
        except ValueError:
            continue  # corrupt lines are the quarantine's business
        if not isinstance(obj, dict):
            continue
        for k, v in obj.items():
            shapes = observed.setdefault(k, {})
            t = _observed_simple_type(v)
            shapes[t] = shapes.get(t, 0) + 1

    if full_scan:
        exact_keys = {
            r["k"]
            for r in spark.read.text(path)
            .where(F.trim(F.col("value")) != "")
            .select(
                F.explode(F.json_object_keys(F.col("value"))).alias("k")
            )
            .distinct()
            .collect()
        }
        for k in exact_keys:
            observed.setdefault(k, {})  # key beyond the typed sample
        observed = {k: t for k, t in observed.items() if k in exact_keys}

    # build the observed StructType: fields with ANY compatible shape
    # keep the DECLARED type (int-width / timestamp-as-string noise and
    # minority-corrupt records are not drift), genuine conflicts keep
    # the dominant observed shape, unseen declared fields are omitted
    # (-> "removed"), new keys enter as observed
    from pyspark.sql.types import _parse_datatype_string

    fields = []
    for name, shapes in sorted(observed.items()):
        decl = declared.get(name)
        real = {s: n for s, n in shapes.items() if s != "void"}
        if decl is not None and (
            not real
            or any(decl.startswith(_COMPAT.get(s, ())) for s in real)
        ):
            simple = decl
        else:
            # dominant shape, ties broken alphabetically (determinism)
            obs = (
                max(sorted(real), key=lambda s: real[s]) if real else "string"
            )
            simple = {"array": "array<string>", "struct": "struct<>"}.get(
                obs, obs
            )
        fields.append(
            StructField(name, _parse_datatype_string(simple), True)
        )
    return schema_drift_df(spark, schema, StructType(fields))


def load_jsonl_evolving(
    spark: SparkSession,
    path: str,
    schema: StructType | str,
    sample_lines: int = 1024,
    full_scan: bool = False,
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """``load_jsonl`` plus the drift report: ``(good, quarantine,
    drift)``. ``good`` still contracts on the DECLARED schema — new
    upstream columns never silently reshape a 100 TB table; they
    arrive as ``added`` rows in ``drift`` so the owner can extend the
    declared schema deliberately. Retyped producers keep flowing:
    values that still coerce parse as before, values that don't hit
    the quarantine, and the drift row says why."""
    good, quarantine = load_jsonl(spark, path, schema)
    drift = jsonl_schema_drift(
        spark, path, schema, sample_lines=sample_lines, full_scan=full_scan
    )
    return good, quarantine, drift


def write_jsonl(df: DataFrame, path: str, compression: str | None = "gzip"):
    """Write a corpus back out as JSONL (sharded by partition — the
    standard corpus interchange layout)."""
    w = df.write.mode("overwrite")
    if compression:
        w = w.option("compression", compression)
    w.json(path)
