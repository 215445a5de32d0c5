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
from pyspark.sql import functions as F
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
    sort_by: list[str] | None = None,
    max_records_per_file: int | None = None,
    mode: str = "overwrite",
    **options,
) -> None:
    """Parallel format conversion / re-layout.

    ``partition_by`` writes hive-style partition directories (choose
    low-cardinality columns: date, region — not ids). ``coalesce``
    bounds output file count without a shuffle; prefer leaving it unset
    and letting AQE size the files.

    Output hygiene at scale: ``max_records_per_file`` caps each task's
    output files (a skewed task can't emit one 50 GB file nothing can
    parallelize over later), and ``sort_by`` sorts WITHIN partitions
    before writing — no global sort, but parquet min/max stats come
    out tight on the sort columns so downstream range predicates skip
    row groups. For multi-column skipping use
    ``operators/layout.write_zordered`` instead.
    """
    # coalesce BEFORE the sort: the reverse order concatenates sorted
    # runs inside each merged partition, leaving per-file min/max stats
    # spanning nearly the full range — exactly what sort_by promises
    # to prevent
    if coalesce:
        df = df.coalesce(coalesce)
    if sort_by:
        df = df.sortWithinPartitions(*sort_by)
    writer = df.write.mode(mode).format(fmt)
    if max_records_per_file:
        writer = writer.option("maxRecordsPerFile", max_records_per_file)
    if fmt == "csv":
        writer = writer.option("header", options.pop("header", True))
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.options(**options).save(out_path)


#: widening lattice for union_evolve: rank within each family; the
#: smallest common supertype is the max rank, except integral+fractional
#: mixes force DOUBLE (float cannot represent every long exactly, so
#: long ∨ float = double, the exactness-preserving choice)
_INTEGRAL_RANK = {"byte": 1, "short": 2, "integer": 3, "long": 4}
_FRACTIONAL_RANK = {"float": 1, "double": 2}


def _widen(name: str, a, b):
    """Smallest common supertype of two Spark DataTypes under the
    documented lattice; raises on incompatible drift (a silent cast —
    e.g. int→string — would hide upstream corruption)."""
    from pyspark.sql import types as T

    if a == b:
        return a
    an, bn = a.typeName(), b.typeName()
    ints, fracs = _INTEGRAL_RANK, _FRACTIONAL_RANK
    if an in ints and bn in ints:
        return a if ints[an] >= ints[bn] else b
    if an in fracs and bn in fracs:
        return a if fracs[an] >= fracs[bn] else b
    numeric = set(ints) | set(fracs) | {"decimal"}
    if an in numeric and bn in numeric:
        # integral∨fractional and every decimal mix → double (decimal
        # precision arithmetic across drifted days is not worth the
        # silent-overflow risk; documented)
        return T.DoubleType()
    if {an, bn} == {"date", "timestamp"}:
        return T.TimestampType()
    raise ValueError(
        f"union_evolve: column {name!r} drifted incompatibly:"
        f" {a.simpleString()} vs {b.simpleString()} — widening only"
        f" covers numeric, and date→timestamp; cast explicitly if the"
        f" drift is intentional"
    )


def union_evolve(frames) -> DataFrame:
    """Union DataFrames whose schemas DRIFTED (the daily-ingest lake
    reality ``validate.schema_drift`` only reports): union-by-name
    with

    - column order = first-seen order across frames,
    - missing columns NULL-filled per frame,
    - types widened to the smallest common supertype (integrals up to
      long; float→double; integral∨fractional and any decimal mix →
      double; date∨timestamp → timestamp),
    - anything else (string vs int, nested drift) raises with the
      column name and both types — a silent cast would hide upstream
      corruption.

    Pure metadata + per-frame scan-side casts: no shuffle, no data
    pass beyond the union itself; Catalyst pushes the casts into each
    frame's scan projection."""
    frames = list(frames)
    if not frames:
        raise ValueError("union_evolve: at least one frame required")
    order: list[str] = []
    target: dict[str, object] = {}
    for df in frames:
        for f in df.schema.fields:
            if f.name not in target:
                order.append(f.name)
                target[f.name] = f.dataType
            else:
                target[f.name] = _widen(f.name, target[f.name], f.dataType)
    out = None
    for df in frames:
        have = {f.name for f in df.schema.fields}
        cols = [
            (F.col(c) if c in have else F.lit(None)).cast(target[c]).alias(c)
            for c in order
        ]
        part = df.select(*cols)
        out = part if out is None else out.unionByName(part)
    return out
