"""Dataset catalog: named tables → DataFrames.

The reference's "catalog" is implicit — table names hard-coded inside
3,460 lines of SQL, resolved by the MySQL server (SURVEY.md §1). Here
the catalog is explicit and storage-agnostic: a directory of Parquet
files (tests, the driver's sf* data), or JDBC for a live warehouse.

Scale notes: tables are plain ``spark.read.parquet`` scans, so Catalyst
gets predicate pushdown + column pruning for free; ``Catalog.view``
registers temp views so the same data serves both the DataFrame API and
``spark.sql``. At 100 TB the facts would be written partitioned (by
date) and bucketed (by join key) — see ``write_bucketed``.
"""

from __future__ import annotations

import os
from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: the driver's synthetic star schema (TESTDATA.md)
TESTDATA_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def normalize_event_times(df: DataFrame, col: str = "ts") -> DataFrame:
    """Normalize a driver-generated event-time column to TimestampType.

    The testdata generator's parquet annotation for ``events.ts`` is not
    stable round-to-round: it has shipped as TIMESTAMP(NANOS) (read as
    nanos-longs under the legacy conf), TIMESTAMP, and TIMESTAMP_NTZ.
    Every consumer (batch catalog, file streams, tests) funnels through
    this one function so a new annotation breaks one place, not three.
    With the session pinned to UTC (session.py) the NTZ→TZ cast is
    wall-clock exact.
    """
    dtype = dict(df.dtypes).get(col)
    if dtype == "bigint":  # TIMESTAMP(NANOS) read as nanos-longs
        # exact integer division: `/` is a DOUBLE divide, and 2024-era
        # nano counts (~1.7e18) exceed double's 53-bit exact range
        # (ULP ≈ 256 ns), so truncating the float quotient can land one
        # microsecond off
        df = df.withColumn(
            col, F.timestamp_micros(F.expr(f"`{col}` div 1000"))
        )
    elif dtype == "timestamp_ntz":
        df = df.withColumn(col, F.col(col).cast("timestamp"))
    return df


class Catalog:
    """Resolve table names to DataFrames from a base directory of parquet.

    >>> cat = Catalog(spark, "/root/testdata/sf0.01")
    >>> lineitem = cat.load("lineitem")
    """

    def __init__(self, spark: SparkSession, base_dir: str = DEFAULT_SF_DIR):
        self.spark = spark
        self.base_dir = base_dir
        self._cache: dict[str, DataFrame] = {}

    def path(self, name: str) -> str:
        return os.path.join(self.base_dir, f"{name}.parquet")

    def load(self, name: str) -> DataFrame:
        """Lazy, memoized parquet scan (no data read until an action).

        The driver's ``events`` table carries TIMESTAMP(NANOS) parquet,
        which Spark has no native type for — it's read as nanos-longs
        (legacy conf) and normalized to TimestampType (µs) here, once,
        at the catalog boundary.

        Session-visible side effect, by design: ``nanosAsLong`` is also
        declared in ``session.get_spark`` and must stay on for the
        SESSION's lifetime (the conf is consulted when a scan
        *executes*, not when it is defined — restoring it after load()
        would flip the semantics of this catalog's own lazy plans).
        The set here covers externally-created sessions; direct
        ``spark.read.parquet`` callers in the same session therefore
        also see NANOS columns as longs and should read through the
        catalog.
        """
        if name not in self._cache:
            self.spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
            df = self.spark.read.parquet(self.path(name))
            if name == "events":
                df = normalize_event_times(df, "ts")
            # the generator's timestamp annotations drift round-to-round
            # (TIMESTAMP vs TIMESTAMP_NTZ); surface every temporal
            # column as plain TIMESTAMP at the catalog boundary so no
            # consumer meets an NTZ-only breakage. Wall-clock exact
            # under the session's pinned UTC zone.
            for fname, ftype in df.dtypes:
                if ftype == "timestamp_ntz":
                    df = df.withColumn(fname, F.col(fname).cast("timestamp"))
            self._cache[name] = df
        return self._cache[name]

    def register_views(self, names: tuple[str, ...] = TESTDATA_TABLES) -> None:
        """Expose every table as a temp view for ``spark.sql`` queries."""
        for name in names:
            try:
                self.load(name).createOrReplaceTempView(name)
            except Exception:
                # tolerate partial datasets (e.g. fixtures without
                # documents/embeddings)
                continue

    def tables(self) -> list[str]:
        """Names of parquet tables present in base_dir (S3 introspection:
        the reference's only schema view is SHOW TABLES/DESCRIBE,
        export_debug.py:24-36)."""
        return sorted(
            f[: -len(".parquet")]
            for f in os.listdir(self.base_dir)
            if f.endswith(".parquet")
        )

    def describe(self, name: str) -> list[tuple[str, str]]:
        """(column, type) pairs — parity with ``DESCRIBE`` in
        export_debug.py:33."""
        return [(f.name, f.dataType.simpleString()) for f in self.load(name).schema]


def mysql_jdbc_options(db_properties: dict[str, str]) -> tuple[str, dict[str, str]]:
    """Map the reference config's ``db_properties`` block
    (export_config.json, loaded at export.py:89-93) to a Spark JDBC
    (url, properties) pair. Defaults mirror the reference's.
    """
    host = db_properties.get("DB_HOST", "localhost")
    port = str(db_properties.get("DB_PORT", "3306"))
    name = db_properties.get("DB_NAME", "analytics_db")
    url = f"jdbc:mysql://{host}:{port}/{name}"
    props = {
        "user": db_properties.get("DB_USER", "openmrs"),
        "password": db_properties.get("DB_PASS", ""),
        "driver": "com.mysql.cj.jdbc.Driver",
    }
    return url, props


def register_jdbc_views(
    spark: SparkSession,
    db_properties: dict[str, str],
    tables: Sequence[str],
    partition_columns: dict[str, str] | None = None,
    reader=None,
) -> dict[str, DataFrame]:
    """Expose warehouse tables as temp views straight from the user's
    ``db_properties`` config block — the "point the engine at your
    existing export_config.json" path. Each view is a JDBC scan
    (``read_jdbc``), so the shimmed report SQL resolves the same
    ``mamba_*`` names it resolves against MySQL.

    ``partition_columns`` (table → numeric column, e.g. ``client_id``)
    turns serial JDBC cursors into parallel bounded reads for the big
    fact tables. ``reader`` is injectable for tests (parquet-backed
    stand-in); defaults to ``read_jdbc``.
    """
    url, props = mysql_jdbc_options(db_properties)
    use_reader = reader or read_jdbc
    out: dict[str, DataFrame] = {}
    for t in tables:
        pc = (partition_columns or {}).get(t)
        df = use_reader(spark, url, t, props, partition_column=pc)
        df.createOrReplaceTempView(t)
        out[t] = df
    return out


def read_jdbc(
    spark: SparkSession,
    url: str,
    table: str,
    properties: dict[str, str],
    partition_column: str | None = None,
    num_partitions: int = 32,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
) -> DataFrame:
    """Live-warehouse scan (reference connects with mysql.connector,
    export.py:232-238). ``partition_column`` bounds give Spark a
    parallel, pushdown-capable read instead of one serial cursor."""
    reader = (
        spark.read.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .options(**properties)
    )
    if partition_column is not None:
        reader = (
            reader.option("partitionColumn", partition_column)
            .option("numPartitions", str(num_partitions))
            .option("lowerBound", str(lower_bound or 0))
            .option("upperBound", str(upper_bound or 1_000_000_000))
        )
    return reader.load()


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_col: str,
    num_buckets: int = 64,
    sort_col: str | None = None,
) -> None:
    """Persist a fact table bucketed by its join/window key.

    This is the 100 TB answer to the reference workload's shape: 68 of
    its windows and most joins key on ``client_id`` (SURVEY.md §2e), so
    bucketing by that key makes every downstream window and join
    shuffle-free (Exchange elided by bucket metadata).
    """
    writer = df.write.mode("overwrite").format("parquet")
    if sort_col:
        writer = writer.bucketBy(num_buckets, bucket_col).sortBy(sort_col)
    else:
        writer = writer.bucketBy(num_buckets, bucket_col)
    writer.saveAsTable(table_name)
