"""data_export_tool_spark — a PySpark-native analytics engine.

A brand-new, Spark-first engine with the query and data-processing
capabilities of the reference "Data Extraction Tool"
(CDC-HIS/data-export-tool): parameterized relational line-list reports
(joins, latest-per-entity window dedup, CASE ladders, calendar
conversion), a CSV + zip/checksum export sink, plus the extended
large-scale surface (dedup, similarity search, text analysis,
streaming) a 100 TB training-data pipeline needs.

Architecture (SURVEY.md §7):

- ``session``    — tuned SparkSession builder (AQE, shuffle sizing).
- ``catalog``    — dataset catalog over Parquet/JDBC with explicit schemas.
- ``functions``  — scalar function library (Ethiopian calendar, MySQL
                   date-semantics parity helpers, text analytics).
- ``operators``  — reusable dataflow operators (window dedup, as-of
                   join, MinHash/SimHash dedup, ANN similarity).
- ``sources``    — readers and the CSV/zip/checksum export sink.
- ``plans``      — MySQL→Spark SQL dialect shim, query registry,
                   Ethiopian report-window resolution.
- ``streaming``  — Structured Streaming operators over event streams.
- ``queries``    — the engine's headline query workload (driver-facing).
- ``mamba``      — reference-parity line-list queries over the
                   MambaETL-shaped clinical schema.
"""

__version__ = "0.1.0"
