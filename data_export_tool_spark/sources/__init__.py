"""Sources and sinks (SURVEY.md §2a)."""

from data_export_tool_spark.sources.csv_sink import write_query_csv  # noqa: F401
from data_export_tool_spark.sources.packaging import zip_files_with_checksum  # noqa: F401
