"""Scalar function library (SURVEY.md §2h/§2i).

Everything here is built from ``pyspark.sql.functions`` column
expressions — JVM-side, whole-stage-codegen friendly. No row-at-a-time
Python UDFs: even the Ethiopian-calendar conversion (a MySQL stored
function in the reference warehouse) is pure Julian-day integer
arithmetic on columns.
"""

from data_export_tool_spark.functions.ethiopian import (  # noqa: F401
    eth_date_parts,
    eth_date_str,
    eth_to_gregorian,
    gregorian_to_eth,
    register_sql_functions,
)
from data_export_tool_spark.functions.datetime_ext import (  # noqa: F401
    complete_months_between,
    complete_years_between,
    period_diff_months,
)
from data_export_tool_spark.functions.text import (  # noqa: F401
    doc_fingerprint,
    language_guess,
    quality_score,
    token_count,
)
