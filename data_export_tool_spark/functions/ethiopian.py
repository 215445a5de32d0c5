"""Ethiopian (Amete Mihret) calendar conversion.

The reference emits every report date twice — Gregorian (``*_GC``) and
Ethiopian (``*_ET``) — via the MySQL stored function
``fn_gregorian_to_ethiopian_calendar(date, 'D/M/Y')`` (19 call sites,
e.g. /root/reference/sql_queries/Tx_Curr_LineList.sql:94-110), and
derives the report window from an Ethiopian month/year picked in the UI
(/root/reference/export.py:360-375, via py-ethiopian-date-converter).

This module implements both directions with the public Julian-day
algorithm (Beyene & Kudlek, "Ethiopian calendar" — the same arithmetic
py-ethiopian-date-converter uses). The Spark side is pure integer
column arithmetic, so it stays inside whole-stage codegen — no UDF.

Algorithm (Amete Mihret epoch JDN = 1723856):

    jdn   = days_since_unix_epoch(date) + 2440588
    r     = (jdn - 1723856) mod 1461
    n     = r mod 365 + 365 * (r div 1460)
    year  = 4 * ((jdn - 1723856) div 1461) + r div 365 - r div 1460
    month = n div 30 + 1
    day   = n mod 30 + 1

and the inverse

    jdn = 1723856 + 365 + 365*(year-1) + year div 4 + 30*month + day - 31
"""

from __future__ import annotations

import datetime as _dt

from pyspark.sql import Column, SparkSession
from pyspark.sql import functions as F

JDN_EPOCH_AMETE_MIHRET = 1723856
JDN_UNIX_EPOCH = 2440588  # JDN of 1970-01-01

ETHIOPIAN_MONTHS = (
    "Meskerem", "Tikimt", "Hidar", "Tahsas", "Tir", "Yekatit",
    "Megabit", "Miazia", "Ginbot", "Sene", "Hamle", "Nehassie", "Pagume",
)


def _jdn(col: Column) -> Column:
    """Julian day number of a date column (integer, civil-date JDN)."""
    return F.datediff(col.cast("date"), F.lit("1970-01-01").cast("date")) + F.lit(
        JDN_UNIX_EPOCH
    )


def eth_date_parts(col: Column) -> tuple[Column, Column, Column]:
    """(year, month, day) Ethiopian-calendar columns for a Gregorian date."""
    off = _jdn(col) - F.lit(JDN_EPOCH_AMETE_MIHRET)
    r = off % 1461
    n = r % 365 + F.lit(365) * (r / 1460).cast("int")
    year = (
        F.lit(4) * (off / 1461).cast("int")
        + (r / 365).cast("int")
        - (r / 1460).cast("int")
    )
    month = (n / 30).cast("int") + 1
    day = n % 30 + 1
    return year, month, day


def gregorian_to_eth(col: Column, fmt: str = "D/M/Y") -> Column:
    """Ethiopian date as a string, default ``'D/M/Y'``.

    Parity target: ``fn_gregorian_to_ethiopian_calendar(d, 'D/M/Y')``
    (Tx_Curr_LineList.sql:94). NULL-safe: NULL in → NULL out (the
    arithmetic propagates nulls naturally).
    """
    y, m, d = eth_date_parts(col)
    if fmt == "D/M/Y":
        parts = F.concat_ws("/", d.cast("string"), m.cast("string"), y.cast("string"))
    elif fmt == "Y-M-D":
        parts = F.concat_ws("-", y.cast("string"), m.cast("string"), d.cast("string"))
    else:
        raise ValueError(f"unsupported Ethiopian date format: {fmt}")
    # NULL in → NULL out (concat_ws would silently yield '' instead,
    # diverging from the MySQL stored function's NULL propagation)
    return F.when(col.isNull(), F.lit(None).cast("string")).otherwise(parts)


def eth_date_str(col: Column) -> Column:
    """Alias for the reference's default 'D/M/Y' rendering."""
    return gregorian_to_eth(col, "D/M/Y")


# --- driver-side (plain Python) conversions — report-window resolution ----


def eth_to_gregorian(year: int, month: int, day: int) -> _dt.date:
    """Ethiopian → Gregorian date (U3; export.py:369-375 uses the same
    public algorithm via py-ethiopian-date-converter)."""
    jdn = (
        JDN_EPOCH_AMETE_MIHRET
        + 365
        + 365 * (year - 1)
        + year // 4
        + 30 * month
        + day
        - 31
    )
    return _dt.date(1970, 1, 1) + _dt.timedelta(days=jdn - JDN_UNIX_EPOCH)


def gregorian_to_eth_py(d: _dt.date) -> tuple[int, int, int]:
    """Gregorian → Ethiopian (year, month, day), plain Python."""
    jdn = (d - _dt.date(1970, 1, 1)).days + JDN_UNIX_EPOCH
    off = jdn - JDN_EPOCH_AMETE_MIHRET
    r = off % 1461
    n = r % 365 + 365 * (r // 1460)
    year = 4 * (off // 1461) + r // 365 - r // 1460
    month = n // 30 + 1
    day = n % 30 + 1
    return year, month, day


def eth_parts_sql(
    days_since_epoch: str, int_div: str = "div"
) -> tuple[str, str, str]:
    """(day, month, year) Ethiopian-calendar expressions as SQL TEXT —
    the SINGLE source of the Julian-day arithmetic for every SQL-text
    consumer (the Spark inline shim, the Spark SQL UDF below, and the
    DuckDB oracle macro), so the epoch constants and div/mod chain can
    never drift between the engine and its oracles. ``days_since_epoch``
    is the dialect's days-since-1970-01-01 expression;``int_div`` its
    integer-division operator (Spark ``div``, DuckDB ``//``)."""
    off = f"({days_since_epoch} + {JDN_UNIX_EPOCH - JDN_EPOCH_AMETE_MIHRET})"
    r = f"({off} % 1461)"
    n = f"({r} % 365 + 365 * ({r} {int_div} 1460))"
    year = (
        f"(4 * ({off} {int_div} 1461) + ({r} {int_div} 365)"
        f" - ({r} {int_div} 1460))"
    )
    month = f"({n} {int_div} 30 + 1)"
    day = f"({n} % 30 + 1)"
    return day, month, year


def eth_dmy_sql(
    days_since_epoch: str, int_div: str = "div", str_type: str = "STRING"
) -> str:
    """The 'D/M/Y' rendering as SQL text, from :func:`eth_parts_sql`."""
    d, m, y = eth_parts_sql(days_since_epoch, int_div)
    return (
        f"concat(CAST({d} AS {str_type}), '/', "
        f"CAST({m} AS {str_type}), '/', CAST({y} AS {str_type}))"
    )


def register_sql_functions(spark: SparkSession) -> None:
    """Make the conversion callable from ``spark.sql`` text, so shimmed
    reference SQL (plans.dialect) can keep its call sites.

    Registered as a SQL scalar function (``CREATE TEMPORARY FUNCTION …
    RETURN <expr>``, Spark 4 SQL UDF) whose body is the same integer
    column arithmetic as ``gregorian_to_eth`` — it inlines into the
    plan and stays in whole-stage codegen; no Python UDF, no
    serialization boundary. Honors ``fmt`` ('D/M/Y' and 'Y-M-D';
    anything else raises, matching ``gregorian_to_eth``).
    """
    day, month, year = eth_parts_sql("datediff(d, DATE'1970-01-01')")
    spark.sql(
        f"""
        CREATE OR REPLACE TEMPORARY FUNCTION
          fn_gregorian_to_ethiopian_calendar(d DATE, fmt STRING)
        RETURNS STRING
        RETURN CASE
          WHEN d IS NULL THEN CAST(NULL AS STRING)
          WHEN fmt = 'D/M/Y'
            THEN concat_ws('/', {day}, {month}, {year})
          WHEN fmt = 'Y-M-D'
            THEN concat_ws('-', {year}, {month}, {day})
          ELSE raise_error(concat('unsupported Ethiopian date format: ', fmt))
        END
        """
    )
