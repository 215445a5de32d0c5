"""Date/time helpers with MySQL-semantics parity (SURVEY.md §2h).

The reference leans on three MySQL behaviors Spark doesn't reproduce
verbatim:

- ``TIMESTAMPDIFF(unit, a, b)`` counts *complete* units (83 sites).
  Spark's ``timestampdiff`` for MONTH/YEAR also counts complete units,
  but engines like DuckDB count boundary crossings — so the engine pins
  the MySQL semantics explicitly with integer arithmetic that any
  oracle can replicate.
- ``PERIOD_DIFF(DATE_FORMAT(b,'%Y%m'), DATE_FORMAT(a,'%Y%m'))``
  (Tx_Curr_LineList.sql:150) = calendar-month delta ignoring days.
- ``DATE_ADD(d, INTERVAL n DAY)`` with expression ``n``
  (Tx_Curr_VLEligible_LineList.sql:152-153) — Spark's ``date_add``
  accepts a column n (≥3.3), re-exported here for discoverability.

All pure column arithmetic → whole-stage codegen, no UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def period_diff_months(b: Column, a: Column) -> Column:
    """Calendar months from a to b, ignoring day-of-month.

    Parity: ``PERIOD_DIFF(DATE_FORMAT(b,'%Y%m'), DATE_FORMAT(a,'%Y%m'))``
    (Tx_Curr_LineList.sql:150; Tx_Curr_AHD_LineList.sql:298-299).
    """
    return (F.year(b) * 12 + F.month(b)) - (F.year(a) * 12 + F.month(a))


def _time_of_day_micros(c: Column) -> Column:
    """Microseconds since midnight — 0 for DateType inputs, so the
    complete-unit helpers below are exact at both date and timestamp
    grain (MySQL compares the full (day, time) tail, and a DATE-only
    comparison would call 23:00→01:00 a complete day)."""
    t = c.cast("timestamp")
    return F.unix_micros(t) - F.unix_micros(F.date_trunc("DAY", t))


def complete_months_between(start: Column, end: Column) -> Column:
    """MySQL ``TIMESTAMPDIFF(MONTH, start, end)``: whole months elapsed.

    Counts calendar months then subtracts one if the end (day-of-month,
    time-of-day) tail hasn't reached the start's.
    """
    months = period_diff_months(end, start)
    not_reached = F.struct(
        F.dayofmonth(end), _time_of_day_micros(end)
    ) < F.struct(F.dayofmonth(start), _time_of_day_micros(start))
    return months - F.when(not_reached, 1).otherwise(0)


def complete_years_between(start: Column, end: Column) -> Column:
    """MySQL ``TIMESTAMPDIFF(YEAR, start, end)`` — age computation
    (Tx_Curr_LineList.sql:93)."""
    years = F.year(end) - F.year(start)
    not_reached = F.struct(
        F.month(end), F.dayofmonth(end), _time_of_day_micros(end)
    ) < F.struct(F.month(start), F.dayofmonth(start), _time_of_day_micros(start))
    return years - F.when(not_reached, 1).otherwise(0)


def complete_weeks_between(start: Column, end: Column) -> Column:
    """MySQL ``TIMESTAMPDIFF(WEEK, ...)`` — gestation weeks
    (Tx_Curr_VLEligibleNew_LineList.sql:396-397). Complete 24h periods
    (time-aware) divided by 7, truncating toward zero like MySQL."""
    micros = F.unix_micros(end.cast("timestamp")) - F.unix_micros(
        start.cast("timestamp")
    )
    days = (micros / F.lit(86_400_000_000)).cast("long")
    return (days / 7).cast("int")


def mysql_if(cond: Column, a: Column, b: Column) -> Column:
    """``IF(cond, a, b)`` (Tx_Curr_OutComeList.sql:100-103)."""
    return F.when(cond, a).otherwise(b)


def mysql_isnull_int(col: Column) -> Column:
    """1-arg ``ISNULL(x)`` returning 0/1 (the reference *misuses* this in
    ``ISNULL(x) > CAST(50 AS float)``, a dead branch — SURVEY.md §4.3).
    Provided for bug-compatible transcription when requested."""
    return F.when(col.isNull(), 1).otherwise(0)
