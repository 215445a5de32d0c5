"""Report-window resolution from an Ethiopian month/year (U3).

Parity with the reference's parameter derivation
(/root/reference/export.py:352-375): the window ends on Ethiopian day
20 of the chosen month and starts on day 21 of the *previous*
Ethiopian month — wrapping Meskerem (month 1) back to Pagume
(month 13) of the previous year.
"""

from __future__ import annotations

import datetime as _dt
from dataclasses import dataclass

from data_export_tool_spark.functions.ethiopian import eth_to_gregorian

#: UI month list (export.py:102-103; reference spelling preserved)
ETH_MONTHS = (
    "Meskerem", "Tikimit", "Hidar", "Tahisas", "Tir", "Yekatit",
    "Megabit", "Miazia", "Ginbot", "Sene", "Hamle", "Nehassie",
)
MONTH_INDEX = {name: i + 1 for i, name in enumerate(ETH_MONTHS)}


@dataclass(frozen=True)
class ReportWindow:
    start: _dt.date  # REPORT_START_DATE
    end: _dt.date  # REPORT_END_DATE
    eth_month: int
    eth_year: int

    def as_params(self) -> dict[str, str]:
        return {
            "REPORT_START_DATE": self.start.isoformat(),
            "REPORT_END_DATE": self.end.isoformat(),
        }


def resolve_report_window(month: int | str, year: int) -> ReportWindow:
    """Ethiopian (month, year) → Gregorian [start, end] window.

    ``month`` may be the 1-12 index or a name from ETH_MONTHS.
    end = Eth(20, month, year); start = Eth(21, month-1, year) with the
    Meskerem→Pagume/previous-year wrap (export.py:367-375).
    """
    if isinstance(month, str):
        if month not in MONTH_INDEX:
            raise ValueError(
                f"unknown Ethiopian month name {month!r}; "
                f"expected one of {sorted(MONTH_INDEX)}"
            )
        m = MONTH_INDEX[month]
    else:
        m = int(month)
    if not 1 <= m <= 12:
        raise ValueError(f"Ethiopian report month must be 1-12, got {m}")
    end = eth_to_gregorian(year, m, 20)
    if m == 1:
        start = eth_to_gregorian(year - 1, 13, 21)
    else:
        start = eth_to_gregorian(year, m - 1, 21)
    return ReportWindow(start=start, end=end, eth_month=m, eth_year=year)
