"""Latest/earliest-per-entity dedup — the reference workload's workhorse.

68 of the reference's window sites are exactly
``ROW_NUMBER() OVER (PARTITION BY client_id ORDER BY event_date DESC,
encounter_id DESC)`` followed by ``WHERE row_num = 1``
(Tx_Curr_LineList.sql:54-56,64,73,79-85 — SURVEY.md §2e W1/W2).

Scale notes: a row_number window shuffles once on the partition key.
When several windows share the key (W4: PMTCT_Maternal_LineList.sql
computes 4 ROW_NUMBERs over one relation), computing them in one
``ranked`` call reuses a single Exchange+Sort. On a bucketed table
(catalog.write_bucketed on the key) the Exchange is elided entirely.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _order_cols(
    order_by: Sequence[Column | str], descending: bool, tiebreak: str | None
) -> list[Column]:
    cols = []
    for c in order_by:
        col = F.col(c) if isinstance(c, str) else c
        cols.append(col.desc() if descending else col.asc())
    if tiebreak is not None:
        cols.append(F.col(tiebreak).desc() if descending else F.col(tiebreak).asc())
    return cols


def ranked(
    df: DataFrame,
    keys: Sequence[str],
    order_by: Sequence[Column | str],
    descending: bool = True,
    tiebreak: str | None = None,
    rank_col: str = "row_num",
) -> DataFrame:
    """Attach a ROW_NUMBER per key group (consumed by J3-style joins:
    ``ON a.k = b.k AND b.row_num = 1``, PMTCT_HEI_LineList.sql:197-202)."""
    w = Window.partitionBy(*keys).orderBy(*_order_cols(order_by, descending, tiebreak))
    return df.withColumn(rank_col, F.row_number().over(w))


def latest_per_key(
    df: DataFrame,
    keys: Sequence[str],
    order_by: Sequence[Column | str],
    tiebreak: str | None = None,
) -> DataFrame:
    """One row per key: the latest by ``order_by`` (W1). ``tiebreak``
    mirrors the reference's ``encounter_id DESC`` determinism pin."""
    return (
        ranked(df, keys, order_by, descending=True, tiebreak=tiebreak)
        .filter(F.col("row_num") == 1)
        .drop("row_num")
    )


def earliest_per_key(
    df: DataFrame,
    keys: Sequence[str],
    order_by: Sequence[Column | str],
    tiebreak: str | None = None,
) -> DataFrame:
    """One row per key: the earliest (W2 — first CPT dose,
    PMTCT_HEI_LineList.sql:97)."""
    return (
        ranked(df, keys, order_by, descending=False, tiebreak=tiebreak)
        .filter(F.col("row_num") == 1)
        .drop("row_num")
    )
