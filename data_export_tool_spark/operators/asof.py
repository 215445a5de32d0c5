"""As-of and range joins.

The reference's one correlated scalar subquery —
``(SELECT f2.regimen FROM FollowUp f2 WHERE f2.client_id = x AND
f2.follow_up_date <= ref ORDER BY follow_up_date DESC, encounter_id
DESC LIMIT 1)`` (Tx_Curr_HVL_LineList.sql:109-115, SURVEY.md §2c J9) —
is an *as-of join*: for each left row, the latest right row at or
before a reference instant, per key. Spark SQL can't decorrelate
LIMIT 1, so the engine provides the standard rewrite:

    equi-join on key (candidates) → filter right.time <= left.ref
    → ROW_NUMBER per left row ordered by right.time DESC → rn = 1

Scale notes: the equi part keeps the join a sort-merge (or broadcast)
join; the window partitions by the *left row id*, so skew is bounded by
per-entity event counts, not global time. For dense time-series at
100 TB, pre-bucketing both sides on the key removes both shuffles.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_time: str,
    right_time: str,
    tiebreak: str | Sequence[str] | None = None,
    how: str = "left",
    direction: str = "backward",
    suffix: str = "_r",
) -> DataFrame:
    """For each left row, attach the single right row whose
    ``right_time`` is the closest at-or-before (``backward``, default)
    or at-or-after (``forward``) the left row's ``left_time``, matching
    on the ``on`` keys.

    Column collisions on the right side get ``suffix``. ``tiebreak`` is
    one or more right-side columns that pin determinism among equal
    times (the reference uses ``encounter_id DESC``); pass enough
    columns to make the ordering total or equal-time picks are
    engine-dependent.
    """
    lid = "__asof_lid"
    left_k = left.withColumn(lid, F.monotonically_increasing_id())

    overlap = set(left.columns) & set(right.columns)
    r = right
    for c in overlap:
        if c not in on:
            r = r.withColumnRenamed(c, c + suffix)

    def _r(name: str) -> str:
        return name + suffix if name in overlap and name not in on else name

    rt = _r(right_time)
    tiebreaks = (
        [tiebreak] if isinstance(tiebreak, str) else list(tiebreak or [])
    )
    tbs = [_r(t) for t in tiebreaks]

    if direction == "backward":
        cond = F.col(rt) <= F.col(left_time)
        order = [F.col(rt).desc()] + [F.col(t).desc() for t in tbs]
    elif direction == "forward":
        cond = F.col(rt) >= F.col(left_time)
        order = [F.col(rt).asc()] + [F.col(t).asc() for t in tbs]
    else:
        raise ValueError(f"direction must be backward|forward, got {direction}")

    joined = left_k.join(r, on=list(on), how="left").filter(
        cond | F.col(rt).isNull()
    )
    w = Window.partitionBy(lid).orderBy(*order)
    best = (
        joined.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
    if how == "left":
        # rows whose every candidate failed the time filter dropped out;
        # restore them with null right-side columns
        missing = left_k.join(best.select(lid), on=lid, how="left_anti")
        best = best.unionByName(missing, allowMissingColumns=True)
    elif how != "inner":
        raise ValueError(f"how must be left|inner, got {how}")
    return best.drop(lid)


def range_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    point: str,
    lower: str,
    upper: str,
    how: str = "inner",
) -> DataFrame:
    """Join where ``left[point]`` falls in ``[right[lower], right[upper]]``
    per key — the reference's episode membership join
    (PMTCT_Maternal_LineList.sql:38-42; Tx_Curr_HVL_LineList.sql:151).

    Expressed as an equi+range condition so Catalyst keeps a sort-merge
    join on the equi keys and applies the range as a join filter.
    """
    cond = None
    for k in on:
        c = left[k] == right[k]
        cond = c if cond is None else (cond & c)
    cond = cond & left[point].between(right[lower], right[upper])
    return left.join(right, on=cond, how=how)
