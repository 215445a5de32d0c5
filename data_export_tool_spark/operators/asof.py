"""As-of and range joins.

The reference's one correlated scalar subquery —
``(SELECT f2.regimen FROM FollowUp f2 WHERE f2.client_id = x AND
f2.follow_up_date <= ref ORDER BY follow_up_date DESC, encounter_id
DESC LIMIT 1)`` (Tx_Curr_HVL_LineList.sql:109-115, SURVEY.md §2c J9) —
is an *as-of join*: for each left row, the latest right row at or
before a reference instant, per key. Spark SQL can't decorrelate
LIMIT 1, so the engine provides the standard rewrite:

    distinct (key, ref) probes → equi-join on key → filter
    right.time <= ref → groupBy probe, MAX(struct(time, tiebreaks,
    payload)) → join the winners back to the full left side.

Scale notes: every step is a pure function of the input data — no
``monotonically_increasing_id`` (whose values change on task retry /
stage replay and can silently mis-group), no window sort: the best
candidate per probe comes from a map-side-combining MAX aggregate, and
unmatched left rows fall out of the final left join with null right
columns (one pass, no anti-join restore). Probe dedup also collapses
repeated (key, time) lookups — the common shape when many rows ask for
the same as-of instant. For dense time-series at 100 TB, pre-bucketing
both sides on the key removes the join shuffles.
"""

from __future__ import annotations

import datetime
import re
from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, MapType, StructType


def _orderable(dt) -> bool:
    """Whether a data type participates in struct MAX/MIN ordering —
    MapType (at any nesting depth) does not."""
    if isinstance(dt, MapType):
        return False
    if isinstance(dt, ArrayType):
        return _orderable(dt.elementType)
    if isinstance(dt, StructType):
        return all(_orderable(f.dataType) for f in dt.fields)
    return True


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
    tolerance=None,
    allow_exact: bool = True,
) -> DataFrame:
    """For each left row, attach the single right row whose
    ``right_time`` is the closest at-or-before (``backward``, default)
    or at-or-after (``forward``) the left row's ``left_time``, matching
    on the ``on`` keys.

    Column collisions on the right side get ``suffix``. ``tiebreak`` is
    one or more right-side columns that pin determinism among equal
    times (the reference uses ``encounter_id DESC``, its sibling
    windows' convention). Even without tiebreaks the result is
    deterministic: the MAX/MIN struct comparison falls through to the
    remaining right columns, a total (if arbitrary) order.

    Right rows with NULL ``right_time`` are never candidates — the
    reference's correlated ``WHERE t <= ref ... LIMIT 1`` can't select
    them (NULL comparisons are never true), so an unmatched left row
    gets NULL right columns instead of a NULL-time row.

    ``tolerance`` bounds how far back (``backward``) / ahead
    (``forward``) a match may be — pandas ``merge_asof(tolerance=…)``
    parity: an SQL interval string ("7 days") or datetime.timedelta
    for time columns, a number for numeric columns (validated up
    front — malformed strings raise ValueError naming the parameter
    instead of a plan-time SQL parse error); candidates outside the
    band fall out
    BEFORE the MAX/MIN pick, so a stale quote doesn't masquerade as
    current. ``allow_exact=False`` makes the time comparison strict
    (pandas ``allow_exact_matches`` parity — "the last trade strictly
    before this quote"). Both are pure extra filter conjuncts on the
    candidate scan: plan shape unchanged.
    """
    if how not in ("left", "inner"):
        raise ValueError(f"how must be left|inner, got {how}")
    # a bare string would iterate per CHARACTER ("key" → k, e, y)
    on = [on] if isinstance(on, str) else list(on)

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

    tol = None
    if tolerance is not None:
        if isinstance(tolerance, datetime.timedelta):
            total = tolerance.total_seconds()
            if total < 0:
                raise ValueError(
                    f"tolerance must be non-negative, got {tolerance!r}"
                )
            micros = int(round(total * 1_000_000))
            tol = F.expr(f"INTERVAL {micros} MICROSECOND")
        elif isinstance(tolerance, str):
            # validate up front: a malformed string (or one already
            # containing 'INTERVAL') would otherwise surface as a
            # cryptic SQL parse error deep in plan analysis. Compound
            # intervals ('1 day 2 hours') are one or more '<n> <unit>'
            # groups — all accepted by Spark's multi-unit INTERVAL
            # literal syntax.
            unit_group = (
                r"(\d+)\s+"
                r"(microsecond|millisecond|second|minute|hour|day|week"
                r"|month|year)s?"
            )
            m = re.fullmatch(
                rf"\s*{unit_group}(\s+{unit_group})*\s*",
                tolerance,
                re.IGNORECASE,
            )
            if not m:
                raise ValueError(
                    "tolerance must be one or more '<n> <unit>' groups "
                    "(unit in microsecond/millisecond/second/minute/hour/"
                    "day/week/month/year), a number, or a "
                    f"datetime.timedelta; got {tolerance!r}"
                )
            tol = F.expr(f"INTERVAL {tolerance.strip().upper()}")
        elif isinstance(tolerance, (int, float)) and not isinstance(
            tolerance, bool
        ):
            if tolerance < 0:
                raise ValueError(
                    f"tolerance must be non-negative, got {tolerance!r}"
                )
            tol = F.lit(tolerance)
        else:
            raise ValueError(
                "tolerance must be an SQL interval string, a number, or "
                f"a datetime.timedelta; got {type(tolerance).__name__}"
            )
    if direction == "backward":
        cond = (
            F.col(rt) <= F.col(left_time)
            if allow_exact
            else F.col(rt) < F.col(left_time)
        )
        if tol is not None:
            cond = cond & (F.col(rt) >= F.col(left_time) - tol)
        agg = F.max  # latest time; ties → largest tiebreak (DESC pick)
    elif direction == "forward":
        cond = (
            F.col(rt) >= F.col(left_time)
            if allow_exact
            else F.col(rt) > F.col(left_time)
        )
        if tol is not None:
            cond = cond & (F.col(rt) <= F.col(left_time) + tol)
        agg = F.min  # earliest time; ties → smallest tiebreak (ASC pick)
    else:
        raise ValueError(f"direction must be backward|forward, got {direction}")

    probe_keys = [*on, left_time]
    probes = left.select(*probe_keys).distinct()
    payload = [c for c in r.columns if c not in on]

    cands = probes.join(r, on=list(on), how="inner").filter(
        F.col(rt).isNotNull() & cond
    )
    if all(_orderable(r.schema[c].dataType) for c in payload):
        # order key first (time, then tiebreaks), then the full right
        # row; struct MAX/MIN compares lexicographically — fully
        # deterministic even when tiebreaks don't pin a unique row
        best_struct = F.struct(
            F.col(rt),
            *[F.col(t) for t in tbs],
            F.struct(*[F.col(c) for c in payload]).alias("__payload"),
        )
        best = (
            cands.groupBy(*probe_keys)
            .agg(agg(best_struct).alias("__b"))
            .select(*probe_keys, F.col("__b.__payload.*"))
        )
    else:
        # a map-typed payload column cannot participate in struct
        # ordering (AnalysisException) — rank on (time, tiebreaks)
        # only via max_by/min_by and carry the payload as the VALUE;
        # ties beyond the tiebreaks are then engine-pick, so callers
        # with map payloads should pass a unique tiebreak
        pick = F.max_by if agg is F.max else F.min_by
        order_struct = F.struct(F.col(rt), *[F.col(t) for t in tbs])
        best = (
            cands.groupBy(*probe_keys)
            .agg(
                pick(
                    F.struct(*[F.col(c) for c in payload]), order_struct
                ).alias("__b")
            )
            .select(*probe_keys, F.col("__b.*"))
        )
    return left.join(best, on=probe_keys, how=how)


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
    join on the equi keys and applies the range as a join filter. The
    right side's copy of each equi-key column is dropped from the
    result (they are equal by the join condition), so selecting a key
    by bare name is unambiguous; other same-named columns keep both
    copies — disambiguate via ``left[name]`` / ``right[name]``.
    """
    on = [on] if isinstance(on, str) else list(on)
    cond = None
    for k in on:
        c = left[k] == right[k]
        cond = c if cond is None else (cond & c)
    cond = cond & left[point].between(right[lower], right[upper])
    joined = left.join(right, on=cond, how=how)
    for k in on:
        joined = joined.drop(right[k])
    return joined
