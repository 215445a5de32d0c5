"""Skew mitigation: salted joins and two-phase aggregation.

AQE's skew-join splitting (on by default in session.get_spark) handles
most skew at runtime by splitting oversized partitions. These explicit
rewrites cover the cases AQE can't: a *broadcast-ineligible* join where
one key holds a double-digit percentage of all rows (AQE splits the
partition but every split still probes the same hot build rows), and
hot-key aggregations whose single reducer becomes the straggler.

Both are pure plan rewrites — results are identical to the unsalted
equivalents (tests pin this).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SALT_COL = "__salt"


def salted_join(
    skewed: DataFrame,
    other: DataFrame,
    on: Sequence[str],
    salt: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join where ``skewed`` has hot keys: the skewed side gets a
    random salt in [0, salt), ``other`` is replicated ``salt``× with
    every salt value, and the join adds the salt to its keys — the hot
    key's rows spread over ``salt`` reducers instead of one.

    ``other`` is scanned once and expanded with a JVM-side
    explode(sequence(...)) — replication costs |other|·salt rows of
    shuffle, so use for dimension-to-fact shapes where ``other`` is the
    smaller (but too big to broadcast) side. Row-level results equal
    the unsalted join; ``rand`` affects placement only, not matching.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"how must be inner|left, got {how}")
    sk = skewed.withColumn(SALT_COL, (F.rand(seed=42) * salt).cast("int"))
    ot = other.withColumn(
        SALT_COL, F.explode(F.sequence(F.lit(0), F.lit(salt - 1)))
    )
    return sk.join(ot, on=[*on, SALT_COL], how=how).drop(SALT_COL)


def two_phase_agg(
    df: DataFrame,
    keys: Sequence[str],
    aggs: dict[str, str],
    salt: int = 16,
) -> DataFrame:
    """Hot-key aggregation in two hops: aggregate on (keys, salt) first
    — the hot key's rows combine on ``salt`` reducers — then merge the
    partials per key. Supports the decomposable aggregates the
    reference workload uses: ``count``, ``sum``, ``min``, ``max``.

    ``aggs`` maps column → function name; output columns are named
    ``{fn}_{col}``. (Spark's map-side partial aggregation already does
    this for most plans; the explicit form guards aggregations where
    partial combine is defeated — e.g. after an exchange on the same
    key or under distinct-like rewrites.)
    """
    merge_fn = {"count": "sum", "sum": "sum", "min": "min", "max": "max"}
    for fn in aggs.values():
        if fn not in merge_fn:
            raise ValueError(f"non-decomposable aggregate: {fn}")

    salted = df.withColumn(SALT_COL, (F.rand(seed=42) * salt).cast("int"))
    partial = salted.groupBy(*keys, SALT_COL).agg(
        *[
            getattr(F, fn)(col).alias(f"__p_{fn}_{col}")
            for col, fn in aggs.items()
        ]
    )
    return partial.groupBy(*keys).agg(
        *[
            getattr(F, merge_fn[fn])(f"__p_{fn}_{col}").alias(f"{fn}_{col}")
            for col, fn in aggs.items()
        ]
    )


def key_skew_report(
    df: DataFrame,
    cols: Sequence[str],
    top_k: int = 10,
    rsd: float = 0.05,
) -> DataFrame:
    """Per join-key-column skew diagnostics — the numbers that decide
    between a plain hash join, ``salted_join``, and ``two_phase_agg``
    BEFORE the straggler shows up in production:

    one tiny row per column: ``(column, n_rows, n_null, n_distinct_est,
    top1_frac, topk_frac, top_values array<string>)`` where
    ``top1_frac`` is the hottest value's share of non-NULL rows and
    ``topk_frac`` the top-``top_k`` values' combined share. A
    ``top1_frac`` in the double digits on a broadcast-ineligible join
    key is the ``salted_join`` trigger (module docstring).

    Shape: per column one exact-top-k pass (``sketch.exact_topk`` —
    salted, bounded) plus one shared count/HLL aggregation pass; the
    report itself is column-count-sized driver arithmetic."""
    from pyspark.sql import types as T

    from data_export_tool_spark.operators.sketch import exact_topk

    cols = [cols] if isinstance(cols, str) else list(cols)
    if not cols:
        raise ValueError("key_skew_report needs at least one column")
    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in cols:
        aggs += [
            F.count(F.col(c)).alias(f"__nn_{c}"),
            F.approx_count_distinct(c, rsd).alias(f"__nd_{c}"),
        ]
    row = df.agg(*aggs).first()
    out = []
    for c in cols:
        tops = exact_topk(df, c, top_k).collect()
        nn = int(row[f"__nn_{c}"])
        top1 = (tops[0]["cnt"] / nn) if tops and nn else None
        topk = (sum(t["cnt"] for t in tops) / nn) if tops and nn else None
        out.append(
            (
                c,
                int(row["__n"]),
                int(row["__n"]) - nn,
                int(row[f"__nd_{c}"]),
                None if top1 is None else round(top1, 6),
                None if topk is None else round(topk, 6),
                [t["item"] for t in tops],
            )
        )
    schema = T.StructType(
        [
            T.StructField("column", T.StringType()),
            T.StructField("n_rows", T.LongType()),
            T.StructField("n_null", T.LongType()),
            T.StructField("n_distinct_est", T.LongType()),
            T.StructField("top1_frac", T.DoubleType()),
            T.StructField("topk_frac", T.DoubleType()),
            T.StructField("top_values", T.ArrayType(T.StringType())),
        ]
    )
    return df.sparkSession.createDataFrame(out, schema)
