"""Data-quality validation suite (extended surface).

A 100 TB ingest without validation is a liability: one silently-null
join key or a schema drift between snapshots corrupts everything
downstream. The reference's only integrity surface is schema
introspection (`export_debug.py:24-36` SHOW TABLES / DESCRIBE); this
module carries the checks a production pipeline actually runs, each
expressed so Catalyst can partial-aggregate:

- ``profile_columns`` — per-column null rate / distinct count /
  min / max in ONE aggregation pass over the table (every metric is a
  partial-aggregable expression, so the scan is map-side combined and
  the exchange carries one row per partition, not per value).
- ``run_checks`` — a declarative expectation battery (not-null,
  range, set membership, regex conformity, uniqueness, custom
  predicate) evaluated in ONE aggregation pass; per-row predicates
  become ``sum(when(violation, 1))`` columns of the same aggregate.
- ``referential_integrity`` — orphaned foreign keys via a real
  LEFT ANTI join (AQE picks broadcast when the parent's key
  projection is small; the child is never collected).
- ``schema_drift`` — added / removed / retyped columns between two
  snapshots. Pure driver-side metadata (StructType diff) — zero jobs.

All outputs are DataFrames so the checks compose into pipelines and
land in the same sinks as the data they guard.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Sequence

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _sql_str(s: str) -> str:
    """SQL string literal (single quotes doubled)."""
    return "'" + s.replace("'", "''") + "'"


_PROFILE_SCHEMA = T.StructType(
    [
        T.StructField("column", T.StringType()),
        T.StructField("n_rows", T.LongType()),
        T.StructField("n_null", T.LongType()),
        T.StructField("null_frac", T.DoubleType()),
        T.StructField("n_distinct", T.LongType()),
        T.StructField("min_value", T.StringType()),
        T.StructField("max_value", T.StringType()),
    ]
)

_CHECKS_SCHEMA = T.StructType(
    [
        T.StructField("check", T.StringType()),
        T.StructField("n_rows", T.LongType()),
        T.StructField("violations", T.LongType()),
        T.StructField("passed", T.BooleanType()),
    ]
)


def profile_columns(
    df: DataFrame,
    columns: Sequence[str] | None = None,
    exact_distinct: bool = False,
    rsd: float = 0.05,
) -> DataFrame:
    """Per-column profile in one aggregation pass.

    Returns one row per profiled column:
    ``(column, n_rows, n_null, null_frac, n_distinct, min_value,
    max_value)`` with min/max rendered as strings so heterogeneous
    column types share one output schema.

    ``n_distinct`` uses HyperLogLog (``approx_count_distinct``,
    relative error ``rsd``) by default — at 100 TB an exact distinct
    per column is an expand+shuffle per column, while the HLL sketch
    is a fixed-size partial aggregate. ``exact_distinct=True`` opts
    into the exact form for small tables and oracle tests.

    Shape: a single ``agg`` with 5·k expressions → 1 wide row →
    ``stack`` back to long form. One scan, one (tiny) exchange.
    """
    cols = list(columns) if columns is not None else list(df.columns)
    if not cols:
        # stack(0, ...) is a parse error; an empty request is an empty
        # (but correctly-typed) report, not a crash
        return df.sparkSession.createDataFrame(
            [], _PROFILE_SCHEMA
        )
    # Column RESOLUTION parses names (dots, backticks) in both F.col
    # and df[...], so legal-but-hostile parquet names (o'clock, a`b)
    # break direct reference. Rename everything positionally via toDF
    # (verbatim, no parsing), profile the safe names, and emit the
    # ORIGINAL name as an escaped string literal in the output.
    safe_all = [f"__pc{i}" for i in range(len(df.columns))]
    pos = {name: i for i, name in enumerate(df.columns)}
    missing = [c for c in cols if c not in pos]
    if missing:
        raise ValueError(f"columns not in DataFrame: {missing}")
    work = df.toDF(*safe_all)

    aggs: list[Column] = [F.count(F.lit(1)).alias("__n")]
    for c in cols:
        s = safe_all[pos[c]]
        aggs.append(F.count(F.col(s)).alias(f"__nn_{s}"))
        if exact_distinct:
            aggs.append(F.count_distinct(F.col(s)).alias(f"__nd_{s}"))
        else:
            aggs.append(F.approx_count_distinct(s, rsd).alias(f"__nd_{s}"))
        aggs.append(F.min(F.col(s)).cast("string").alias(f"__mn_{s}"))
        aggs.append(F.max(F.col(s)).cast("string").alias(f"__mx_{s}"))
    wide = work.agg(*aggs)

    # stack(k, 'name', nn, nd, mn, mx, ...) → long form; the input is
    # one row, so this is a driver-scale reshape, not a shuffle. Only
    # the display literal carries the original name (quote-escaped)
    stack_args: list[str] = []
    for c in cols:
        s = safe_all[pos[c]]
        stack_args += [_sql_str(c), f"__nn_{s}", f"__nd_{s}", f"__mn_{s}", f"__mx_{s}"]
    stacked = wide.select(
        F.col("__n").alias("n_rows"),
        F.expr(
            f"stack({len(cols)}, {', '.join(stack_args)}) "
            "AS (column, n_nonnull, n_distinct, min_value, max_value)"
        ),
    )
    return stacked.select(
        "column",
        "n_rows",
        (F.col("n_rows") - F.col("n_nonnull")).alias("n_null"),
        F.round(
            (F.col("n_rows") - F.col("n_nonnull"))
            / F.greatest(F.col("n_rows"), F.lit(1)).cast("double"),
            6,
        ).alias("null_frac"),
        F.col("n_distinct").cast("long").alias("n_distinct"),
        "min_value",
        "max_value",
    )


@dataclass(frozen=True)
class Check:
    """One expectation: ``violation`` is a Column that is true on rows
    BREAKING the expectation (``kind='row'``), or a 0-argument builder
    returning an aggregate violation-count Column (``kind='agg'``,
    used by uniqueness where the expectation is not per-row)."""

    name: str
    kind: str  # 'row' | 'agg'
    violation: Column | Callable[[], Column]


def not_null(col: str) -> Check:
    return Check(f"not_null({col})", "row", F.col(col).isNull())


def in_range(col: str, lo, hi) -> Check:
    c = F.col(col)
    return Check(
        f"in_range({col},{lo},{hi})",
        "row",
        c.isNotNull() & ~c.between(F.lit(lo), F.lit(hi)),
    )


def in_set(col: str, values: Sequence) -> Check:
    c = F.col(col)
    return Check(
        f"in_set({col})", "row", c.isNotNull() & ~c.isin(list(values))
    )


def matches(col: str, pattern: str) -> Check:
    c = F.col(col)
    return Check(
        f"matches({col})", "row", c.isNotNull() & ~c.rlike(pattern)
    )


def satisfies(name: str, predicate: Column) -> Check:
    """Custom row expectation: ``predicate`` true on GOOD rows."""
    return Check(name, "row", ~F.coalesce(predicate, F.lit(False)))


def unique(col: str) -> Check:
    """Duplicate count = count(col) − count(DISTINCT col). Exact
    distinct is an expand under partial aggregation — acceptable here
    because a uniqueness GATE must be exact to be a gate at all."""
    return Check(
        f"unique({col})",
        "agg",
        lambda: (F.count(F.col(col)) - F.count_distinct(F.col(col))),
    )


def run_checks(df: DataFrame, checks: Sequence[Check]) -> DataFrame:
    """Evaluate every expectation in ONE aggregation pass.

    Returns one row per check: ``(check, n_rows, violations, passed)``.
    Row-kind checks compile to ``sum(when(violation,1))`` columns of a
    single ``agg`` — the scan is shared and map-side combined; agg-kind
    checks contribute their own aggregate expression to the same pass.
    """
    if not checks:
        return df.sparkSession.createDataFrame([], _CHECKS_SCHEMA)
    aggs: list[Column] = [F.count(F.lit(1)).alias("__n")]
    for i, ch in enumerate(checks):
        if ch.kind == "row":
            expr = F.sum(F.when(ch.violation, 1).otherwise(0))
        elif ch.kind == "agg":
            expr = ch.violation()
        else:  # pragma: no cover - constructor functions never do this
            raise ValueError(f"unknown check kind {ch.kind!r}")
        aggs.append(F.coalesce(expr, F.lit(0)).cast("long").alias(f"__v{i}"))
    wide = df.agg(*aggs)

    stack_args: list[str] = []
    for i, ch in enumerate(checks):
        stack_args += [_sql_str(ch.name), f"`__v{i}`"]
    return wide.select(
        F.col("__n").alias("n_rows"),
        F.expr(
            f"stack({len(checks)}, {', '.join(stack_args)}) AS (check, violations)"
        ),
    ).select(
        "check",
        "n_rows",
        "violations",
        (F.col("violations") == 0).alias("passed"),
    )


def referential_integrity(
    child: DataFrame,
    child_key: str,
    parent: DataFrame,
    parent_key: str,
    broadcast_parent: bool = False,
) -> DataFrame:
    """Rows of ``child`` whose non-null ``child_key`` has no match in
    ``parent`` — a LEFT ANTI join on the parent's key projection (one
    column, deduplicated by the join itself). NULL keys are excluded:
    a null FK is a ``not_null`` concern, not an orphan.

    ``broadcast_parent=True`` hints the key projection broadcast-able
    (a dimension's key column almost always is); otherwise AQE decides
    from the observed size.
    """
    keys = parent.select(F.col(parent_key).alias(child_key))
    if broadcast_parent:
        keys = F.broadcast(keys)
    return child.where(F.col(child_key).isNotNull()).join(
        keys, on=child_key, how="left_anti"
    )


def schema_drift(
    old: DataFrame | T.StructType, new: DataFrame | T.StructType
) -> list[dict]:
    """Column-level diff between two snapshots' schemas: list of
    ``{"column", "change", "before", "after"}`` with change in
    ``added | removed | retyped``. Pure metadata — zero Spark jobs.
    Nested types compare by their full simpleString."""
    old_s = old.schema if isinstance(old, DataFrame) else old
    new_s = new.schema if isinstance(new, DataFrame) else new
    old_t = {f.name: f.dataType.simpleString() for f in old_s.fields}
    new_t = {f.name: f.dataType.simpleString() for f in new_s.fields}
    out: list[dict] = []
    for name in sorted(old_t.keys() | new_t.keys()):
        if name not in new_t:
            out.append(
                {"column": name, "change": "removed", "before": old_t[name], "after": None}
            )
        elif name not in old_t:
            out.append(
                {"column": name, "change": "added", "before": None, "after": new_t[name]}
            )
        elif old_t[name] != new_t[name]:
            out.append(
                {
                    "column": name,
                    "change": "retyped",
                    "before": old_t[name],
                    "after": new_t[name],
                }
            )
    return out


def schema_drift_df(
    spark: SparkSession, old: DataFrame | T.StructType, new: DataFrame | T.StructType
) -> DataFrame:
    """``schema_drift`` as a (tiny) DataFrame so drift reports land in
    the same sinks as the data they describe."""
    schema = T.StructType(
        [
            T.StructField("column", T.StringType()),
            T.StructField("change", T.StringType()),
            T.StructField("before", T.StringType()),
            T.StructField("after", T.StringType()),
        ]
    )
    return spark.createDataFrame(schema_drift(old, new), schema)


def profile_drift(
    old_profile: DataFrame,
    new_profile: DataFrame,
    null_frac_tol: float = 0.05,
    distinct_ratio_tol: float = 0.5,
) -> DataFrame:
    """Compare two ``profile_columns`` outputs (today's snapshot vs
    yesterday's): per column, the null-rate delta, the distinct-count
    ratio, and min/max boundary movement, with a ``flagged`` verdict
    when null-rate moved more than ``null_frac_tol`` (absolute) or the
    distinct ratio left ``[1-tol, 1/(1-tol)]``. Columns present in
    only one profile are flagged as added/removed. Profiles are
    per-column rows (already tiny), so this is a driver-scale join —
    the expensive part was the two profiling passes, not the diff."""
    o = old_profile.select(
        F.col("column"),
        F.col("null_frac").alias("old_null_frac"),
        F.col("n_distinct").alias("old_n_distinct"),
        F.col("min_value").alias("old_min"),
        F.col("max_value").alias("old_max"),
    )
    n = new_profile.select(
        F.col("column"),
        F.col("null_frac").alias("new_null_frac"),
        F.col("n_distinct").alias("new_n_distinct"),
        F.col("min_value").alias("new_min"),
        F.col("max_value").alias("new_max"),
    )
    j = o.join(n, "column", "full_outer")
    status = (
        F.when(F.col("old_null_frac").isNull(), F.lit("added"))
        .when(F.col("new_null_frac").isNull(), F.lit("removed"))
        .otherwise(F.lit("common"))
    )
    null_delta = F.round(F.col("new_null_frac") - F.col("old_null_frac"), 6)
    distinct_ratio = F.round(
        F.col("new_n_distinct")
        / F.greatest(F.col("old_n_distinct"), F.lit(1)).cast("double"),
        6,
    )
    lo = 1.0 - distinct_ratio_tol
    flagged = (
        (status != "common")
        | (F.abs(null_delta) > null_frac_tol)
        | (distinct_ratio < lo)
        | (distinct_ratio > 1.0 / lo)
    )
    return j.select(
        "column",
        status.alias("status"),
        null_delta.alias("null_frac_delta"),
        distinct_ratio.alias("distinct_ratio"),
        (F.col("old_min") != F.col("new_min")).alias("min_moved"),
        (F.col("old_max") != F.col("new_max")).alias("max_moved"),
        F.coalesce(flagged, F.lit(True)).alias("flagged"),
    )


def correlation_matrix(df: DataFrame, cols: Sequence[str]) -> DataFrame:
    """Pairwise Pearson correlations over numeric columns in ONE
    partial-aggregable pass — the profiling companion to
    ``profile_columns`` (a training-data team's first collinearity /
    leakage screen over feature tables).

    Output: one tiny row per unordered pair ``(col_a, col_b, corr,
    n)`` where ``n`` counts rows with BOTH values present (pairwise
    deletion — ``F.corr``'s own NULL semantics, matching SQL
    ``corr``); a constant column yields NULL corr. All p·(p−1)/2
    moments aggregate in a single scan with map-side combine — the
    shuffle is one row of p² floats, never data."""
    frame = df
    cols = list(cols)
    if len(cols) < 2:
        raise ValueError(f"need >= 2 columns: {cols}")
    # covar_samp / (stddev·stddev) instead of F.corr: under ANSI mode
    # corr raises DIVIDE_BY_ZERO on a zero-variance column; the guarded
    # form returns NULL there (and uses the same numerically-stable
    # one-pass aggregates). Pairwise deletion needs per-pair
    # conditioned columns so each stddev sees exactly the rows where
    # BOTH values are present.
    aggs = []
    for i, a in enumerate(cols):
        for b in cols[i + 1 :]:
            ca, cb = F.col(a).cast("double"), F.col(b).cast("double")
            both = ca.isNotNull() & cb.isNotNull()
            xa, xb = F.when(both, ca), F.when(both, cb)
            aggs += [
                F.covar_samp(xa, xb).alias(f"__c_{a}__{b}"),
                F.stddev_samp(xa).alias(f"__sa_{a}__{b}"),
                F.stddev_samp(xb).alias(f"__sb_{a}__{b}"),
                F.count(F.when(both, F.lit(1))).alias(f"__n_{a}__{b}"),
            ]
    row = frame.agg(*aggs).first()
    out = []
    for i, a in enumerate(cols):
        for b in cols[i + 1 :]:
            cov = row[f"__c_{a}__{b}"]
            sa = row[f"__sa_{a}__{b}"]
            sb = row[f"__sb_{a}__{b}"]
            r = (
                cov / (sa * sb)
                if cov is not None and sa and sb
                else None
            )
            out.append((a, b, r, int(row[f"__n_{a}__{b}"])))
    schema = T.StructType(
        [
            T.StructField("col_a", T.StringType()),
            T.StructField("col_b", T.StringType()),
            T.StructField("corr", T.DoubleType()),
            T.StructField("n", T.LongType()),
        ]
    )
    return frame.sparkSession.createDataFrame(out, schema)


def spearman_matrix(
    df: DataFrame, cols: Sequence[str], num_ranges: int = 64
) -> DataFrame:
    """Pairwise SPEARMAN rank correlations — the monotone-association
    screen that survives outliers and nonlinear-but-monotone feature
    relationships where Pearson misleads. ρ = Pearson over
    average-rank-transformed columns (scipy ``rankdata('average')``
    tie convention).

    Ranks are EXACT and global per column via the two-phase
    value-grain range rank (``features.rank_transform(method=
    'avg_rank')`` — mega-ties collapse to one row, no single-partition
    sort), then all p(p−1)/2 rank correlations aggregate in ONE
    partial-aggregable scan (``correlation_matrix``). NULL semantics:
    each column ranks its own non-NULL values; a pair's correlation
    then drops rows where either rank is NULL (pairwise deletion over
    GLOBAL ranks — documented, matches the oracle; on listwise-
    complete data this is exactly scipy's spearmanr).

    Output: ``col_a, col_b, rho, n`` per unordered pair.
    """
    from data_export_tool_spark.operators.features import _rank_lut

    cols = list(cols)
    if len(cols) < 2:
        raise ValueError(f"need >= 2 columns: {cols}")
    frame = df.select(*[F.col(c).cast("double").alias(c) for c in cols])
    # one value-grain LUT per column, each built from a SINGLE-column
    # projection of the base frame (the parquet scan prunes to that
    # column), attached to the base frame with p left joins. The old
    # form chained full-width rank_transform calls, so column i's
    # eager approx-quantile action re-executed columns 1..i−1's join
    # pipelines — O(p²) recomputation that dominated the matrix cost.
    ranked = frame
    for c in cols:
        lut = _rank_lut(
            frame.select(c).where(F.col(c).isNotNull()), c, num_ranges
        ).select(
            F.col("__v").alias(f"__v_{c}"),
            # avg/midrank: min_rank + (tie_size − 1)/2 (scipy 'average')
            (
                F.col("__r").cast("double")
                + (F.col("__cnt").cast("double") - 1.0) / 2.0
            ).alias(f"__sr_{c}"),
        )
        ranked = ranked.join(
            lut, ranked[c] == lut[f"__v_{c}"], "left"
        ).drop(f"__v_{c}")
    ranked = ranked.select(
        *[F.col(f"__sr_{c}").alias(c) for c in cols]
    )
    return correlation_matrix(ranked, cols).withColumnRenamed(
        "corr", "rho"
    )


def categorical_association(
    df: DataFrame, cols: Sequence[str]
) -> DataFrame:
    """Pairwise Cramér's V over categorical columns — the categorical
    sibling of the numeric correlation matrix (X87): which dimensions
    are redundant (V≈1: one determines the other — drop one before
    training) and which stratifications are independent (V≈0).

    V = sqrt(χ² / (n·(min(r,c)−1))) from each pair's contingency
    table. One partial-aggregable groupBy per pair; the only driver
    materialization is the alphabet²-bounded contingency cells (the
    cohen_kappa policy — categorical columns have bounded alphabets
    by definition; a high-cardinality id column does not belong in
    this matrix and the cell count makes that mistake visible).
    NULL values form their own category by contract ('∅') — NULL
    association is usually the signal being hunted.

    Output: one row per unordered pair (col_a < col_b by position):
    (col_a, col_b, n, chi2, cramers_v, n_cells).
    """
    import math

    if len(cols) < 2:
        raise ValueError("categorical_association needs >= 2 columns")
    spark = df.sparkSession
    out_rows = []
    for i in range(len(cols)):
        for j in range(i + 1, len(cols)):
            a, b = cols[i], cols[j]
            cells = (
                df.groupBy(
                    F.coalesce(F.col(a).cast("string"), F.lit("∅")).alias("__a"),
                    F.coalesce(F.col(b).cast("string"), F.lit("∅")).alias("__b"),
                )
                .agg(F.count(F.lit(1)).alias("__n"))
                .collect()
            )
            n = sum(r["__n"] for r in cells)
            ra: dict[str, int] = {}
            cb: dict[str, int] = {}
            for r in cells:
                ra[r["__a"]] = ra.get(r["__a"], 0) + r["__n"]
                cb[r["__b"]] = cb.get(r["__b"], 0) + r["__n"]
            obs = {(r["__a"], r["__b"]): r["__n"] for r in cells}
            chi2 = 0.0
            for av, an in ra.items():
                for bv, bn in cb.items():
                    e = an * bn / n
                    o = obs.get((av, bv), 0)
                    chi2 += (o - e) ** 2 / e
            k = min(len(ra), len(cb)) - 1
            v = math.sqrt(chi2 / (n * k)) if k > 0 and n > 0 else 0.0
            out_rows.append((a, b, n, chi2, v, len(cells)))
    return spark.createDataFrame(
        out_rows,
        "col_a string, col_b string, n long, chi2 double,"
        " cramers_v double, n_cells long",
    )


def first_significant_digit(col: Column) -> Column:
    """First significant decimal digit of ``|col|`` as a string in
    '1'..'9' — THE digit extraction shared by :func:`benford_audit`
    and ``streaming.events.benford_stream`` so the batch op and its
    twin can never diverge (ADVICE r7).

    Extraction: first [1-9] character of the double's canonical string
    rendering (Java's shortest-uniquely-round-tripping form, plain or
    scientific — '123.45' → 1, '9.99E-5' → 9). NO decimal rounding
    anywhere, which the old ``format_number(|x|, 10)`` form had:
    9.99999999999 rendered as '10.0000000000' (counted as digit 1
    instead of 9) and nonzero values < 5e-11 rounded to all zeros and
    vanished from n. NULL / 0 / non-finite → NULL (callers filter)."""
    v = F.abs(col.cast("double"))
    return F.when(
        v.isNotNull() & (v > 0) & ~F.isnan(v) & (v != float("inf")),
        F.regexp_extract(v.cast("string"), "[1-9]", 0),
    ).cast("string")


def benford_audit(
    df: DataFrame, cols: Sequence[str] | str, min_rows: int = 100
) -> DataFrame:
    """First-significant-digit distribution vs Benford's law — the
    classic fabricated-numbers screen (Benford 1938; Nigrini's audit
    practice): naturally-occurring multi-magnitude quantities put
    digit d first with probability log10(1 + 1/d); invented or
    constrained numbers don't. One row per audited column:
    ``(column, n, chi2, mad, conforms)`` plus the nine observed
    shares as ``p1..p9`` — MAD thresholded at Nigrini's 0.015
    (nonconformity) bound; χ² rides for the 8-dof test readers.

    First significant digit = first nonzero digit of |value| —
    magnitude-free (0.042 → 4), so no scaling pass is needed. Zeros
    and NULLs are excluded (no leading digit). One partial-aggregable
    groupBy per column over a 9-value key; the driver sees 9 cells
    per column. Columns with < ``min_rows`` usable values report
    ``conforms = NULL`` (too small to call — the honest answer,
    not a pass).
    """
    import math

    cs = [cols] if isinstance(cols, str) else list(cols)
    if not cs:
        raise ValueError("cols must name at least one column")
    spark = df.sparkSession
    out_rows = []
    expected = {d: math.log10(1 + 1 / d) for d in range(1, 10)}
    for c in cs:
        first = first_significant_digit(F.col(c))
        cells = {
            int(r["d"]): r["n"]
            for r in df.where(
                F.col(c).isNotNull() & (F.abs(F.col(c).cast("double")) > 0)
            )
            .select(first.alias("d"))
            .where(F.col("d").rlike("^[1-9]$"))
            .groupBy("d")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        }
        n = sum(cells.values())
        if n < min_rows:
            out_rows.append((c, n, None, None, None) + (None,) * 9)
            continue
        chi2 = 0.0
        mad = 0.0
        shares = []
        for d in range(1, 10):
            obs = cells.get(d, 0) / n
            exp = expected[d]
            chi2 += n * (obs - exp) ** 2 / exp
            mad += abs(obs - exp) / 9
            shares.append(round(obs, 6))
        out_rows.append(
            (c, n, round(chi2, 6), round(mad, 6), bool(mad <= 0.015))
            + tuple(shares)
        )
    from pyspark.sql.types import (
        BooleanType, DoubleType, LongType, StringType, StructField, StructType,
    )

    schema = StructType(
        [
            StructField("column", StringType()),
            StructField("n", LongType()),
            StructField("chi2", DoubleType()),
            StructField("mad", DoubleType()),
            StructField("conforms", BooleanType()),
        ]
        + [StructField(f"p{d}", DoubleType()) for d in range(1, 10)]
    )
    return spark.createDataFrame(out_rows, schema)
