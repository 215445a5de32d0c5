"""Re-identification risk audits: k-anonymity and l-diversity.

The reference is a health-facility data-export tool
(`/root/reference/export.py` ships patient-level line lists to CSV);
before such an export leaves the building, the standard disclosure
check is k-anonymity [Sweeney 2002]: every combination of
quasi-identifier values (region + birth year + sex, ...) must be shared
by at least k exported rows, else the rare combination re-identifies a
person. l-diversity [Machanavelli et al. 2007] strengthens it: each
such equivalence class must also contain at least l distinct values of
every sensitive attribute, else membership alone discloses the
sensitive value.

Shapes (all scale-safe, one key-hash exchange each):

- ``equivalence_classes``: one groupBy on the quasi columns — partial
  aggregation absorbs hot classes map-side; per-class ``countDistinct``
  of each sensitive column rides the same aggregate.
- ``k_anonymity_report``: driver-sized second aggregate over the
  class-grain frame (one row out).
- ``risky_classes``: the class-grain frame filtered to violations —
  the review list, already smallest-first.
- ``suppress_small_classes``: a left-semi join of the input against
  the compliant classes on the quasi key — the classic "suppress
  outlier cells" release step. The class frame is aggregated (≤ one
  row per class), so AQE sizes/broadcasts the join; rows never pass
  through a window.

NULL policy: GROUP BY treats NULL as a value (a class of its own —
matching DuckDB/ANSI, so the oracles replay 1:1); ``countDistinct``
ignores NULL sensitive values, so an all-NULL class has diversity 0
and always fails an l ≥ 1 check — the conservative reading.
Generalization (coarsening a column until classes merge) composes from
existing pieces: bin numerics with ``features.fit_quantile_bins`` /
``apply_quantile_bins`` and re-audit.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "equivalence_classes",
    "k_anonymity_report",
    "risky_classes",
    "suppress_small_classes",
]


def _cols(cols: Sequence[str] | str) -> list[str]:
    return [cols] if isinstance(cols, str) else list(cols)


def equivalence_classes(
    df: DataFrame,
    quasi_cols: Sequence[str] | str,
    sensitive_cols: Sequence[str] | str = (),
) -> DataFrame:
    """Class-grain frame: one row per distinct quasi-identifier
    combination with ``class_size`` and, per sensitive column, the
    distinct-value count ``distinct_<col>`` (its l-diversity)."""
    quasi = _cols(quasi_cols)
    if not quasi:
        raise ValueError("quasi_cols must name at least one column")
    aggs = [F.count(F.lit(1)).alias("class_size")]
    for s in _cols(sensitive_cols):
        aggs.append(F.countDistinct(F.col(s)).alias(f"distinct_{s}"))
    return df.groupBy(*quasi).agg(*aggs)


def k_anonymity_report(
    df: DataFrame,
    quasi_cols: Sequence[str] | str,
    k: int,
    sensitive_cols: Sequence[str] | str = (),
    l: int = 2,
) -> DataFrame:
    """One-row disclosure summary of a prospective export:
    ``n_rows``, ``n_classes``, ``min_class_size`` (the dataset's
    actual k-anonymity), ``classes_below_k`` / ``rows_below_k``
    (suppression cost of enforcing ``k``), and per sensitive column
    ``min_diversity_<col>`` + ``classes_below_l_<col>``.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1: {k}")
    if l < 1:
        raise ValueError(f"l must be >= 1: {l}")
    classes = equivalence_classes(df, quasi_cols, sensitive_cols)
    sz = F.col("class_size")
    aggs = [
        F.sum(sz).alias("n_rows"),
        F.count(F.lit(1)).alias("n_classes"),
        F.min(sz).alias("min_class_size"),
        F.sum(F.when(sz < k, 1).otherwise(0)).alias("classes_below_k"),
        F.sum(F.when(sz < k, sz).otherwise(0)).alias("rows_below_k"),
    ]
    for s in _cols(sensitive_cols):
        dv = F.col(f"distinct_{s}")
        aggs.append(F.min(dv).alias(f"min_diversity_{s}"))
        aggs.append(
            F.sum(F.when(dv < l, 1).otherwise(0)).alias(f"classes_below_l_{s}")
        )
    return classes.agg(*aggs)


def risky_classes(
    df: DataFrame,
    quasi_cols: Sequence[str] | str,
    k: int,
    sensitive_cols: Sequence[str] | str = (),
    l: int = 2,
) -> DataFrame:
    """The violation list: classes with ``class_size < k`` or any
    sensitive diversity < ``l``, smallest classes first — what a
    reviewer actually reads before deciding to generalize or
    suppress."""
    classes = equivalence_classes(df, quasi_cols, sensitive_cols)
    cond = F.col("class_size") < k
    for s in _cols(sensitive_cols):
        cond = cond | (F.col(f"distinct_{s}") < l)
    return classes.where(cond).orderBy("class_size", *_cols(quasi_cols))


def suppress_small_classes(
    df: DataFrame,
    quasi_cols: Sequence[str] | str,
    k: int,
    sensitive_cols: Sequence[str] | str = (),
    l: int = 2,
) -> DataFrame:
    """Release-ready subset: only rows whose quasi-identifier class
    satisfies both thresholds survive (cell suppression). Exactly the
    complement of ``risky_classes``' membership — the tests pin
    ``suppressed ∪ risky-class rows == input``."""
    classes = equivalence_classes(df, quasi_cols, sensitive_cols)
    cond = F.col("class_size") >= k
    for s in _cols(sensitive_cols):
        cond = cond & (F.col(f"distinct_{s}") >= l)
    keep = classes.where(cond).select(*_cols(quasi_cols))
    # NULL-safe key equality: NULL quasi values form real classes, and
    # a plain equi-join would drop their rows even when compliant
    join_cond = None
    for q in _cols(quasi_cols):
        c = df[q].eqNullSafe(keep[q])
        join_cond = c if join_cond is None else (join_cond & c)
    return df.join(keep, join_cond, "left_semi")
