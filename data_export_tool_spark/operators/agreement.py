"""Inter-annotator agreement — label-quality audits before training.

A supervised curation pipeline (quality classifier, RLHF preference
data, LLM-as-judge relabeling) is only as good as its labels; the
standard gate is chance-corrected agreement between raters:

- ``cohen_kappa`` (Cohen 1960) for exactly two raters in wide format
  (item, label_a, label_b): κ = (p_o − p_e)/(1 − p_e) with
  p_e = Σ_k p_a(k)·p_b(k).
- ``fleiss_kappa`` (Fleiss 1971, variable-raters generalization) for
  long format (item, rater, label): per-item agreement
  P_i = Σ_k n_ik(n_ik−1) / (n_i(n_i−1)), chance from pooled label
  marginals p_k; items with fewer than 2 ratings are excluded (one
  rating can neither agree nor disagree).

Scale shape: everything partial-aggregates. Cohen is ONE
(label_a, label_b) groupBy — the exchange carries ≤ |alphabet|² rows;
Fleiss is one (item, label) count, one item-grain rollup, and one
label-marginal aggregate. The only driver materialization is the
alphabet-bounded contingency/marginal rows (documented bounded
collect, same class as the k-means round aggregate). Output is a
1-row DataFrame so the metric composes with sinks/The catalog like
every other report.

Duplicate (item, rater) ratings collapse to the latest by contract?
No — this operator has no timestamp; duplicates are counted as given,
and the tests pin that callers dedup upstream (window_dedup) when the
source has revisions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["cohen_kappa", "fleiss_kappa"]


def cohen_kappa(df: DataFrame, rater_a: str, rater_b: str) -> DataFrame:
    """1-row frame: (n_items, po, pe, kappa). Rows where either label
    is NULL are excluded (an unlabeled item measures nothing)."""
    base = df.where(F.col(rater_a).isNotNull() & F.col(rater_b).isNotNull())
    cells = (
        base.groupBy(
            F.col(rater_a).cast("string").alias("__a"),
            F.col(rater_b).cast("string").alias("__b"),
        )
        .agg(F.count(F.lit(1)).alias("__n"))
        .collect()  # bounded: <= |alphabet|^2 rows
    )
    n = sum(r["__n"] for r in cells)
    if n == 0:
        raise ValueError("cohen_kappa: no doubly-labeled items")
    po = sum(r["__n"] for r in cells if r["__a"] == r["__b"]) / n
    pa: dict[str, float] = {}
    pb: dict[str, float] = {}
    for r in cells:
        pa[r["__a"]] = pa.get(r["__a"], 0.0) + r["__n"] / n
        pb[r["__b"]] = pb.get(r["__b"], 0.0) + r["__n"] / n
    pe = sum(pa[k] * pb.get(k, 0.0) for k in pa)
    kappa = 1.0 if pe == 1.0 else (po - pe) / (1.0 - pe)
    spark = df.sparkSession
    return spark.createDataFrame(
        [(int(n), float(po), float(pe), float(kappa))],
        "n_items long, po double, pe double, kappa double",
    )


def fleiss_kappa(df: DataFrame, item_col: str, label_col: str) -> DataFrame:
    """1-row frame: (n_items, n_ratings, p_bar, pe, kappa) over long
    (item, label) ratings; NULL item/label rows excluded, items with
    a single rating excluded."""
    base = df.where(F.col(item_col).isNotNull() & F.col(label_col).isNotNull())
    nik = base.groupBy(
        F.col(item_col).alias("__i"), F.col(label_col).cast("string").alias("__k")
    ).agg(F.count(F.lit(1)).alias("__nik"))
    per_item = nik.groupBy("__i").agg(
        F.sum("__nik").alias("__ni"),
        F.sum(F.col("__nik") * (F.col("__nik") - 1)).alias("__agree"),
    ).where(F.col("__ni") >= 2)
    stats = per_item.agg(
        F.count(F.lit(1)).alias("n_items"),
        F.sum("__ni").alias("n_ratings"),
        F.avg(F.col("__agree") / (F.col("__ni") * (F.col("__ni") - 1))).alias("p_bar"),
    ).collect()[0]
    if not stats["n_items"]:
        raise ValueError("fleiss_kappa: no items with >= 2 ratings")
    # pooled marginals restricted to the SAME multi-rated items
    marg = (
        nik.join(per_item.select("__i"), "__i")
        .groupBy("__k")
        .agg(F.sum("__nik").alias("__nk"))
        .collect()  # bounded: <= |alphabet| rows
    )
    total = sum(r["__nk"] for r in marg)
    pe = sum((r["__nk"] / total) ** 2 for r in marg)
    p_bar = float(stats["p_bar"])
    kappa = 1.0 if pe == 1.0 else (p_bar - pe) / (1.0 - pe)
    spark = df.sparkSession
    return spark.createDataFrame(
        [(int(stats["n_items"]), int(stats["n_ratings"]), p_bar, float(pe), float(kappa))],
        "n_items long, n_ratings long, p_bar double, pe double, kappa double",
    )
