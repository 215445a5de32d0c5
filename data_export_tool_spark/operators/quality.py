"""Repetition-based document quality filters (extended surface).

The published web-corpus quality recipes (Gopher/MassiveText-style
rules) flag documents dominated by internal repetition: a single
repeated bigram, or a high fraction of duplicated n-grams. Two
signals, both cheap and exactly reproducible by a SQL oracle:

- ``top2_frac``: occurrences of the document's most frequent word
  bigram over total bigram occurrences. Computed by exploding ALL
  bigrams (duplicates preserved) and two map-side-combining
  aggregations — the shuffle carries (doc_id, bigram) pairs then
  (doc_id) count rows, never document bodies.
- ``dup3_frac``: 1 − distinct/total word trigrams. Pure per-row
  column algebra (``array_distinct``/``size`` over the higher-order
  n-gram build) — zero shuffles.

At 100 TB both signals stay linear: the bigram aggregation is keyed on
(doc_id, bigram), which is near-uniform (doc_id dominates), so no
skew mitigation is needed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from data_export_tool_spark.functions.text import token_count, word_ngrams_all


def repetition_stats(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    top2_threshold: float = 0.1,
) -> DataFrame:
    """Per-document repetition metrics.

    Returns ``id_col``, ``n_tokens``, ``top2_count`` (occurrences of
    the modal bigram), ``top2_frac``, ``dup3_frac`` (both rounded to
    6 dp), and ``repetitive`` (modal bigram occurs more than once AND
    its share is at or above ``top2_threshold``).
    """
    base = df.select(
        F.col(id_col),
        token_count(F.col(text_col)).alias("n_tokens"),
        word_ngrams_all(F.col(text_col), 2).alias("_g2"),
        word_ngrams_all(F.col(text_col), 3).alias("_g3"),
    )

    per_doc = base.select(
        id_col,
        "n_tokens",
        F.size("_g2").alias("n2_total"),
        F.round(
            F.lit(1.0)
            - F.size(F.array_distinct("_g3"))
            / F.greatest(F.size("_g3"), F.lit(1)).cast("double"),
            6,
        ).alias("dup3_frac"),
        "_g2",
    )

    top2 = (
        per_doc.select(id_col, F.explode("_g2").alias("g2"))
        .groupBy(id_col, "g2")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy(id_col)
        .agg(F.max("c").alias("top2_count"))
    )

    return (
        per_doc.drop("_g2")
        .join(top2, id_col)
        .withColumn(
            "top2_frac",
            F.round(
                F.col("top2_count") / F.greatest(F.col("n2_total"), F.lit(1)), 6
            ),
        )
        .withColumn(
            "repetitive",
            (F.col("top2_count") > 1)
            & (F.col("top2_frac") >= F.lit(top2_threshold)),
        )
        .select(
            id_col,
            "n_tokens",
            "top2_count",
            "top2_frac",
            "dup3_frac",
            "repetitive",
        )
    )
