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

    # the per-doc constants (n_tokens, totals, dup3_frac) ride through
    # both aggregations as extra grouping keys — constant per doc_id,
    # so they add no groups, but they save a second scan of the corpus
    # and the doc_id join-back entirely: ONE scan, two shuffles, no join
    exploded = base.select(
        id_col,
        "n_tokens",
        F.size("_g2").alias("n2_total"),
        F.round(
            F.lit(1.0)
            - F.size(F.array_distinct("_g3"))
            / F.greatest(F.size("_g3"), F.lit(1)).cast("double"),
            6,
        ).alias("dup3_frac"),
        F.explode("_g2").alias("g2"),
    )

    doc_keys = [id_col, "n_tokens", "n2_total", "dup3_frac"]
    return (
        exploded.groupBy(*doc_keys, "g2")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy(*doc_keys)
        .agg(F.max("c").alias("top2_count"))
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
