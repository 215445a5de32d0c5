"""Benchmark decontamination: n-gram overlap between a training corpus
and an evaluation/benchmark set (extended large-scale surface).

The standard LLM-pipeline hygiene step: any training document sharing
too many word n-grams with a held-out benchmark is flagged (and usually
dropped) so the benchmark stays uncontaminated. Semantics follow the
widely-published recipe (exact n-gram collision, n around 8-13 for
natural text; configurable here): per training document, the fraction
of its DISTINCT n-grams that also occur anywhere in the eval set.

Scale design (100 TB training corpus, MB-GB eval set):

- The eval side is reduced to DISTINCT n-gram strings once — benchmark
  suites are tiny relative to the corpus, so this side is broadcast by
  default (``broadcast_eval=True``); flip it off to get a plain
  shuffle-on-ngram equi-join when the eval set is genuinely large.
- The training side explodes each document's distinct shingle array
  and inner-joins the eval n-grams; a single map-side-combining
  ``groupBy(doc_id).count()`` produces the matched counts. Documents
  with zero overlap never survive the inner join, so the final
  left join restores them with ``n_matched = 0`` — no per-document
  state, no skew beyond the n-gram key distribution itself (hot
  n-grams only multiply by the EVAL side's distinct set, which is 1
  per n-gram by construction).
- Nothing ever shuffles document bodies: after shingling, only
  (doc_id, ngram) pairs and small count rows move.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from data_export_tool_spark.operators.dedup import word_shingles


def eval_ngrams(
    eval_df: DataFrame, text_col: str = "text", n: int = 5
) -> DataFrame:
    """The eval set's distinct word n-grams — one ``ngram`` column.

    This is the small side of the contamination join; dedup happens
    here (single shuffle over the eval set only) so the train-side
    join multiplies each hot n-gram by exactly 1.
    """
    return (
        eval_df.select(
            F.explode(word_shingles(F.col(text_col), n)).alias("ngram")
        )
        .distinct()
    )


def contamination_scores(
    train_df: DataFrame,
    eval_df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 5,
    threshold: float = 0.2,
    broadcast_eval: bool = True,
    keep_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Per-training-document benchmark-overlap scores.

    Returns one row per training document:
    ``id_col``, ``n_ngrams`` (distinct n-grams in the doc),
    ``n_matched`` (of those, how many occur in the eval set),
    ``contamination`` (= matched/total, rounded to 6 dp), and
    ``contaminated`` (contamination >= threshold).

    ``decontaminate`` filters the corpus with these scores; exposing
    the scores (not just the verdict) is deliberate — threshold tuning
    is an offline analyst step at this scale, not a re-run of the join.
    ``keep_cols`` are additional training columns carried through
    (metadata like source/lang; never the text body).
    """
    ev = eval_ngrams(eval_df, text_col, n)
    if broadcast_eval:
        ev = F.broadcast(ev)

    keep = [F.col(c) for c in keep_cols]
    totals = train_df.select(
        F.col(id_col),
        *keep,
        word_shingles(F.col(text_col), n).alias("_shingles"),
    ).select(
        id_col, *keep_cols, F.size("_shingles").alias("n_ngrams"), "_shingles"
    )

    matched = (
        totals.select(id_col, F.explode("_shingles").alias("ngram"))
        .join(ev, "ngram")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_matched"))
    )

    contamination = F.round(
        F.col("n_matched") / F.greatest(F.col("n_ngrams"), F.lit(1)), 6
    )
    return (
        totals.drop("_shingles")
        .join(matched, id_col, "left")
        .withColumn("n_matched", F.coalesce(F.col("n_matched"), F.lit(0)))
        .withColumn("contamination", contamination)
        .withColumn("contaminated", F.col("contamination") >= F.lit(threshold))
    )


def decontaminate(
    train_df: DataFrame,
    eval_df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 5,
    threshold: float = 0.2,
    broadcast_eval: bool = True,
) -> DataFrame:
    """The training corpus with contaminated documents removed.

    Keeps the full training schema; drops rows whose distinct-n-gram
    overlap with the eval set is at or above ``threshold``.
    """
    flagged = contamination_scores(
        train_df, eval_df, id_col, text_col, n, threshold, broadcast_eval
    ).where(F.col("contaminated"))
    return train_df.join(
        flagged.select(id_col), id_col, "left_anti"
    )
