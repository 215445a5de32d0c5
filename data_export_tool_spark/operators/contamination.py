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
- The training side explodes each document's distinct shingle array,
  LEFT joins the eval n-grams to pick up a hit marker, and a single
  map-side-combining aggregation counts n-grams + hits per document
  in one pass — no second corpus branch, no join-back, no
  per-document state, and no skew beyond the n-gram key distribution
  itself (hot n-grams only multiply by the EVAL side's distinct set,
  which is 1 per n-gram by construction).
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
        # a doc that normalizes to empty (null/whitespace/punct-only)
        # produces the single shingle "" — not an n-gram; without this
        # filter every empty train doc would "collide" with an empty
        # eval doc at contamination 1.0
        .filter(F.col("ngram") != "")
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

    Single pass over the corpus: each exploded training n-gram LEFT
    joins the (broadcast) eval set picking up a hit marker, and one
    map-side-combining aggregation counts rows + hits per document.
    Zero-overlap documents never leave the pipeline (their exploded
    rows survive the left join), so there is no second corpus branch
    and no join-back — the diamond-plan shape that would scan and
    shingle a 100 TB corpus twice.
    """
    ev = eval_ngrams(eval_df, text_col, n).withColumn("_hit", F.lit(1))
    if broadcast_eval:
        ev = F.broadcast(ev)

    # the shingle array is built exactly ONCE (only the explode
    # consumes it — a separate size() projection would get the whole
    # normalize/shingle expression inlined a second time by
    # CollapseProject); because shingles are distinct per document,
    # n_ngrams is simply the exploded row count per document
    exploded = train_df.select(
        F.col(id_col),
        *[F.col(c) for c in keep_cols],
        F.explode(word_shingles(F.col(text_col), n)).alias("ngram"),
    )

    scored = (
        exploded.join(ev, "ngram", "left")
        .groupBy(id_col, *keep_cols)
        .agg(
            F.count(F.lit(1)).cast("int").alias("n_ngrams"),
            F.coalesce(F.sum("_hit"), F.lit(0)).alias("n_matched"),
        )
    )

    contamination = F.round(
        F.col("n_matched") / F.greatest(F.col("n_ngrams"), F.lit(1)), 6
    )
    return scored.withColumn("contamination", contamination).withColumn(
        "contaminated", F.col("contamination") >= F.lit(threshold)
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
