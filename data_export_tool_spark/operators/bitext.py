"""Bitext mining: margin-scored cross-lingual sentence alignment.

Parallel-corpus extraction from comparable corpora (the
LASER/CCMatrix recipe — Artetxe & Schwenk 2019, "Margin-based
Parallel Corpus Mining with Multilingual Sentence Embeddings"): raw
cosine between multilingual sentence embeddings is a poor alignment
score because some sentences are "hubs" (close to everything), so the
criterion is the MARGIN — the candidate cosine RATIOED against the
average of each side's k-nearest cosines:

    margin(x, y) = cos(x, y) / ((avgk_src(x) + avgk_tgt(y)) / 2)

A pair scores high only when the two sentences are much closer to
each other than either is to its general neighborhood. Pairs are kept
when y is x's FORWARD BEST neighbor and margin ≥ threshold;
``mutual=True`` additionally requires x to be y's best (the
highest-precision preset).

Scale shape: two exact top-k passes (``brute_force_topk`` both
directions — broadcast the query side, corpus never shuffles; swap in
the IVF/LSH tiers upstream for corpora where neither side
broadcasts), two per-id average aggregations (k-bounded), one
candidate join carrying only (src, tgt, cos) scalars. No vectors move
after the top-k passes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from data_export_tool_spark.operators.similarity import brute_force_topk


def bitext_margin_pairs(
    src: DataFrame,
    tgt: DataFrame,
    k: int = 4,
    threshold: float = 1.05,
    mutual: bool = False,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Aligned pairs ``(src_id, tgt_id, cosine_sim, margin)`` — one row
    per source sentence whose forward-best target clears the margin
    (``mutual=True``: and is reciprocally best). ``k`` is the
    neighborhood size of the margin denominator (k = 4 in CCMatrix).
    """
    if k < 1:
        raise ValueError(f"k must be >= 1: {k}")
    if not threshold > 0:
        raise ValueError(f"threshold must be > 0: {threshold}")
    sq = src.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("query_vec")
    )
    tq = tgt.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("query_vec")
    )
    fwd = brute_force_topk(tgt, sq, k=k, id_col=id_col, vec_col=vec_col).select(
        F.col("query_id").alias("src_id"),
        F.col("neighbor_id").alias("tgt_id"),
        F.col("cosine_sim"),
        F.col("rank").alias("fwd_rank"),
    )
    bwd = brute_force_topk(src, tq, k=k, id_col=id_col, vec_col=vec_col).select(
        F.col("query_id").alias("tgt_id"),
        F.col("neighbor_id").alias("src_id"),
        F.col("cosine_sim").alias("bwd_cos"),
        F.col("rank").alias("bwd_rank"),
    )
    avg_src = fwd.groupBy("src_id").agg(F.avg("cosine_sim").alias("__as"))
    avg_tgt = bwd.groupBy("tgt_id").agg(F.avg("bwd_cos").alias("__at"))
    best = fwd.where(F.col("fwd_rank") == 1)
    if mutual:
        best = best.join(
            bwd.where(F.col("bwd_rank") == 1).select("src_id", "tgt_id"),
            ["src_id", "tgt_id"],
            "left_semi",
        )
    out = (
        best.join(avg_src, "src_id")
        .join(avg_tgt, "tgt_id")
        .select(
            "src_id",
            "tgt_id",
            F.round("cosine_sim", 9).alias("cosine_sim"),
            F.round(
                F.col("cosine_sim")
                / ((F.col("__as") + F.col("__at")) / 2),
                9,
            ).alias("margin"),
        )
        .where(F.col("margin") >= threshold)
    )
    return out
