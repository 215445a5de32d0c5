"""Ranking-quality metrics: NDCG@k, MRR, MAP@k, hit-rate@k.

The evaluation counterpart of the retrieval/recommendation tiers
(ANN ``*_topk``, BM25/hybrid search, ALS ``als_recommend``): given a
ranked predictions frame and a relevance-labeled truth frame, score
each query and aggregate. Järvelin & Kekäläinen 2002 (DCG/NDCG) with
the standard log2 discount and the binary-or-graded gain
``rel`` (graded gains use gain = rel, the TREC convention — set
``exp_gain=True`` for 2^rel − 1).

Scale shape — everything is per-query bounded algebra:

- join predictions ⋈ truth on (query, item) — LEFT join so unjudged
  retrieved items score 0 gain (the standard pooling convention);
- per-query DCG: one map-side-combining groupBy over ≤ k rows/query
  (Σ gain/log2(rank+1));
- per-query IDCG: rank the query's OWN judged items by relevance
  (a per-query window over its judgment list — bounded by judgments
  per query, never the corpus) and take the top-k prefix sum;
- metric grain: one row per query, then one tiny global (or
  ``by``-grouped) mean row. No stage touches more than
  (queries × max(k, judgments)) rows — the evalmetrics bounded-frame
  policy.

The DuckDB oracle replays every formula verbatim (tests).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["ranking_metrics", "ranking_metrics_summary"]


def ranking_metrics(
    predictions: DataFrame,
    truth: DataFrame,
    k: int = 10,
    query_col: str = "query_id",
    item_col: str = "item_id",
    rank_col: str = "rank",
    rel_col: str = "rel",
    exp_gain: bool = False,
) -> DataFrame:
    """Per-query metric row: ``(query, n_retrieved, n_relevant,
    ndcg_at_k, mrr, map_at_k, hits_at_k, recall_at_k)``.

    ``predictions``: (query, item, rank) with rank 1-based dense per
    query (the contract every ``*_topk`` operator in this repo
    emits). ``truth``: (query, item, rel) with rel > 0 meaning
    relevant; graded rel feeds NDCG, binary thresholding (rel > 0)
    feeds MRR/MAP/hits/recall. Queries present only in ``truth`` get
    a zero-metric row (they were asked and nothing came back —
    dropping them would inflate every average).
    """
    if k < 1:
        raise ValueError(f"k must be >= 1: {k}")
    preds = predictions.select(
        F.col(query_col).alias("__q"),
        F.col(item_col).alias("__i"),
        F.col(rank_col).cast("int").alias("__rk"),
    ).where(F.col(rank_col) <= k)
    judged = truth.select(
        F.col(query_col).alias("__q"),
        F.col(item_col).alias("__i"),
        F.col(rel_col).cast("double").alias("__rel"),
    ).where(F.col(rel_col).isNotNull())

    gain = F.coalesce(F.col("__rel"), F.lit(0.0))
    if exp_gain:
        gain = F.pow(F.lit(2.0), gain) - 1.0
    hit = (F.coalesce(F.col("__rel"), F.lit(0.0)) > 0).cast("double")

    scored = preds.join(judged, ["__q", "__i"], "left").select(
        "__q",
        "__rk",
        (gain / F.log2(F.col("__rk") + 1)).alias("__dg"),
        hit.alias("__hit"),
        (F.col("__rk") * F.lit(1.0)).alias("__rkd"),
    )
    # precision@rank for MAP: cumulative hits up to each rank / rank,
    # summed over HIT positions only — a per-query window over ≤ k rows
    wq = Window.partitionBy("__q").orderBy("__rk")
    per_rank = scored.withColumn(
        "__cumhits", F.sum("__hit").over(wq.rowsBetween(Window.unboundedPreceding, 0))
    )
    per_query = per_rank.groupBy("__q").agg(
        F.count(F.lit(1)).alias("n_retrieved"),
        F.sum("__dg").alias("__dcg"),
        F.sum("__hit").alias("__hits"),
        F.max(
            F.when(F.col("__hit") > 0, 1.0 / F.col("__rkd"))
        ).alias("__rr"),
        F.sum(
            F.when(F.col("__hit") > 0, F.col("__cumhits") / F.col("__rkd"))
        ).alias("__ap_num"),
    )

    # ideal DCG: each query's own judged items, best-first, top-k
    wj = Window.partitionBy("__q").orderBy(F.desc("__rel"), F.asc("__i"))
    jgain = F.col("__rel")
    if exp_gain:
        jgain = F.pow(F.lit(2.0), jgain) - 1.0
    ideal = (
        judged.where(F.col("__rel") > 0)
        .withColumn("__irk", F.row_number().over(wj))
        .where(F.col("__irk") <= k)
        .groupBy("__q")
        .agg(
            F.sum(jgain / F.log2(F.col("__irk") + 1)).alias("__idcg"),
        )
    )
    n_rel = (
        judged.where(F.col("__rel") > 0)
        .groupBy("__q")
        .agg(F.count(F.lit(1)).alias("n_relevant"))
    )

    out = (
        n_rel.join(per_query, "__q", "full")
        .join(ideal, "__q", "left")
        .select(
            F.col("__q").alias(query_col),
            F.coalesce("n_retrieved", F.lit(0)).alias("n_retrieved"),
            F.coalesce("n_relevant", F.lit(0)).alias("n_relevant"),
            F.round(
                F.when(
                    F.coalesce("__idcg", F.lit(0.0)) > 0,
                    F.coalesce("__dcg", F.lit(0.0)) / F.col("__idcg"),
                ).otherwise(F.lit(0.0)),
                6,
            ).alias("ndcg_at_k"),
            F.round(F.coalesce("__rr", F.lit(0.0)), 6).alias("mrr"),
            F.round(
                F.when(
                    F.coalesce("n_relevant", F.lit(0)) > 0,
                    F.coalesce("__ap_num", F.lit(0.0))
                    / F.least(F.coalesce("n_relevant", F.lit(0)), F.lit(k)),
                ).otherwise(F.lit(0.0)),
                6,
            ).alias("map_at_k"),
            F.coalesce("__hits", F.lit(0.0)).cast("long").alias("hits_at_k"),
            F.round(
                F.when(
                    F.coalesce("n_relevant", F.lit(0)) > 0,
                    F.coalesce("__hits", F.lit(0.0)) / F.col("n_relevant"),
                ).otherwise(F.lit(0.0)),
                6,
            ).alias("recall_at_k"),
        )
    )
    return out


def ranking_metrics_summary(
    predictions: DataFrame,
    truth: DataFrame,
    k: int = 10,
    by: str | None = None,
    **kwargs,
) -> DataFrame:
    """Mean of every per-query metric — one row (or one per ``by``
    group, joined from the query grain; ``by`` must be a column of
    ``truth`` constant per query, e.g. a query segment)."""
    per_q = ranking_metrics(predictions, truth, k=k, **kwargs)
    query_col = kwargs.get("query_col", "query_id")
    aggs = [
        F.count(F.lit(1)).alias("n_queries"),
        F.round(F.avg("ndcg_at_k"), 6).alias("mean_ndcg_at_k"),
        F.round(F.avg("mrr"), 6).alias("mean_mrr"),
        F.round(F.avg("map_at_k"), 6).alias("mean_map_at_k"),
        F.round(F.avg("recall_at_k"), 6).alias("mean_recall_at_k"),
    ]
    if by is None:
        return per_q.agg(*aggs)
    seg = truth.select(F.col(query_col), F.col(by)).distinct()
    return per_q.join(seg, query_col).groupBy(by).agg(*aggs)
