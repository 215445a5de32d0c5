"""Embedding-table queries: similarity search (extended surface).

Brute-force cosine top-k is the exact baseline and SRP-LSH replays
bit-exactly in DuckDB (deterministic hyperplanes embedded as literals),
both value-oracle-checked; IVF is rows-only (its quantizer trains on a
Spark-side sample no external engine can reproduce) with recall vs
brute force asserted in tests/test_similarity.py.
All math is double-precision on both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_export_tool_spark.catalog import Catalog
from data_export_tool_spark.operators.similarity import (
    brute_force_topk,
    embedding_near_dup_pairs,
    ivf_topk,
    lsh_topk,
)
from data_export_tool_spark.queries import QuerySpec

_N_QUERIES = 5  # the first N vec_ids serve as the query batch
_K = 10
_DIM = 64


def _query_vectors(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = Catalog(spark, sf_dir).load("embeddings")
    return emb.filter(F.col("vec_id") < _N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )


# --------------------------------------------------------------------------
# v01 — exact cosine top-k (brute force baseline)
# --------------------------------------------------------------------------
def v01_embedding_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = Catalog(spark, sf_dir).load("embeddings")
    corpus = emb.filter(F.col("vec_id") >= _N_QUERIES)
    return brute_force_topk(corpus, _query_vectors(spark, sf_dir), k=_K).orderBy(
        "query_id", "rank"
    )


V01_ORACLE = f"""
WITH q AS (
  SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
  FROM embeddings WHERE vec_id < {_N_QUERIES}
),
c AS (
  SELECT vec_id AS neighbor_id, CAST(embedding AS DOUBLE[]) AS cv
  FROM embeddings WHERE vec_id >= {_N_QUERIES}
),
scored AS (
  SELECT query_id, neighbor_id,
         list_cosine_similarity(qv, cv) AS cos,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY list_cosine_similarity(qv, cv) DESC,
                                     neighbor_id ASC) AS rank
  FROM q, c
)
SELECT query_id, rank, neighbor_id, ROUND(cos, 6) AS cosine_sim
FROM scored WHERE rank <= {_K}
ORDER BY query_id, rank
"""


# --------------------------------------------------------------------------
# v02 — embedding-cosine near-duplicate pairs
# --------------------------------------------------------------------------
def v02_embedding_near_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = Catalog(spark, sf_dir).load("embeddings")
    return embedding_near_dup_pairs(emb, threshold=0.35).orderBy("id_a", "id_b")


V02_ORACLE = """
SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       ROUND(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                    CAST(b.embedding AS DOUBLE[])), 6) AS cosine_sim
FROM embeddings a
JOIN embeddings b ON a.vec_id < b.vec_id
WHERE list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                             CAST(b.embedding AS DOUBLE[])) >= 0.35
ORDER BY id_a, id_b
"""


# --------------------------------------------------------------------------
# v03 — SRP-LSH bucketed ANN top-k. The hyperplanes are deterministic
# (splitmix64 mixing, no RNG state — operators/similarity._hyperplane),
# so the DuckDB oracle regenerates the same planes as float literals
# and replays signature → 4-bit band join → exact-cosine rank. Recall
# vs brute force is additionally asserted in tests/test_similarity.py.
# --------------------------------------------------------------------------
def v03_embedding_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = Catalog(spark, sf_dir).load("embeddings")
    corpus = emb.filter(F.col("vec_id") >= _N_QUERIES)
    return lsh_topk(
        corpus, _query_vectors(spark, sf_dir), dim=_DIM, k=_K, n_planes=16, band_bits=4
    ).orderBy("query_id", "rank")


def _lsh_oracle(n_planes: int = 16, band_bits: int = 4, seed: int = 42) -> str:
    from data_export_tool_spark.operators.similarity import _hyperplane

    planes = [_hyperplane(seed + p, _DIM) for p in range(n_planes)]
    n_bands = n_planes // band_bits
    mask = (1 << band_bits) - 1

    def sig_expr(v: str) -> str:
        terms = " + ".join(
            f"(CASE WHEN list_dot_product({v}, "
            f"[{', '.join(repr(x) for x in pl)}]) >= 0 "
            f"THEN {1 << p} ELSE 0 END)"
            for p, pl in enumerate(planes)
        )
        return f"({terms})"

    bands = ", ".join(str(b) for b in range(n_bands))
    return f"""
WITH q AS (
  SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
  FROM embeddings WHERE vec_id < {_N_QUERIES}
),
c AS (
  SELECT vec_id AS neighbor_id, CAST(embedding AS DOUBLE[]) AS cv
  FROM embeddings WHERE vec_id >= {_N_QUERIES}
),
qs AS (SELECT query_id, qv, {sig_expr('qv')} AS sig FROM q),
cs AS (SELECT neighbor_id, cv, {sig_expr('cv')} AS sig FROM c),
qb AS (
  SELECT query_id, qv, b, (sig >> (b * {band_bits})) & {mask} AS band_key
  FROM qs CROSS JOIN (SELECT unnest([{bands}]) AS b) t
),
cb AS (
  SELECT neighbor_id, cv, b, (sig >> (b * {band_bits})) & {mask} AS band_key
  FROM cs CROSS JOIN (SELECT unnest([{bands}]) AS b) t
),
cand AS (
  SELECT DISTINCT query_id, neighbor_id, qv, cv
  FROM qb JOIN cb ON qb.b = cb.b AND qb.band_key = cb.band_key
),
scored AS (
  SELECT query_id, neighbor_id,
         list_cosine_similarity(qv, cv) AS cos,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY list_cosine_similarity(qv, cv) DESC,
                                     neighbor_id ASC) AS rank
  FROM cand
)
SELECT query_id, rank, neighbor_id, ROUND(cos, 6) AS cosine_sim
FROM scored WHERE rank <= {_K}
ORDER BY query_id, rank
"""


V03_ORACLE = _lsh_oracle()


# --------------------------------------------------------------------------
# v04 — IVF ANN top-k (k-means coarse quantizer; rows-only check)
# --------------------------------------------------------------------------
def v04_embedding_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = Catalog(spark, sf_dir).load("embeddings")
    corpus = emb.filter(F.col("vec_id") >= _N_QUERIES)
    return ivf_topk(
        corpus, _query_vectors(spark, sf_dir), k=_K, n_centroids=16, n_probe=4
    ).orderBy("query_id", "rank")


QUERIES = [
    QuerySpec("v01_embedding_topk", v01_embedding_topk, V01_ORACLE, "ann:brute-force"),
    QuerySpec("v02_embedding_near_dups", v02_embedding_near_dups, V02_ORACLE, "dedup:cosine"),
    QuerySpec("v03_embedding_lsh_topk", v03_embedding_lsh_topk, V03_ORACLE, "ann:srp-lsh"),
    QuerySpec("v04_embedding_ivf_topk", v04_embedding_ivf_topk, None, "ann:ivf"),
]
