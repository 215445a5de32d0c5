"""Lexical relevance over the documents table: BM25 search and TF-IDF
keyword extraction.

A corpus engine needs a no-model retrieval tier next to the embedding
ANN: BM25 is the standard (Robertson-Spärck Jones; the exact formula
below is the Lucene/standard variant) and TF-IDF keywords are the
classic corpus-triage summary. Both are pure DataFrame algebra over a
shared scan-side tokenizer.

Scale shapes:

- ``bm25_search`` touches only the QUERY's terms: the token explode is
  filtered to the query vocabulary before any shuffle, so the exchange
  carries (doc, term) pairs for matching terms only — at 100 TB the
  shuffle is proportional to the posting lists of the query terms, not
  the corpus. Corpus stats (N, avg length) are one partial-aggregable
  pass. Per-term document frequencies fall out of the same (doc, term)
  aggregate; the per-term idf table is broadcast back. Final top-k is
  a TakeOrdered, no global sort.
- ``top_terms_per_doc`` aggregates the full (doc, term) matrix — the
  honest full-vocabulary pass (partial aggregation absorbs hot terms
  map-side) — then ranks within each document, a window whose
  partition is bounded by the document's own vocabulary (never
  corpus-scale).

Tokenization contract (shared, and replayed by the DuckDB oracles):
lowercase, split on non-alphanumeric runs, drop empties and tokens
shorter than ``min_len``.
"""

from __future__ import annotations

import math
import re
from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: the split regex — identical semantics in Java regex (Spark) and
#: DuckDB's string_split_regex
TOKEN_SPLIT_RE = r"[^a-z0-9]+"


def _tokens(text, min_len: int = 2):
    toks = F.split(F.lower(text), TOKEN_SPLIT_RE)
    return F.filter(toks, lambda t: F.length(t) >= min_len)


def tokenize_query(query: str | Sequence[str], min_len: int = 2) -> list[str]:
    """The same contract applied to the query string; deduplicated,
    order-preserving."""
    if isinstance(query, str):
        parts = re.split(TOKEN_SPLIT_RE, query.lower())
    else:
        parts = [p for q in query for p in re.split(TOKEN_SPLIT_RE, q.lower())]
    seen: dict[str, None] = {}
    for p in parts:
        if len(p) >= min_len:
            seen.setdefault(p, None)
    return list(seen)


def bm25_search(
    docs: DataFrame,
    query: str | Sequence[str],
    k: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = 1.2,
    b: float = 0.75,
    min_len: int = 2,
) -> DataFrame:
    """Top-``k`` documents for ``query`` by BM25. Output
    ``(id_col, score double, n_terms_matched int)``, score-desc then
    id-asc (deterministic). Documents matching no query term are not
    returned.

    idf uses the non-negative BM25+ form
    ``ln(1 + (N - df + 0.5) / (df + 0.5))``; tf saturation is the
    standard ``tf·(k1+1) / (tf + k1·(1 - b + b·len/avglen))``.
    """
    terms = tokenize_query(query, min_len)
    if not terms:
        raise ValueError(f"query has no usable terms: {query!r}")

    toks = docs.select(
        F.col(id_col),
        _tokens(F.col(text_col), min_len).alias("__toks"),
    ).where(F.col("__toks").isNotNull())
    # corpus stats: one partial-aggregable pass
    stats = toks.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.avg(F.size("__toks")).alias("avg_len"),
    ).first()
    n_docs, avg_len = stats["n_docs"], stats["avg_len"]
    if not n_docs:
        raise ValueError("empty corpus")

    # (doc, term, tf, doc_len) for QUERY terms only — the explode is
    # pre-filtered, so the exchange carries matching postings only
    matched = (
        toks.select(
            F.col(id_col),
            F.size("__toks").alias("__len"),
            F.explode(
                F.filter(
                    F.col("__toks"),
                    lambda t: t.isin(terms),
                )
            ).alias("__term"),
        )
        .groupBy(id_col, "__term")
        .agg(F.count(F.lit(1)).alias("__tf"), F.first("__len").alias("__len"))
    )
    # per-term document frequency falls out of the same aggregate
    dfreq = matched.groupBy("__term").agg(F.count(F.lit(1)).alias("__df"))
    idf = dfreq.withColumn(
        "__idf",
        F.log(
            F.lit(1.0)
            + (F.lit(float(n_docs)) - F.col("__df") + 0.5) / (F.col("__df") + 0.5)
        ),
    )
    scored = matched.join(F.broadcast(idf), "__term").withColumn(
        "__s",
        F.col("__idf")
        * (F.col("__tf") * (k1 + 1))
        / (
            F.col("__tf")
            + k1 * (1 - b + b * F.col("__len") / F.lit(float(avg_len)))
        ),
    )
    return (
        scored.groupBy(id_col)
        .agg(
            F.round(F.sum("__s"), 6).alias("score"),
            F.count(F.lit(1)).cast("int").alias("n_terms_matched"),
        )
        .orderBy(F.desc("score"), F.asc(id_col))
        .limit(k)
    )


def top_terms_per_doc(
    docs: DataFrame,
    k: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_len: int = 3,
    min_df: int = 1,
) -> DataFrame:
    """TF-IDF keyword extraction: the ``k`` highest-scoring terms per
    document. Output ``(id_col, term, tf int, score double, rank int)``
    with rank 1..k by score desc, term asc (deterministic ties).

    ``min_df`` drops corpus-hapax noise below the given document
    frequency. idf = ln((N+1)/(df+1)) + 1 (smoothed, always > 0), tf is
    the raw in-document count.
    """
    toks = docs.select(
        F.col(id_col),
        _tokens(F.col(text_col), min_len).alias("__toks"),
    ).where(F.col("__toks").isNotNull())
    n_docs = toks.count()
    if not n_docs:
        raise ValueError("empty corpus")
    tf = (
        toks.select(F.col(id_col), F.explode("__toks").alias("term"))
        .groupBy(id_col, "term")
        .agg(F.count(F.lit(1)).cast("int").alias("tf"))
    )
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("__df"))
    if min_df > 1:
        dfreq = dfreq.where(F.col("__df") >= min_df)
    idf = dfreq.withColumn(
        "__idf",
        F.log((F.lit(float(n_docs)) + 1.0) / (F.col("__df") + 1.0)) + 1.0,
    )
    from pyspark.sql import Window

    # the window partition is one document's distinct terms — bounded
    # by document length, never by corpus size
    w = Window.partitionBy(id_col).orderBy(
        F.desc("score"), F.asc("term")
    )
    return (
        tf.join(idf.select("term", "__idf"), "term")
        .withColumn("score", F.round(F.col("tf") * F.col("__idf"), 6))
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(id_col, "term", "tf", "score", "rank")
    )


def hybrid_search(
    docs: DataFrame,
    query: str,
    k: int = 10,
    k_each: int | None = None,
    dim: int = 64,
    rrf_k: int = 60,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Hybrid lexical+semantic retrieval with reciprocal-rank fusion
    (Cormack, Clarke & Buettcher 2009): fuse the BM25 top-``k_each``
    and the embedding-cosine top-``k_each`` (model-free hashed
    embeddings — swap in a model column by pre-computing it) as
    ``score(d) = Σ_lists 1/(rrf_k + rank_d)``, the dependency-free
    fusion every retrieval stack ships because it needs no score
    calibration between the lists.

    Output: ``(id_col, rrf_score, bm25_rank, ann_rank)`` —
    score-desc, ties by id — top ``k``. Both component lists carry
    their own deterministic tie-breaks, so the fused ranking is
    deterministic and an external replay of the RRF arithmetic over
    the two lists is exact. Cost: the two component searches (each
    already corpus-scale-shaped) plus a join of two ≤ ``k_each``-row
    frames — the fusion itself touches no corpus data; windows here
    rank k-sized frames, not data.
    """
    from pyspark.sql import Window

    from data_export_tool_spark.operators.features import (
        hashed_embedding,
        py_hashed_embedding,
    )
    from data_export_tool_spark.operators.similarity import brute_force_topk

    if k_each is None:
        k_each = max(k * 3, k)
    lex = bm25_search(docs, query, k=k_each, id_col=id_col, text_col=text_col)
    lex_ranked = lex.select(
        F.col(id_col),
        F.row_number()
        .over(Window.orderBy(F.desc("score"), F.asc(id_col)))
        .alias("bm25_rank"),
    )
    qv = py_hashed_embedding(query, dim=dim)
    if qv is None or all(x == 0.0 for x in qv):
        raise ValueError(f"query has no usable tokens: {query!r}")
    queries = docs.sparkSession.createDataFrame(
        [(0, qv)], f"query_id long, query_vec array<double>"
    )
    emb = hashed_embedding(docs, dim=dim, text_col=text_col).select(
        F.col(id_col), F.col("embedding")
    )
    sem = brute_force_topk(
        emb, queries, k=k_each, id_col=id_col, vec_col="embedding"
    )
    sem_ranked = sem.select(
        F.col("neighbor_id").alias(id_col), F.col("rank").alias("ann_rank")
    )
    fused = lex_ranked.join(sem_ranked, id_col, "full_outer")
    score = F.when(
        F.col("bm25_rank").isNotNull(),
        1.0 / (F.lit(rrf_k) + F.col("bm25_rank")),
    ).otherwise(0.0) + F.when(
        F.col("ann_rank").isNotNull(),
        1.0 / (F.lit(rrf_k) + F.col("ann_rank")),
    ).otherwise(0.0)
    return (
        fused.select(
            id_col,
            F.round(score, 9).alias("rrf_score"),
            "bm25_rank",
            "ann_rank",
        )
        .orderBy(F.desc("rrf_score"), F.asc(id_col))
        .limit(k)
    )


def py_mmr(cands: list[tuple], k: int, lam: float) -> list[tuple]:
    """Reference MMR greedy selection over ``(doc_id, rel,
    unit_vec)`` candidates — the exact arithmetic ``mmr_rerank``
    runs per query group. Returns ``[(doc_id, mmr_score)]`` in
    selection order."""
    import numpy as np

    remaining = list(range(len(cands)))
    selected: list[int] = []
    out = []
    vecs = np.array([c[2] for c in cands], dtype=float)
    rels = np.array([c[1] for c in cands], dtype=float)
    while remaining and len(selected) < k:
        best_i, best_v = None, None
        for i in remaining:
            if selected:
                pen = float(np.max(vecs[selected] @ vecs[i]))
            else:
                pen = 0.0
            v = lam * rels[i] - (1.0 - lam) * pen
            key = (v, cands[i][0])
            if best_v is None or v > best_v[0] or (
                v == best_v[0] and cands[i][0] < best_v[1]
            ):
                best_i, best_v = i, key
        selected.append(best_i)
        remaining.remove(best_i)
        out.append((cands[best_i][0], float(best_v[0])))
    return out


def mmr_rerank(
    candidates: DataFrame,
    query_col: str,
    id_col: str,
    score_col: str,
    vec_col: str,
    k: int = 10,
    lam: float = 0.7,
    max_candidates: int = 5000,
) -> DataFrame:
    """Maximal Marginal Relevance diversified re-ranking (Carbonell &
    Goldstein, SIGIR 1998): per query, greedily pick ``k`` results
    maximizing ``λ·relevance − (1−λ)·max_cosine_to_already_picked`` —
    the standard dedup-at-serve-time stage between retrieval and the
    user (or between retrieval and a RAG context window) that a plain
    top-k cannot express.

    Scale shape: MMR is inherently sequential IN k but independent
    ACROSS queries — exactly ``applyInPandas`` grain. Each query
    group is its retrieval shortlist (top-N from ``brute_force_topk``
    / ``ivf_topk`` / ``hybrid_search``), bounded by construction;
    ``max_candidates`` RAISES on an unbounded group (someone passed a
    corpus, not a shortlist). Candidate vectors L2-normalize once per
    group; each greedy round is one BLAS matrix-vector. Ties break by
    (value, doc id) — deterministic under retries.

    Output: ``query_col, id_col, mmr_rank (1..k), mmr_score``.

    Oracle: exact python greedy replay (tests/test_mmr.py →
    OPCHECK ``mmr_rerank``).
    """
    import numpy as np
    import pandas as pd

    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if not 0.0 <= lam <= 1.0:
        raise ValueError(f"lam must be in [0, 1], got {lam}")

    base = candidates.select(
        F.col(query_col).alias("__q"),
        F.col(id_col).alias("__id"),
        F.col(score_col).cast("double").alias("__s"),
        F.col(vec_col).cast("array<double>").alias("__v"),
    ).where(
        F.col("__id").isNotNull()
        & F.col("__s").isNotNull()
        & F.col("__v").isNotNull()
    )

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        if len(pdf) > max_candidates:
            raise ValueError(
                f"mmr_rerank group has {len(pdf)} candidates "
                f"(> max_candidates={max_candidates}); rerank a "
                "retrieval shortlist, not a corpus"
            )
        # deterministic candidate order regardless of partitioning
        pdf = pdf.sort_values("__id", kind="mergesort")
        vecs = np.array(pdf["__v"].tolist(), dtype=float)
        norms = np.linalg.norm(vecs, axis=1)
        norms[norms == 0.0] = 1.0
        vecs = vecs / norms[:, None]
        cands = list(
            zip(pdf["__id"].tolist(), pdf["__s"].tolist(), vecs)
        )
        picked = py_mmr(cands, k, lam)
        q = pdf["__q"].iloc[0]
        return pd.DataFrame(
            {
                "__q": [q] * len(picked),
                "__id": [p[0] for p in picked],
                "mmr_rank": range(1, len(picked) + 1),
                "mmr_score": [p[1] for p in picked],
            }
        )

    qt = dict(candidates.dtypes)
    out_schema = (
        f"__q {qt[query_col]}, __id {qt[id_col]}, "
        "mmr_rank int, mmr_score double"
    )
    return (
        base.groupBy("__q")
        .applyInPandas(fn, schema=out_schema)
        .withColumnRenamed("__q", query_col)
        .withColumnRenamed("__id", id_col)
    )
