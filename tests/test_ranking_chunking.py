"""BM25 search / TF-IDF keywords (operators/ranking.py), bloom-pruned
decontamination (operators/contamination.py), and RAG chunking
(operators/chunking.py) — each against a DuckDB replay of the same
formula over the same parquet, or an exact-equality twin."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from tests.conftest import record_opcheck
from data_export_tool_spark.operators.chunking import chunk_documents
from data_export_tool_spark.operators.ranking import (
    TOKEN_SPLIT_RE,
    bm25_search,
    tokenize_query,
    top_terms_per_doc,
)


# ---------------------------------------------------------------------------
# BM25 / TF-IDF
# ---------------------------------------------------------------------------


def test_tokenize_query_contract():
    assert tokenize_query("The Quick, quick brown-fox!") == [
        "the", "quick", "brown", "fox",
    ]
    assert tokenize_query(["a", "big DOG"]) == ["big", "dog"]
    with pytest.raises(ValueError):
        bm25_search(None, "a !")  # no usable terms (min_len=2)


def test_bm25_matches_duckdb(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    query = "data quality model training"
    got = [
        (r["doc_id"], r["score"], r["n_terms_matched"])
        for r in bm25_search(docs, query, k=15).collect()
    ]
    terms = tokenize_query(query)
    terms_sql = ", ".join(f"'{t}'" for t in terms)
    want = duckdb.sql(
        f"""
    WITH toks AS (
      SELECT doc_id,
             list_filter(string_split_regex(lower(text), '{TOKEN_SPLIT_RE}'),
                         t -> length(t) >= 2) AS tk
      FROM read_parquet('{sf_dir}/documents.parquet')
      WHERE text IS NOT NULL
    ),
    stats AS (SELECT count(*) AS n_docs, avg(len(tk)) AS avg_len FROM toks),
    m AS (
      SELECT doc_id, len(tk) AS dl, u.t AS term
      FROM toks, unnest(tk) AS u(t)
      WHERE u.t IN ({terms_sql})
    ),
    tf AS (SELECT doc_id, term, count(*) AS tf, any_value(dl) AS dl
           FROM m GROUP BY 1, 2),
    df AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
    scored AS (
      SELECT tf.doc_id,
             sum(ln(1.0 + (s.n_docs - df.df + 0.5) / (df.df + 0.5))
                 * (tf.tf * 2.2)
                 / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * tf.dl / s.avg_len))
             ) AS score,
             count(*) AS nt
      FROM tf JOIN df USING (term) CROSS JOIN stats s
      GROUP BY 1
    )
    SELECT doc_id, round(score, 6) AS score, CAST(nt AS INT) AS nt
    FROM scored ORDER BY round(score, 6) DESC, doc_id LIMIT 15
    """
    ).fetchall()
    want = [(d, float(s), int(nt)) for d, s, nt in want]
    record_opcheck("bm25_search", len(want), got == want)
    assert got == want


def test_bm25_plan_prunes_before_shuffle(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = bm25_search(docs, "training data", k=5)
    plan = out._jdf.queryExecution().executedPlan().toString()
    # the final top-k must be a TakeOrdered, not a global sort
    assert "TakeOrderedAndProject" in plan
    # the idf side joins broadcast — no shuffle of the postings for it
    assert "BroadcastHashJoin" in plan


def test_top_terms_per_doc_matches_duckdb(spark):
    rows = [
        (1, "spark spark spark cluster cluster engine"),
        (2, "engine engine cluster tuning"),
        (3, "unrelated words entirely here"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = [
        (r["doc_id"], r["term"], r["tf"], r["score"], r["rank"])
        for r in top_terms_per_doc(docs, k=2, min_len=3)
        .orderBy("doc_id", "rank")
        .collect()
    ]
    want = duckdb.sql(
        f"""
    WITH toks AS (
      SELECT doc_id,
             list_filter(string_split_regex(lower(text), '{TOKEN_SPLIT_RE}'),
                         t -> length(t) >= 3) AS tk
      FROM (VALUES (1, 'spark spark spark cluster cluster engine'),
                   (2, 'engine engine cluster tuning'),
                   (3, 'unrelated words entirely here')) v(doc_id, text)
    ),
    tf AS (SELECT doc_id, u.t AS term, CAST(count(*) AS INT) AS tf
           FROM toks, unnest(tk) AS u(t) GROUP BY 1, 2),
    dfq AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
    n AS (SELECT count(*) AS n_docs FROM toks),
    s AS (
      SELECT tf.doc_id, tf.term, tf.tf,
             round(tf.tf * (ln((n.n_docs + 1.0) / (dfq.df + 1.0)) + 1.0), 6)
               AS score
      FROM tf JOIN dfq USING (term) CROSS JOIN n
    ),
    r AS (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
                                   ORDER BY score DESC, term) AS rank
      FROM s
    )
    SELECT doc_id, term, tf, score, CAST(rank AS INT) AS rank
    FROM r WHERE rank <= 2 ORDER BY doc_id, rank
    """
    ).fetchall()
    want = [(d, t, int(tf), float(s), int(rk)) for d, t, tf, s, rk in want]
    record_opcheck("top_terms_per_doc", len(want), got == want)
    assert got == want


# ---------------------------------------------------------------------------
# Bloom-pruned decontamination
# ---------------------------------------------------------------------------


def test_bloom_scores_equal_exact_scores(spark, sf_dir):
    """The bloom path must produce EXACTLY the broadcast path's
    output (no false negatives; candidates exactly verified)."""
    from data_export_tool_spark.operators.contamination import (
        contamination_scores,
        contamination_scores_bloom,
    )

    train = spark.read.parquet(f"{sf_dir}/documents.parquet")
    ev = train.where(F.col("doc_id") % 17 == 3).select(
        F.col("text").alias("text")
    )
    exact = {
        r["doc_id"]: (r["n_ngrams"], r["n_matched"], r["contamination"], r["contaminated"])
        for r in contamination_scores(train, ev, n=3).collect()
    }
    bloom = {
        r["doc_id"]: (r["n_ngrams"], r["n_matched"], r["contamination"], r["contaminated"])
        for r in contamination_scores_bloom(train, ev, n=3).collect()
    }
    # the exploded form drops NULL-text docs; the size-projection form
    # keeps them with their (empty-shingle) count — align on shared ids
    shared = set(exact) & set(bloom)
    ok = bool(shared) and all(exact[i] == bloom[i] for i in shared)
    record_opcheck(
        "contamination_bloom", len(shared), ok, oracle="exact-twin"
    )
    assert ok
    # and some contamination actually exists in this construction
    assert any(v[3] for v in exact.values())


def test_bloom_plan_filters_scan_side(spark, sf_dir):
    from data_export_tool_spark.operators.contamination import (
        contamination_scores_bloom,
        eval_ngram_bloom,
    )

    train = spark.read.parquet(f"{sf_dir}/documents.parquet")
    ev = train.limit(20).select("text")
    bf, n_items = eval_ngram_bloom(ev, n=3)
    assert bf is not None and n_items > 0
    n_bits, n_hashes, words = bf
    assert n_bits % 64 == 0 and n_hashes >= 1 and len(words) == n_bits // 64
    out = contamination_scores_bloom(train, ev, n=3, eval_bloom=bf)
    plan = out._jdf.queryExecution().executedPlan().toString()
    # the Arrow-batched bloom probe sits below the join as a filter
    assert "ArrowEvalPython" in plan


def test_bloom_empty_eval_set(spark):
    from data_export_tool_spark.operators.contamination import (
        contamination_scores_bloom,
    )

    train = spark.createDataFrame(
        [(1, "some words here for the corpus body")],
        "doc_id long, text string",
    )
    ev = spark.createDataFrame([], "text string")
    rows = contamination_scores_bloom(train, ev, n=3).collect()
    assert len(rows) == 1
    assert rows[0]["n_matched"] == 0 and not rows[0]["contaminated"]


# ---------------------------------------------------------------------------
# Chunking
# ---------------------------------------------------------------------------


def test_chunk_documents_matches_duckdb(spark, sf_dir):
    got = [
        (r["doc_id"], r["chunk_id"], r["start_token"], r["n_tokens"], r["chunk_text"])
        for r in chunk_documents(
            spark.read.parquet(f"{sf_dir}/documents.parquet"),
            chunk_tokens=40,
            overlap=8,
        )
        .orderBy("doc_id", "chunk_id")
        .collect()
    ]
    want = duckdb.sql(
        f"""
    WITH toks AS (
      SELECT doc_id, string_split_regex(trim(text), '\\s+') AS tk
      FROM read_parquet('{sf_dir}/documents.parquet')
      WHERE text IS NOT NULL AND trim(text) != ''
    ),
    starts AS (
      SELECT doc_id, tk,
             unnest(generate_series(1, greatest(len(tk) - 8, 1), 32)) AS st
      FROM toks
    )
    SELECT doc_id,
           CAST(ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY st) - 1 AS INT)
             AS chunk_id,
           CAST(st AS INT) AS start_token,
           CAST(len(tk[st:st+39]) AS INT) AS n_tokens,
           array_to_string(tk[st:st+39], ' ') AS chunk_text
    FROM starts ORDER BY doc_id, chunk_id
    """
    ).fetchall()
    want = [(d, int(c), int(s), int(n), t) for d, c, s, n, t in want]
    record_opcheck("chunk_documents", len(want), got == want)
    assert got == want


def test_chunk_documents_overlap_invariants(spark):
    text = " ".join(f"w{i}" for i in range(100))
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    rows = (
        chunk_documents(df, chunk_tokens=30, overlap=10)
        .orderBy("chunk_id")
        .collect()
    )
    # starts every 20 tokens; full coverage; 10-token overlap
    assert [r["start_token"] for r in rows] == [1, 21, 41, 61, 81]
    assert [r["n_tokens"] for r in rows] == [30, 30, 30, 30, 20]
    a, b = rows[0]["chunk_text"].split(), rows[1]["chunk_text"].split()
    assert a[-10:] == b[:10]
    joined = []
    for r in rows:
        toks = r["chunk_text"].split()
        joined.extend(toks if not joined else toks[10:])
    assert joined == text.split()


def test_chunk_documents_no_shuffle(spark, sf_dir):
    out = chunk_documents(spark.read.parquet(f"{sf_dir}/documents.parquet"))
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "Generate" in plan  # the posexplode


def test_chunk_documents_validation(spark):
    df = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    with pytest.raises(ValueError):
        chunk_documents(df, chunk_tokens=0)
    with pytest.raises(ValueError):
        chunk_documents(df, chunk_tokens=10, overlap=10)
    # short/singleton docs produce exactly one chunk
    rows = chunk_documents(df, chunk_tokens=10, overlap=2).collect()
    assert len(rows) == 1 and rows[0]["chunk_text"] == "a b"


def test_hybrid_search_rrf_replay(spark, sf_dir):
    """RRF fusion must exactly replay from the two (independently
    oracle-checked) component lists, and a document ranked by both
    lists must outscore one ranked by a single list at equal rank."""
    from tests.conftest import record_opcheck
    from data_export_tool_spark.operators.ranking import (
        bm25_search,
        hybrid_search,
    )
    from data_export_tool_spark.operators.features import (
        hashed_embedding,
        py_hashed_embedding,
    )
    from data_export_tool_spark.operators.similarity import brute_force_topk

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    query, k, k_each, dim, rrf_k = "data quality model training", 10, 30, 64, 60
    got = hybrid_search(
        docs, query, k=k, k_each=k_each, dim=dim, rrf_k=rrf_k
    ).collect()

    lex = sorted(
        [(r["doc_id"], r["score"]) for r in bm25_search(docs, query, k=k_each).collect()],
        key=lambda t: (-t[1], t[0]),
    )
    bm25_rank = {d: i + 1 for i, (d, _) in enumerate(lex)}
    qv = py_hashed_embedding(query, dim=dim)
    queries = spark.createDataFrame([(0, qv)], "query_id long, query_vec array<double>")
    sem = brute_force_topk(
        hashed_embedding(docs, dim=dim).select("doc_id", "embedding"),
        queries, k=k_each, id_col="doc_id",
    ).collect()
    ann_rank = {r["neighbor_id"]: r["rank"] for r in sem}

    fused = {}
    for d in set(bm25_rank) | set(ann_rank):
        s = 0.0
        if d in bm25_rank:
            s += 1.0 / (rrf_k + bm25_rank[d])
        if d in ann_rank:
            s += 1.0 / (rrf_k + ann_rank[d])
        fused[d] = round(s, 9)
    want = sorted(fused.items(), key=lambda t: (-t[1], t[0]))[:k]

    ok = [(r["doc_id"], r["rrf_score"]) for r in got] == want
    for r in got:  # rank columns echo the component lists exactly
        ok = ok and r["bm25_rank"] == bm25_rank.get(r["doc_id"])
        ok = ok and r["ann_rank"] == ann_rank.get(r["doc_id"])
    record_opcheck(
        "hybrid_search_rrf", len(got), ok, oracle="python-reference"
    )
    assert ok


def test_hybrid_search_validation(spark, sf_dir):
    import pytest as _pytest

    from data_export_tool_spark.operators.ranking import hybrid_search

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(5)
    with _pytest.raises(ValueError):
        hybrid_search(docs, "!!! ???")  # no usable tokens
