"""Exact containment join (operators/dedup.py containment_join):
brute-force oracle parity (no false negatives — the lossless-pruning
claim), asymmetry laws, DuckDB cross-check."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_export_tool_spark.operators.dedup import (
    containment_join,
    containment_pairs,
)


def _py_shingle_set(text):
    # shingle_n=1 -> distinct lowercased word tokens (word_shingles
    # contract: split on non-alphanumerics, empties dropped)
    import re

    return {t for t in re.split(r"[^0-9a-z]+", text.lower()) if t}


def _brute(left_rows, right_rows, t):
    out = {}
    for la, ta in left_rows:
        a = _py_shingle_set(ta)
        if not a:
            continue
        for lb, tb in right_rows:
            b = _py_shingle_set(tb)
            if not b:
                continue
            c = len(a & b) / len(a)
            if c >= t:
                out[(la, lb)] = round(c, 6)
    return out


def test_containment_join_matches_bruteforce(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    # left = short snippets (first 8 words), right = the full corpus:
    # the quote-detection shape
    snippets = docs.select(
        (F.col("doc_id") + 100000).alias("doc_id"),
        F.concat_ws(
            " ", F.slice(F.split(F.col("text"), r"\s+"), 1, 8)
        ).alias("text"),
    ).limit(80)
    t = 0.8
    got = {
        (r["left_id"], r["right_id"]): r["containment"]
        for r in containment_join(snippets, docs, t).collect()
    }
    want = _brute(
        [(r["doc_id"], r["text"]) for r in snippets.collect()],
        [(r["doc_id"], r["text"]) for r in docs.collect()],
        t,
    )
    assert got == want
    assert len(want) >= 80  # every snippet finds its source document
    from tests.conftest import record_opcheck

    record_opcheck(
        "containment_join", len(want), True, oracle="brute-force",
        value=float(len(want)),
    )


def test_containment_is_asymmetric_where_jaccard_fails(spark):
    # a 3-word quote inside a 40-word doc: containment 1.0, jaccard
    # tiny -> only the directed containment finds it
    quote = "quick brown fox"
    page = (
        "the quick brown fox jumps over the lazy dog while many other "
        "words pad this page out to a length where jaccard similarity "
        "with the short quote becomes very small indeed so resemblance "
        "misses it completely"
    )
    df = spark.createDataFrame(
        [(1, quote), (2, page)], "doc_id long, text string"
    )
    got = {
        (r["left_id"], r["right_id"]): r["containment"]
        for r in containment_pairs(df, 0.9).collect()
    }
    assert got == {(1, 2): 1.0}  # quote ⊂ page, NOT page ⊂ quote
    from data_export_tool_spark.operators.dedup import set_similarity_join

    jac = set_similarity_join(df, 0.5).collect()
    assert jac == []  # resemblance at any reasonable t misses it


def test_containment_duckdb_cross_check(spark, sf_dir):
    import duckdb

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    ).limit(60)
    t = 0.3
    got = {
        (r["left_id"], r["right_id"]): r["containment"]
        for r in containment_pairs(docs, t).collect()
    }
    con = duckdb.connect()
    rows = con.sql(
        f"""
        WITH toks AS (
          SELECT doc_id, unnest(list_distinct(
            list_filter(
              string_split_regex(lower(text), '[^0-9a-z]+'),
              x -> length(x) > 0))) AS tok
          FROM read_parquet('{sf_dir}/documents.parquet')
          WHERE doc_id IN (SELECT doc_id FROM read_parquet(
            '{sf_dir}/documents.parquet') ORDER BY doc_id LIMIT 60)
        ), sizes AS (
          SELECT doc_id, COUNT(*) AS n FROM toks GROUP BY doc_id
        ), inter AS (
          SELECT a.doc_id AS ia, b.doc_id AS ib, COUNT(*) AS i
          FROM toks a JOIN toks b USING (tok)
          WHERE a.doc_id != b.doc_id
          GROUP BY 1, 2
        )
        SELECT ia, ib, ROUND(CAST(i AS DOUBLE) / s.n, 6) AS c
        FROM inter JOIN sizes s ON s.doc_id = ia
        WHERE CAST(i AS DOUBLE) / s.n >= {t}
        """
    ).fetchall()
    want = {(int(a), int(b)): c for a, b, c in rows}
    # the spark limit(60) and duckdb ORDER BY doc_id LIMIT 60 pick the
    # same docs only if limit is deterministic here; align by ids
    ids = {r["doc_id"] for r in docs.collect()}
    want = {k: v for k, v in want.items() if k[0] in ids and k[1] in ids}
    got = {k: v for k, v in got.items() if k[0] in ids and k[1] in ids}
    assert got == want
    from tests.conftest import record_opcheck

    record_opcheck(
        "containment_pairs_duckdb", len(want), True, oracle="duckdb",
    )


def test_containment_validation(spark):
    df = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    with pytest.raises(ValueError, match="threshold"):
        containment_join(df, df, 0.0)
