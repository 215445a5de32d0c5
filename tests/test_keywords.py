"""RAKE keywords (operators/keywords.py): corpus-global replay on
real documents, classic single-doc example, conventions."""

from __future__ import annotations

import pytest

from data_export_tool_spark.operators.keywords import (
    RAKE_STOPWORDS,
    py_rake,
    py_rake_phrases,
    rake_keywords,
)


def _corpus_replay(docs, top_k, max_phrase_len=4, min_token_chars=1):
    """The operator's corpus-global variant replayed exactly."""
    per_doc_phrases = {
        i: py_rake_phrases(t, RAKE_STOPWORDS, max_phrase_len,
                           min_token_chars)
        for i, t in docs
    }
    freq: dict = {}
    deg: dict = {}
    for phrases in per_doc_phrases.values():
        for p in phrases:
            for w in p:
                freq[w] = freq.get(w, 0) + 1
                deg[w] = deg.get(w, 0) + len(p)
    out = {}
    for i, phrases in per_doc_phrases.items():
        scores: dict = {}
        for p in phrases:
            scores[" ".join(p)] = sum(deg[w] / freq[w] for w in p)
        ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))
        out[i] = [
            (r + 1, ph, round(sc, 9))
            for r, (ph, sc) in enumerate(ranked[:top_k])
        ]
    return out


def test_rake_classic_example():
    # the canonical RAKE abstract fragment: multiword technical
    # phrases outrank single words (single-doc local-stats form)
    text = (
        "Compatibility of systems of linear constraints over the set "
        "of natural numbers. Criteria of compatibility of a system "
        "of linear Diophantine equations are considered."
    )
    scores = py_rake(text)
    assert scores["linear diophantine equations"] > scores["criteria"]
    assert scores["natural numbers"] > scores["compatibility"]


def test_rake_matches_corpus_replay(spark, sf_dir):
    docs = [
        (r["doc_id"], r["text"])
        for r in spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", "text").limit(40).collect()
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got: dict = {}
    for r in rake_keywords(df, "doc_id", "text", top_k=5).collect():
        got.setdefault(r["doc_id"], []).append(
            (r["rank"], r["phrase"], round(r["score"], 9))
        )
    for k in got:
        got[k].sort()
    want = _corpus_replay(docs, top_k=5)
    want = {k: v for k, v in want.items() if v}
    assert got == want
    from tests.conftest import record_opcheck

    record_opcheck(
        "rake_keywords",
        sum(len(v) for v in want.values()),
        True,
        oracle="python-reference",
    )


def test_rake_conventions(spark):
    # stopwords break phrases; punctuation breaks segments; phrases
    # over max_phrase_len drop entirely
    df = spark.createDataFrame(
        [(1, "deep learning of the neural network. alpha beta gamma "
             "delta epsilon")],
        "doc_id long, text string",
    )
    got = {r["phrase"] for r in
           rake_keywords(df, "doc_id", "text", top_k=10,
                         max_phrase_len=4).collect()}
    assert "deep learning" in got
    assert "neural network" in got
    # the 5-token run exceeds max_phrase_len and is dropped
    assert not any("alpha" in p for p in got)
    with pytest.raises(ValueError, match="top_k"):
        rake_keywords(df, "doc_id", "text", top_k=0)
    with pytest.raises(ValueError, match="max_phrase_len"):
        rake_keywords(df, "doc_id", "text", max_phrase_len=0)
