"""Interpolated Kneser–Ney bigram LM (operators/kn_lm.py): exact
python replay, the Σ P(w|v)=1 normalization law, and the
word-order-sensitivity law a unigram LM cannot satisfy."""

from __future__ import annotations

import math
import re

import pytest
from pyspark.sql import functions as F

from data_export_tool_spark.operators.kn_lm import (
    BOS,
    EOS,
    kn_bigram_score,
    kn_bigram_train,
    py_kn_logprob,
)
from data_export_tool_spark.operators.ranking import TOKEN_SPLIT_RE

_SPLIT = re.compile(TOKEN_SPLIT_RE)


def _tok(text):
    return [BOS] + [t for t in _SPLIT.split(text.lower()) if t] + [EOS]


def _py_train(texts, discount=0.75):
    bigrams = {}
    for t in texts:
        toks = _tok(t)
        for v, w in zip(toks, toks[1:]):
            bigrams[(v, w)] = bigrams.get((v, w), 0) + 1
    contexts = {}
    n_prev = {}
    for (v, w), c in bigrams.items():
        ct, nf = contexts.get(v, (0, 0))
        contexts[v] = (ct + c, nf + 1)
        n_prev[w] = n_prev.get(w, 0) + 1
    n_types = len(bigrams)
    p_cont = {w: n / n_types for w, n in n_prev.items()}
    return bigrams, contexts, p_cont, n_types


def test_kn_score_matches_python_replay(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    model = kn_bigram_train(docs, "text")
    got = {
        r["doc_id"]: r
        for r in kn_bigram_score(docs, model, "text", "doc_id").collect()
    }
    rows = [(r["doc_id"], r["text"]) for r in docs.collect()]
    bigrams, contexts, p_cont, n_types = _py_train([t for _, t in rows])
    assert model["n_bigram_types"] == n_types
    for doc_id, text in rows:
        toks = _tok(text)
        lps = [
            py_kn_logprob(v, w, bigrams, contexts, p_cont, n_types, 0.75)
            for v, w in zip(toks, toks[1:])
        ]
        g = got[doc_id]
        assert g["n_bigrams"] == len(lps)
        avg = sum(lps) / len(lps)
        assert g["avg_logprob_bits"] == pytest.approx(avg, rel=1e-9)
        assert g["perplexity"] == pytest.approx(2.0 ** -avg, rel=1e-9)
    from tests.conftest import record_opcheck

    record_opcheck(
        "kn_bigram_score", len(rows), True, oracle="python-reference",
        value=sum(got[d]["perplexity"] for d, _ in rows) / len(rows),
    )


def test_kn_probabilities_sum_to_one_per_seen_context(spark):
    texts = [
        "the cat sat on the mat",
        "the dog sat on the log",
        "a cat and a dog",
    ]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    model = kn_bigram_train(docs, "text")
    bigrams, contexts, p_cont, n_types = _py_train(texts)
    vocab = sorted({w for _, w in bigrams} | {w for w, _ in bigrams} - {BOS})
    # the normalization law: over the seen vocabulary, every seen
    # context's conditional distribution sums to exactly 1
    for v in contexts:
        total = sum(
            2.0
            ** py_kn_logprob(v, w, bigrams, contexts, p_cont, n_types, 0.75)
            for w in vocab
        )
        assert total == pytest.approx(1.0, abs=1e-9), v
    # continuation beats frequency: "francisco"-style word — frequent
    # but single-context — gets lower P_cont than a versatile word
    fr_texts = ["san francisco"] * 8 + ["the cat", "the dog", "a cat", "a dog"]
    _, _, pc2, _ = _py_train(fr_texts)
    assert pc2["francisco"] < pc2["cat"]  # 1 context vs 2 contexts


def test_kn_word_order_sensitivity(spark):
    # train on coherent text; score a coherent vs a shuffled doc with
    # IDENTICAL unigram counts -> only a bigram model separates them
    train_texts = [
        "the quick brown fox jumps over the lazy dog",
        "the quick brown cat sleeps near the lazy dog",
        "a quick brown fox runs past the lazy cat",
    ] * 3
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(train_texts)], "doc_id long, text string"
    )
    model = kn_bigram_train(docs, "text")
    test_docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "dog the over quick jumps fox lazy brown the"),
        ],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: r["perplexity"]
        for r in kn_bigram_score(test_docs, model, "text", "doc_id").collect()
    }
    assert got[1] * 3 < got[2]  # scrambled word order >=3x perplexity
    from tests.conftest import record_opcheck

    record_opcheck(
        "kn_order_sensitivity", 2, True, oracle="planted-truth",
        value=got[2] / got[1], floor=3.0,
    )


def test_kn_oov_and_empty_contracts(spark):
    docs = spark.createDataFrame(
        [(0, "alpha beta gamma")], "doc_id long, text string"
    )
    model = kn_bigram_train(docs, "text")
    # wholly OOV doc: every pair falls to continuation/epsilon, finite
    oov = spark.createDataFrame([(9, "zeta eta")], "doc_id long, text string")
    r = kn_bigram_score(oov, model, "text", "doc_id").first()
    assert r["n_bigrams"] == 3 and math.isfinite(r["avg_logprob_bits"])
    # empty doc: the single <s> -> </s> transition still scores
    empty = spark.createDataFrame([(10, "")], "doc_id long, text string")
    r2 = kn_bigram_score(empty, model, "text", "doc_id").first()
    assert r2["n_bigrams"] == 1 and math.isfinite(r2["avg_logprob_bits"])
    with pytest.raises(ValueError, match="discount"):
        kn_bigram_train(docs, "text", discount=1.5)
