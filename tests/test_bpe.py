"""BPE tokenizer (operators/bpe.py): the distributed trainer must
learn the IDENTICAL merge list as the single-machine reference, and
encoding must be lossless and reference-exact."""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F

from tests.conftest import record_opcheck
from data_export_tool_spark.operators.bpe import (
    bpe_encode,
    bpe_train,
    py_bpe_encode_word,
    py_bpe_train,
)
from data_export_tool_spark.operators.ranking import TOKEN_SPLIT_RE

N_MERGES = 24


@pytest.fixture(scope="module")
def corpus(spark, sf_dir):
    # ASCII-only sample: the Spark char split is UTF-16 code-unit
    # based (documented operator caveat for astral-plane text), the
    # python reference is code-point based — pin parity where both
    # agree and exercise unicode separately.
    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .where(F.col("text").rlike(r"^[\x20-\x7E\s]*$"))
        .limit(80)
        .select("doc_id", "text")
    )
    rows = docs.collect()
    return docs, [r["text"] for r in rows]


def test_bpe_train_matches_python_replay(spark, corpus):
    docs, texts = corpus
    got = bpe_train(docs, N_MERGES)
    want = py_bpe_train(texts, N_MERGES)
    ok = got == want and len(got) == N_MERGES
    record_opcheck(
        "bpe_train", len(got), ok, oracle="python-reference"
    )
    assert ok, (got[:5], want[:5])


def test_bpe_encode_reference_and_lossless(spark, corpus):
    docs, texts = corpus
    merges = py_bpe_train(texts, N_MERGES)
    enc = {
        r["doc_id"]: (r["bpe_tokens"], r["bpe_token_count"])
        for r in bpe_encode(docs, merges).collect()
    }
    src = {r["doc_id"]: r["text"] for r in docs.collect()}
    rx = re.compile(TOKEN_SPLIT_RE)
    ranks = {tuple(p): i for i, p in enumerate(merges)}
    ok = len(enc) == len(src) > 0
    for k, text in src.items():
        words = [w for w in rx.split(text.lower()) if w]
        want = [t for w in words for t in py_bpe_encode_word(w, ranks)]
        toks, cnt = enc[k]
        ok = ok and toks == want and cnt == len(want)
        # lossless: token concatenation reconstructs the word stream
        ok = ok and "".join(toks) == "".join(words)
    record_opcheck(
        "bpe_encode", len(src), ok, oracle="python-reference"
    )
    assert ok


def test_bpe_edges(spark):
    df = spark.createDataFrame(
        [(1, "aaa bbb aaa"), (2, None), (3, "")],
        "doc_id long, text string",
    )
    # num_merges=0: pure character tokens
    out = {r["doc_id"]: r for r in bpe_encode(df, []).collect()}
    assert out[1]["bpe_tokens"][:3] == ["a", "a", "a"]
    assert out[2]["bpe_tokens"] is None and out[2]["bpe_token_count"] is None
    assert out[3]["bpe_tokens"] == [] and out[3]["bpe_token_count"] == 0
    # early stop: min_pair_count too high for a tiny corpus
    assert bpe_train(df, 5, min_pair_count=10**6) == []
    with pytest.raises(ValueError):
        bpe_train(df, -1)
    # unicode text: same merges as the reference, and lossless w.r.t.
    # the shared pre-tokenizer (TOKEN_SPLIT_RE treats non-ASCII as
    # separators — the repo-wide tokenizer contract, same on both
    # sides)
    u_text = "héllo héllo wörld"
    u = spark.createDataFrame([(1, u_text)], "doc_id long, text string")
    m = bpe_train(u, 4)
    assert m == py_bpe_train([u_text], 4)
    toks = bpe_encode(u, m).first()["bpe_tokens"]
    rx = re.compile(TOKEN_SPLIT_RE)
    assert "".join(toks) == "".join(w for w in rx.split(u_text.lower()) if w)


def test_bpe_counts_feed_token_shards(spark, corpus):
    """Composition: real-tokenizer counts drive the shard packer —
    shard boundaries respect the BPE token budget exactly (python
    prefix-sum replay), closing the loop between the tokenizer and
    the packing operator that previously only saw proxy counts."""
    from data_export_tool_spark.operators.sampling import pack_token_shards

    docs, texts = corpus
    merges = py_bpe_train(texts, N_MERGES)
    counted = bpe_encode(docs, merges).select("doc_id", "bpe_token_count")
    packed = {
        r["doc_id"]: (r["cum_tokens"], r["shard_id"])
        for r in pack_token_shards(
            counted, "bpe_token_count", budget=2000
        ).collect()
    }
    rows = sorted(
        (r["doc_id"], r["bpe_token_count"])
        for r in counted.collect()
    )
    run = 0
    ok = len(packed) == len(rows) > 0
    for doc_id, cnt in rows:
        cum, shard = packed[doc_id]
        ok = ok and cum == run + cnt and shard == run // 2000
        run += cnt
    assert ok


def test_bpe_save_load_round_trip(spark, corpus, tmp_path):
    from data_export_tool_spark.operators.bpe import load_bpe, save_bpe

    docs, texts = corpus
    merges = py_bpe_train(texts, 12)
    path = str(tmp_path / "bpe_merges")
    save_bpe(spark, merges, path)
    loaded = load_bpe(spark, path)
    assert loaded == merges
    # encoding under the loaded artifact is identical
    a = bpe_encode(docs, merges).select("doc_id", "bpe_tokens").collect()
    b = bpe_encode(docs, loaded).select("doc_id", "bpe_tokens").collect()
    assert {r["doc_id"]: r["bpe_tokens"] for r in a} == {
        r["doc_id"]: r["bpe_tokens"] for r in b
    }
    # corrupt artifact (rank gap) is rejected loudly
    spark.createDataFrame(
        [(0, "a", "b"), (2, "c", "d")], "rank int, a string, b string"
    ).write.mode("overwrite").parquet(path)
    import pytest as _pytest

    with _pytest.raises(ValueError):
        load_bpe(spark, path)
