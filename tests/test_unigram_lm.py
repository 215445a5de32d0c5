"""Unigram-LM tokenizer (operators/unigram_lm.py): exact python
replay of seed → Viterbi-EM → prune, segmentation laws (coverage,
longer-piece tie rule), encode round-trip, and validation."""

from __future__ import annotations

import math
import re

import pytest
from pyspark.sql import functions as F

from tests.conftest import record_opcheck
from data_export_tool_spark.operators.ranking import TOKEN_SPLIT_RE
from data_export_tool_spark.operators.unigram_lm import (
    py_viterbi,
    unigram_encode,
    unigram_train,
)

VOCAB, MAXLEN, ITERS, SEEDF = 60, 4, 2, 4


def _replay_train(texts):
    pat = re.compile(TOKEN_SPLIT_RE)
    wc: dict[str, int] = {}
    for t in texts:
        for w in pat.split(t.lower()):
            if w:
                wc[w] = wc.get(w, 0) + 1
    # seed
    pc: dict[str, int] = {}
    for w, c in wc.items():
        for s in range(len(w)):
            for e in range(s + 1, min(len(w), s + MAXLEN) + 1):
                pc[w[s:e]] = pc.get(w[s:e], 0) + c
    singles = {p: c for p, c in pc.items() if len(p) == 1}
    multi = sorted(
        ((p, c) for p, c in pc.items() if len(p) > 1),
        key=lambda x: (-x[1], x[0]),
    )[: max(0, SEEDF * VOCAB - len(singles))]
    seed = dict(singles)
    seed.update(dict(multi))
    total = sum(seed.values())
    logp = {p: math.log(c / total) for p, c in seed.items()}
    for _ in range(ITERS):
        counts: dict[str, int] = {}
        for w, c in wc.items():
            for piece in py_viterbi(w, logp, MAXLEN):
                counts[piece] = counts.get(piece, 0) + c
        for ch in singles:
            counts.setdefault(ch, 0)
        tot = sum(counts.values()) or 1
        logp = {p: math.log((c + 1e-12) / tot) for p, c in counts.items()}
    multi2 = sorted(
        ((p, c) for p, c in counts.items() if len(p) > 1),
        key=lambda x: (-x[1], x[0]),
    )
    keep = {p: counts[p] for p in singles}
    for p, c in multi2:
        if len(keep) >= VOCAB:
            break
        keep[p] = c
    tot = sum(keep.values()) or 1
    return {p: math.log((c + 1e-12) / tot) for p, c in keep.items()}


@pytest.fixture(scope="module")
def corpus(spark):
    texts = [
        "the cat sat on the mat",
        "the hat and the bat and the cat",
        "matting and batting and hatting",
        "catcat mathat thethe",
        "on and on and on the mat sat a cat",
    ] * 3
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    return texts, df


def test_unigram_train_matches_python_replay(spark, corpus):
    texts, df = corpus
    model = unigram_train(
        df, vocab_size=VOCAB, max_piece_len=MAXLEN, em_iters=ITERS,
        seed_factor=SEEDF,
    )
    want = _replay_train(texts)
    got = model["pieces"]
    assert set(got) == set(want), (
        set(got) - set(want), set(want) - set(got)
    )
    ok = all(got[p] == pytest.approx(want[p], abs=1e-9) for p in want)
    record_opcheck(
        "unigram_lm_train", len(want), ok, oracle="python-reference"
    )
    assert ok


def test_unigram_encode_laws(spark, corpus):
    texts, df = corpus
    model = unigram_train(
        df, vocab_size=VOCAB, max_piece_len=MAXLEN, em_iters=ITERS,
        seed_factor=SEEDF,
    )
    enc = unigram_encode(df, model).collect()
    pat = re.compile(TOKEN_SPLIT_RE)
    for r in enc:
        # round-trip: concatenated pieces reproduce the lowered words
        assert "".join(r["pieces"]) == "".join(
            w for w in pat.split(r["text"].lower()) if w
        )
        # every emitted piece is in vocab (coverage floor: singles)
        assert all(p in model["pieces"] for p in r["pieces"])
    # per-word segmentation equals the shared DP oracle
    for w in ["matting", "thethe", "catcat", "on"]:
        got = unigram_encode(
            spark.createDataFrame([(w,)], "text string"), model
        ).collect()[0]["pieces"]
        assert got == py_viterbi(w, model["pieces"], MAXLEN)
    # unknown characters fall back to singles without crashing
    odd = unigram_encode(
        spark.createDataFrame([("zzq␟zzq",)], "text string"), model
    ).collect()[0]["pieces"]
    assert "".join(odd).startswith("zzq")
    # NULL text -> NULL pieces
    assert unigram_encode(
        spark.createDataFrame([(None,)], "text string"), model
    ).collect()[0]["pieces"] is None


def test_unigram_validation(spark, corpus):
    _, df = corpus
    with pytest.raises(ValueError):
        unigram_train(df, vocab_size=1)
    with pytest.raises(ValueError):
        unigram_train(df, max_piece_len=0)
    with pytest.raises(ValueError):
        unigram_train(df, em_iters=0)
