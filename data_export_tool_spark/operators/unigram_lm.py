"""Unigram-LM subword tokenizer (SentencePiece-style) — training and
encoding.

Kudo 2018 ("Subword Regularization"): where BPE (operators/bpe.py)
GROWS a vocabulary by greedy merges, the unigram LM SHRINKS one — seed
with every frequent substring, EM-fit piece probabilities under the
independence model P(word) = Π P(pieceᵢ), prune to the target size,
and encode by Viterbi (the segmentation maximizing Σ log P). The two
tokenizers disagree in exactly the ways that matter for ablations, so
a corpus pipeline wants both.

Division of labor (the bpe.py chassis):

- ONE raw-text pass builds the (word, cnt) vocabulary table; all
  training operates at DISTINCT-WORD grain (Heaps' law: orders of
  magnitude smaller than the corpus).
- Seed vocab: one substring explode over the word table (≤ max_len
  pieces per position, weighted by word count) → map-side-combined
  groupBy → top ``seed_factor × vocab_size`` by (count, piece) — plus
  EVERY single character, the coverage floor that keeps Viterbi total.
- EM round (Viterbi-EM, SentencePiece's hard-EM default): broadcast
  the piece log-probs (bounded by the seed size), ONE Arrow batch
  pass over distinct words running the DP, explode chosen pieces →
  groupBy sum of word-count-weighted piece counts → new probs. The
  shuffle never exceeds (distinct words × pieces-per-word) compact
  rows.
- Prune: keep the top ``vocab_size`` pieces by final expected count
  (singles always kept); one final M-step renormalizes.
- Encode: broadcast final vocab, Viterbi per DISTINCT word in the
  batch (memoized within batch), join-free Arrow projection.

Determinism contract (pinned in tests, replayed by the python
oracle): all ties break on (count desc, piece asc) for seeding/
pruning; the Viterbi DP breaks score ties by PREFERRING THE LONGER
last piece. No RNG anywhere.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

try:  # pragma: no cover - trivial registration
    import sys as _sys

    from pyspark import cloudpickle as _cloudpickle

    _cloudpickle.register_pickle_by_value(_sys.modules[__name__])
except Exception:
    pass

from data_export_tool_spark.operators.bpe import word_counts

__all__ = [
    "unigram_train",
    "unigram_encode",
    "py_viterbi",
]


def py_viterbi(word: str, logp: dict[str, float], max_len: int) -> list[str]:
    """Best segmentation of ``word`` under piece log-probs — the ONE
    shared DP (executors and the test oracle import the same
    function). Ties prefer the longer last piece. Characters missing
    from the vocab fall back to a large negative constant so malformed
    input still segments (flagged by probability, not by a crash)."""
    n = len(word)
    NEG = -1e9
    best = [NEG] * (n + 1)
    back = [0] * (n + 1)
    best[0] = 0.0
    for i in range(1, n + 1):
        for j in range(max(0, i - max_len), i):
            piece = word[j:i]
            lp = logp.get(piece)
            if lp is None:
                if i - j == 1:
                    lp = NEG  # unknown single char: coverage fallback
                else:
                    continue
            score = best[j] + lp
            # j iterates ascending (longest piece first); strict >
            # keeps the first best = longer last piece wins ties
            if score > best[i]:
                best[i] = score
                back[i] = j
    out = []
    i = n
    while i > 0:
        out.append(word[back[i]:i])
        i = back[i]
    return list(reversed(out))


def unigram_train(
    docs: DataFrame,
    text_col: str = "text",
    vocab_size: int = 2000,
    max_piece_len: int = 8,
    em_iters: int = 3,
    seed_factor: int = 4,
) -> dict:
    """Train; returns a JSON-portable model:
    ``{pieces: {piece: logp}, max_piece_len}``."""
    if vocab_size < 2:
        raise ValueError(f"vocab_size must be >= 2: {vocab_size}")
    if max_piece_len < 1:
        raise ValueError(f"max_piece_len must be >= 1: {max_piece_len}")
    if em_iters < 1:
        raise ValueError(f"em_iters must be >= 1: {em_iters}")
    wc = word_counts(docs, text_col)  # (word, cnt)
    wc = wc.where(F.length("word") > 0).cache()

    # ---- seed: frequent substrings + all single characters
    sub = wc.select(
        F.explode(
            F.expr(
                f"""
                flatten(transform(sequence(1, length(word)),
                  s -> transform(
                         sequence(s, least(length(word), s + {max_piece_len - 1})),
                         e -> substring(word, s, e - s + 1))))
                """
            )
        ).alias("piece"),
        F.col("cnt"),
    )
    piece_counts = sub.groupBy("piece").agg(F.sum("cnt").alias("pcnt"))
    singles = {
        r["piece"]: r["pcnt"]
        for r in piece_counts.where(F.length("piece") == 1).collect()
    }
    top_multi = (
        piece_counts.where(F.length("piece") > 1)
        .orderBy(F.desc("pcnt"), F.asc("piece"))
        .limit(max(0, seed_factor * vocab_size - len(singles)))
        .collect()
    )
    seed = dict(singles)
    seed.update({r["piece"]: r["pcnt"] for r in top_multi})
    total = sum(seed.values())
    logp = {p: math.log(c / total) for p, c in seed.items()}

    # ---- Viterbi-EM at distinct-word grain
    spark = docs.sparkSession
    for _ in range(em_iters):
        bc = spark.sparkContext.broadcast((logp, max_piece_len))

        def estep(batches):
            import pandas as pd

            lp, ml = bc.value
            for pdf in batches:
                rows_p, rows_c = [], []
                for w, c in zip(pdf["word"], pdf["cnt"]):
                    for piece in py_viterbi(w, lp, ml):
                        rows_p.append(piece)
                        rows_c.append(int(c))
                yield pd.DataFrame({"piece": rows_p, "cnt": rows_c})

        counts = (
            wc.mapInPandas(estep, schema="piece string, cnt long")
            .groupBy("piece")
            .agg(F.sum("cnt").alias("pcnt"))
            .collect()
        )
        new_counts = {r["piece"]: r["pcnt"] for r in counts}
        # coverage floor: singles never die mid-EM (prob mass ε)
        for ch in singles:
            new_counts.setdefault(ch, 0)
        tot = sum(new_counts.values()) or 1
        logp = {
            p: math.log((c + 1e-12) / tot) for p, c in new_counts.items()
        }
        bc.destroy()

    # ---- prune to vocab_size: singles always kept, then the largest
    # expected counts, ties (count desc, piece asc)
    multi = sorted(
        ((p, c) for p, c in new_counts.items() if len(p) > 1),
        key=lambda x: (-x[1], x[0]),
    )
    keep = dict((p, new_counts[p]) for p in singles)
    for p, c in multi:
        if len(keep) >= vocab_size:
            break
        keep[p] = c
    tot = sum(keep.values()) or 1
    final = {p: math.log((c + 1e-12) / tot) for p, c in keep.items()}
    wc.unpersist()
    return {"pieces": final, "max_piece_len": int(max_piece_len)}


def unigram_encode(
    df: DataFrame,
    model: dict,
    text_col: str = "text",
    out_col: str = "pieces",
) -> DataFrame:
    """Append the Viterbi segmentation of each row's text (per word,
    concatenated in order) — one Arrow pass, per-distinct-word
    memoized within each batch."""
    import re

    from data_export_tool_spark.operators.ranking import TOKEN_SPLIT_RE

    logp = dict(model["pieces"])
    ml = int(model["max_piece_len"])
    bc = df.sparkSession.sparkContext.broadcast((logp, ml))
    pat = re.compile(TOKEN_SPLIT_RE)

    def enc(batches):
        import pandas as pd

        lp, mlen = bc.value
        memo: dict[str, list[str]] = {}
        for pdf in batches:
            out = []
            for t in pdf[text_col]:
                if t is None:
                    out.append(None)
                    continue
                pieces: list[str] = []
                for w in pat.split(t.lower()):
                    if not w:
                        continue
                    seg = memo.get(w)
                    if seg is None:
                        seg = py_viterbi(w, lp, mlen)
                        memo[w] = seg
                    pieces.extend(seg)
                out.append(pieces)
            pdf = pdf.copy()
            pdf[out_col] = out
            yield pdf

    from pyspark.sql.types import ArrayType, StringType, StructField, StructType

    schema = StructType(
        list(df.schema.fields) + [StructField(out_col, ArrayType(StringType()))]
    )
    return df.mapInPandas(enc, schema=schema)
