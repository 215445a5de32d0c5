"""Distributed byte-pair-encoding tokenizer training and encoding.

A training-data pipeline's token counts should come from the tokenizer
the model will actually use, not a whitespace proxy — and training
that tokenizer is itself a corpus-scale job. This is the classic BPE
procedure (Sennrich, Haddow & Birch 2016, itself from Gage 1994):

1. Pre-tokenize the corpus into words and count them — the ONLY pass
   over raw text. Everything after operates on the (word, count)
   vocabulary table, which is orders of magnitude smaller than the
   corpus (Heaps' law), distributed and partial-aggregable.
2. Represent each vocab word as a symbol sequence (characters to
   start). Per merge round: count adjacent symbol pairs weighted by
   word count (explode + map-side-combined groupBy over the VOCAB
   table), pick the most frequent pair (ties broken lexicographically
   — deterministic, so an external replay learns the identical merge
   list), and fuse that pair in every word's sequence (one
   Arrow-batched projection over the vocab).
3. ``localCheckpoint`` every few rounds truncates the growing plan,
   same policy as the iterative graph operators.

Encoding applies the learned merge list with the standard
rank-greedy loop (lowest-rank pair first) inside an Arrow-batched
UDF, memoized per distinct word within a batch — per-word cost is
paid once per distinct word, not per occurrence.

No reference-parity citation: the reference has no tokenizer surface;
this extends SURVEY §2k (the "token counting" row's real-tokenizer
upgrade).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, IntegerType, StringType

# Arrow-batch closures reference module helpers; ship by value (same
# policy as features.py / streaming/events.py).
try:  # pragma: no cover - trivial registration
    import sys as _sys

    from pyspark import cloudpickle as _cloudpickle

    _cloudpickle.register_pickle_by_value(_sys.modules[__name__])
except Exception:
    pass

from data_export_tool_spark.operators.ranking import TOKEN_SPLIT_RE

__all__ = [
    "bpe_train", "bpe_encode", "save_bpe", "load_bpe",
    "py_bpe_train", "py_bpe_encode_word",
]


def word_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    """The corpus (word, cnt) table: lowercased ``TOKEN_SPLIT_RE``
    pre-tokenization (the repo-wide tokenizer contract), one
    map-side-combined groupBy — the single raw-text pass BPE needs."""
    toks = F.explode(
        F.filter(
            F.split(F.lower(F.col(text_col)), TOKEN_SPLIT_RE),
            lambda t: F.length(t) > 0,
        )
    ).alias("word")
    return df.select(toks).groupBy("word").agg(
        F.count(F.lit(1)).alias("cnt")
    )


def _merge_pair_in_seqs(pair: tuple[str, str]):
    """Vocab-table projection: fuse every non-overlapping occurrence
    of ``pair`` (left-to-right) in each symbol sequence."""
    import pandas as pd

    a, b = pair
    ab = a + b

    def fn(seqs):
        out = []
        for s in seqs:
            s = list(s)
            i, r = 0, []
            while i < len(s):
                if i + 1 < len(s) and s[i] == a and s[i + 1] == b:
                    r.append(ab)
                    i += 2
                else:
                    r.append(s[i])
                    i += 1
            out.append(r)
        return pd.Series(out, dtype="object")

    fn.__annotations__ = {"seqs": pd.Series, "return": pd.Series}
    return F.pandas_udf(fn, ArrayType(StringType()))


def bpe_train(
    df: DataFrame,
    num_merges: int,
    text_col: str = "text",
    min_pair_count: int = 2,
    checkpoint_every: int = 8,
) -> list[tuple[str, str]]:
    """Learn ``num_merges`` BPE merges from the corpus; returns the
    ordered merge list (rank = position). Stops early when no
    remaining pair reaches ``min_pair_count``. Deterministic: the
    winning pair maximizes (count, then lexicographically smallest) —
    an external single-machine replay learns the identical list.

    Cost model: one corpus scan (``word_counts``), then per round one
    explode+groupBy and one Arrow projection over the VOCAB table
    only; the driver holds one (pair, count) row per round.
    """
    if num_merges < 0:
        raise ValueError(f"num_merges must be >= 0: {num_merges}")
    # split on the zero-width between-chars pattern: character symbols
    # (the split leaves one trailing empty string — drop it)
    vocab = word_counts(df, text_col).select(
        "word",
        "cnt",
        F.filter(
            F.split(F.col("word"), "(?!^)"), lambda c: F.length(c) > 0
        ).alias("seq"),
    )
    vocab = vocab.localCheckpoint(eager=True)

    merges: list[tuple[str, str]] = []
    for r in range(num_merges):
        pairs = vocab.select(
            "cnt",
            F.explode(
                F.zip_with(
                    F.slice(F.col("seq"), 1, F.greatest(F.size("seq") - 1, F.lit(0))),
                    F.slice(F.col("seq"), 2, F.greatest(F.size("seq") - 1, F.lit(0))),
                    lambda x, y: F.struct(x.alias("a"), y.alias("b")),
                )
            ).alias("p"),
        )
        top = (
            pairs.groupBy("p")
            .agg(F.sum("cnt").alias("n"))
            .orderBy(F.desc("n"), F.asc("p.a"), F.asc("p.b"))
            .limit(1)
            .collect()
        )
        if not top or top[0]["n"] < min_pair_count:
            break
        best = (top[0]["p"]["a"], top[0]["p"]["b"])
        merges.append(best)
        vocab = vocab.withColumn(
            "seq", _merge_pair_in_seqs(best)(F.col("seq"))
        )
        if (r + 1) % checkpoint_every == 0:
            vocab = vocab.localCheckpoint(eager=True)
    return merges


def py_bpe_train(
    texts: Sequence[str], num_merges: int, min_pair_count: int = 2
) -> list[tuple[str, str]]:
    """Single-machine reference of ``bpe_train`` (same pre-tokenizer,
    same tie-break) for oracle replay."""
    import re

    wc: dict[str, int] = {}
    rx = re.compile(TOKEN_SPLIT_RE)
    for t in texts:
        if t is None:
            continue
        for w in rx.split(t.lower()):
            if w:
                wc[w] = wc.get(w, 0) + 1
    seqs = {w: list(w) for w in wc}
    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        pc: dict[tuple[str, str], int] = {}
        for w, s in seqs.items():
            n = wc[w]
            for i in range(len(s) - 1):
                p = (s[i], s[i + 1])
                pc[p] = pc.get(p, 0) + n
        if not pc:
            break
        best = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        if pc[best] < min_pair_count:
            break
        merges.append(best)
        a, b = best
        ab = a + b
        for w, s in seqs.items():
            i, r = 0, []
            while i < len(s):
                if i + 1 < len(s) and s[i] == a and s[i + 1] == b:
                    r.append(ab)
                    i += 2
                else:
                    r.append(s[i])
                    i += 1
            seqs[w] = r
    return merges


def py_bpe_encode_word(
    word: str, ranks: dict[tuple[str, str], int]
) -> list[str]:
    """Rank-greedy BPE encoding of one word — apply the LOWEST-rank
    applicable merge repeatedly (the standard inference loop; ties in
    position resolve left-to-right via the fuse scan)."""
    s = list(word)
    while len(s) > 1:
        best_rank, best_pair = None, None
        for i in range(len(s) - 1):
            r = ranks.get((s[i], s[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_pair = r, (s[i], s[i + 1])
        if best_pair is None:
            break
        a, b = best_pair
        i, r2 = 0, []
        while i < len(s):
            if i + 1 < len(s) and s[i] == a and s[i + 1] == b:
                r2.append(a + b)
                i += 2
            else:
                r2.append(s[i])
                i += 1
        s = r2
    return s


def bpe_encode(
    df: DataFrame,
    merges: Sequence[tuple[str, str]],
    text_col: str = "text",
    out_tokens: str = "bpe_tokens",
    out_count: str = "bpe_token_count",
) -> DataFrame:
    """Append the BPE token sequence and count of ``text_col`` under
    the learned ``merges``. NULL text → NULL. One Arrow-batched
    projection; per-word work is memoized per batch so a repeated
    word costs one encode. The merge list travels in the closure
    (kilobytes — the broadcast every tokenizer ships)."""
    import re

    import pandas as pd

    ranks = {tuple(p): i for i, p in enumerate(merges)}
    rx = re.compile(TOKEN_SPLIT_RE)

    def enc(texts):
        memo: dict[str, list[str]] = {}
        toks_out, cnt_out = [], []
        for t in texts:
            if t is None:
                toks_out.append(None)
                cnt_out.append(None)
                continue
            toks: list[str] = []
            for w in rx.split(t.lower()):
                if not w:
                    continue
                got = memo.get(w)
                if got is None:
                    got = py_bpe_encode_word(w, ranks)
                    memo[w] = got
                toks.extend(got)
            toks_out.append(toks)
            cnt_out.append(len(toks))
        return pd.DataFrame({"t": toks_out, "c": cnt_out})

    enc.__annotations__ = {"texts": pd.Series, "return": pd.DataFrame}
    udf = F.pandas_udf(
        enc, "t array<string>, c int"
    )
    res = udf(F.col(text_col))
    return df.withColumn("__bpe", res).select(
        "*",
        F.col("__bpe.t").alias(out_tokens),
        F.col("__bpe.c").alias(out_count),
    ).drop("__bpe")


def save_bpe(spark, merges: Sequence[tuple[str, str]], path: str) -> None:
    """Persist a learned merge list as a tiny rank-ordered parquet
    table ``(rank int, a string, b string)`` — the tokenizer artifact
    a training pipeline ships alongside its shards. Works on any
    Spark filesystem (it is just a DataFrame write)."""
    rows = [(i, a, b) for i, (a, b) in enumerate(merges)]
    spark.createDataFrame(
        rows, "rank int, a string, b string"
    ).coalesce(1).write.mode("overwrite").parquet(path)


def load_bpe(spark, path: str) -> list[tuple[str, str]]:
    """Load a ``save_bpe`` artifact back into the rank-ordered merge
    list ``bpe_encode`` consumes. Round-trip is exact (strings +
    ranks, no floats)."""
    rows = spark.read.parquet(path).orderBy("rank").collect()
    if [r["rank"] for r in rows] != list(range(len(rows))):
        raise ValueError(f"corrupt BPE artifact at {path!r}: rank gaps")
    return [(r["a"], r["b"]) for r in rows]
