"""Interpolated Kneser–Ney bigram language model: train + score.

The perplexity filter a pretraining pipeline actually wants: the
add-α unigram scorer (``quality.unigram_logprob_scores``) catches
gibberish, but boilerplate and keyword-stuffed spam have normal word
frequencies and broken word ORDER — a bigram LM sees that. Kneser–Ney
(Kneser & Ney 1995; Chen & Goodman 1999's interpolated form) is the
standard n-gram smoother: absolute-discount the bigram MLE and back
off to the CONTINUATION unigram P_cont(w) ∝ |{v : c(vw) > 0}| —
"how many contexts does w complete" — rather than raw frequency (the
canonical example: "Francisco" is frequent but only ever follows
"San", so its continuation probability is tiny).

Model law (the replay oracle pins it exactly)::

    P(w|v) = max(c(vw) − d, 0)/c(v·)  +  λ(v) · P_cont(w)
    λ(v)   = d · N1+(v·) / c(v·)          (the discount mass, spread)
    P_cont(w) = N1+(·w) / N1+(··)

with d = ``discount`` ∈ (0,1), default 0.75 (Chen & Goodman's robust
choice). Σ_w∈V P(w|v) = 1 exactly for every seen context — pinned as
a test law, not assumed.

Tokenization: the repo-wide contract (``bpe.word_counts`` lowercased
``TOKEN_SPLIT_RE``), with ``<s>`` prepended and ``</s>`` appended per
DOCUMENT (sentence segmentation is a caller-side recode). OOV
conventions, disclosed and replayed: an unseen context v backs off to
pure ``P_cont(w)``; an unseen w contributes ``P_cont = 1/(N1+(··)+1)``
(one pseudo-continuation — keeps log finite and deterministic).

Scale shape
-----------
Training is THREE map-side-combinable aggregations off one token-pair
explode: (v,w) bigram counts, context totals + follower-type counts
(one groupBy over the bigram table — NOT the corpus), continuation
type counts (ditto). All model tables are vocabulary-grain (Heaps'
law). Scoring is the same explode + two/three equi-joins against the
model tables + pure column algebra — no Python anywhere; Catalyst
broadcasts the unigram sides when small and AQE handles hot contexts
(stopword v's) on the bigram join.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from data_export_tool_spark.operators.bpe import TOKEN_SPLIT_RE

__all__ = ["kn_bigram_train", "kn_bigram_score", "py_kn_logprob"]

BOS, EOS = "<s>", "</s>"


def _doc_bigrams(df: DataFrame, text_col: str):
    """(v, w) adjacent-pair rows over BOS+tokens+EOS per document."""
    toks = F.filter(
        F.split(F.lower(F.col(text_col)), TOKEN_SPLIT_RE),
        lambda t: F.length(t) > 0,
    )
    ext = F.concat(F.array(F.lit(BOS)), toks, F.array(F.lit(EOS)))
    m = F.size(ext)
    pairs = F.zip_with(
        F.slice(ext, 1, m - 1),
        F.slice(ext, 2, m - 1),
        lambda a, b: F.struct(a.alias("v"), b.alias("w")),
    )
    return pairs


def kn_bigram_train(
    df: DataFrame, text_col: str = "text", discount: float = 0.75
) -> dict:
    """Fit the interpolated-KN bigram model over a corpus. Returns a
    model dict of vocabulary-grain DataFrames::

        {"bigrams":       (v, w, c)           bigram counts,
         "contexts":      (v, c_total, n_follow, lam)  per context,
         "continuations": (w, p_cont)         continuation unigram,
         "n_bigram_types": int, "discount": float}
    """
    if not 0.0 < discount < 1.0:
        raise ValueError(f"discount must be in (0, 1): {discount}")
    pairs = df.select(F.explode(_doc_bigrams(df, text_col)).alias("p"))
    bigrams = (
        pairs.select(F.col("p.v").alias("v"), F.col("p.w").alias("w"))
        .groupBy("v", "w")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    contexts = bigrams.groupBy("v").agg(
        F.sum("c").alias("c_total"),
        F.count(F.lit(1)).alias("n_follow"),
    )
    contexts = contexts.withColumn(
        "lam",
        F.lit(float(discount)) * F.col("n_follow") / F.col("c_total"),
    )
    cont_types = bigrams.groupBy("w").agg(
        F.count(F.lit(1)).alias("n_prev")
    )
    n_bigram_types = bigrams.count()
    continuations = cont_types.select(
        "w", (F.col("n_prev") / F.lit(float(n_bigram_types))).alias("p_cont")
    )
    return {
        "bigrams": bigrams,
        "contexts": contexts,
        "continuations": continuations,
        "n_bigram_types": int(n_bigram_types),
        "discount": float(discount),
    }


def py_kn_logprob(
    v: str,
    w: str,
    bigrams: dict,
    contexts: dict,
    p_cont: dict,
    n_bigram_types: int,
    discount: float,
) -> float:
    """log2 P(w|v) under the exact conventions of ``kn_bigram_score``
    — the replay oracle's per-pair arithmetic."""
    pc = p_cont.get(w, 1.0 / (n_bigram_types + 1))
    ctx = contexts.get(v)
    if ctx is None:
        return math.log2(pc)
    c_total, n_follow = ctx
    lam = discount * n_follow / c_total
    c = bigrams.get((v, w), 0)
    p = max(c - discount, 0.0) / c_total + lam * pc
    return math.log2(p)


def kn_bigram_score(
    df: DataFrame,
    model: dict,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document KN-bigram fluency: ``(id, n_bigrams,
    avg_logprob_bits, perplexity)`` where avg_logprob_bits is the mean
    log2 P(w|v) over the document's BOS/EOS-extended bigrams and
    perplexity = 2^(−avg). Empty documents (no tokens) still score
    their single ``<s>→</s>`` transition. Cost: one explode + three
    equi-joins + column algebra, no Python."""
    d = float(model["discount"])
    eps_cont = 1.0 / (model["n_bigram_types"] + 1)
    pairs = df.select(
        F.col(id_col).alias("__id"),
        F.explode(_doc_bigrams(df, text_col)).alias("p"),
    ).select("__id", F.col("p.v").alias("v"), F.col("p.w").alias("w"))
    joined = (
        pairs.join(model["bigrams"], ["v", "w"], "left")
        .join(model["contexts"].select("v", "c_total", "lam"), ["v"], "left")
        .join(model["continuations"], ["w"], "left")
    )
    pc = F.coalesce(F.col("p_cont"), F.lit(eps_cont))
    p_seen_ctx = (
        F.greatest(
            F.coalesce(F.col("c").cast("double"), F.lit(0.0)) - F.lit(d),
            F.lit(0.0),
        )
        / F.col("c_total")
        + F.col("lam") * pc
    )
    logp = F.log2(
        F.when(F.col("c_total").isNotNull(), p_seen_ctx).otherwise(pc)
    )
    return (
        joined.groupBy("__id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.avg(logp).alias("avg_logprob_bits"),
        )
        .select(
            F.col("__id").alias(id_col),
            "n_bigrams",
            "avg_logprob_bits",
            F.pow(F.lit(2.0), -F.col("avg_logprob_bits")).alias("perplexity"),
        )
    )
