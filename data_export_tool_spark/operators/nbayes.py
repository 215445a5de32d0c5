"""Multinomial Naive Bayes text classification — distributed train + score.

The corpus-curation stack already has discriminative classifiers
(``linear.logreg_fit`` over hashed/PCA features); this adds the
generative bag-of-words sibling — the classic fastText/CCNet-era
baseline for language ID, topic routing, and quality triage — trained
and scored entirely as DataFrame algebra:

- **fit** is ONE token-count aggregation: explode the shared scan-side
  tokenizer (``ranking._tokens`` — identical semantics to DuckDB's
  ``string_split_regex`` so the whole model is oracle-replayable),
  ``groupBy(label, token).count()`` (map-side combinable; the exchange
  carries (label, token) partials, never rows), then Laplace-smooth
  into per-(token, class) log-likelihoods over the FULL vocab × class
  grid, so every in-vocab token has a weight for every class. The only
  driver materialization is class-grain metadata: k priors, k token
  totals, one vocab-size scalar — bounded by class cardinality, not
  corpus size. The weights themselves stay a DataFrame (persistable
  via parquet like the IVF index / stored sketches).
- **score** is explode → join the weights on token → one
  ``groupBy(id, label)`` log-prob sum + prior. With a pruned vocab
  (``max_vocab``) the model is a few MB and the join broadcasts, so
  scoring 100 TB is one scan + one doc-grain aggregation — no Python.
  Out-of-vocabulary tokens are DROPPED by contract (the standard
  pruned-vocab convention); documents with zero in-vocab tokens fall
  back to priors alone.

Reference scope: the reference engine has no ML surface
(`/root/reference/export.py` is orchestration + SQL); this extends
SURVEY.md §2k's curation pipeline the same way linear.py does.

Ties in ``nbayes_predict`` break to the LEXICOGRAPHICALLY LARGEST
label (max of (score, label) struct) — deterministic and pinned by
test; DuckDB replays it with the same ORDER BY.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_export_tool_spark.operators.ranking import _tokens

__all__ = ["NBModel", "nbayes_fit", "nbayes_score", "nbayes_predict"]


@dataclass(frozen=True)
class NBModel:
    """A fitted multinomial NB model.

    ``weights`` is a DataFrame (token, label, log_prob) over the full
    vocab × class grid; ``log_priors`` maps class → log prior (k
    entries, driver-side by contract — class cardinality is small);
    ``vocab_size`` and ``alpha`` document the smoothing so a stored
    model can be audited.
    """

    weights: DataFrame
    log_priors: dict[str, float]
    vocab_size: int
    alpha: float
    min_len: int
    broadcast_model: bool = True

    def classes(self) -> list[str]:
        return sorted(self.log_priors)


def nbayes_fit(
    df: DataFrame,
    text_col: str = "text",
    label_col: str = "lang",
    *,
    alpha: float = 1.0,
    min_len: int = 2,
    max_vocab: int | None = None,
    broadcast_model: bool = True,
) -> NBModel:
    """Fit multinomial NB with Laplace (add-``alpha``) smoothing.

    ``max_vocab`` keeps only the top-N tokens by corpus frequency
    (ties to the lexicographically smaller token) — the scale lever:
    it bounds the model so scoring can broadcast. N-bounded top-k is a
    ``TakeOrderedAndProject``, never a global sort.

    Rows with NULL text or NULL label are excluded from the fit by
    contract (mirrors linear.py's label policy).
    """
    if alpha <= 0:
        raise ValueError("alpha must be > 0 (Laplace smoothing)")
    base = (
        df.where(F.col(text_col).isNotNull() & F.col(label_col).isNotNull())
        .select(
            F.col(label_col).cast("string").alias("label"),
            _tokens(F.col(text_col), min_len).alias("__toks"),
        )
    )
    # class priors: k rows to the driver (bounded by class cardinality)
    prior_rows = base.groupBy("label").count().collect()
    if not prior_rows:
        raise ValueError("nbayes_fit: no usable (text, label) rows")
    n_docs = sum(r["count"] for r in prior_rows)
    import math

    log_priors = {r["label"]: math.log(r["count"] / n_docs) for r in prior_rows}

    # ONE (label, token) count exchange — map-side combinable
    counts = (
        base.select("label", F.explode("__toks").alias("token"))
        .groupBy("label", "token")
        .count()
    )
    vocab = counts.groupBy("token").agg(F.sum("count").alias("__tot"))
    if max_vocab is not None:
        vocab = vocab.orderBy(F.desc("__tot"), F.asc("token")).limit(int(max_vocab))
    vocab = vocab.select("token")

    pruned = counts.join(vocab.hint("broadcast") if max_vocab else vocab, "token")
    # class token totals over the PRUNED vocab + vocab size: k+1 scalars
    totals = {
        r["label"]: r["tot"]
        for r in pruned.groupBy("label").agg(F.sum("count").alias("tot")).collect()
    }
    vocab_size = vocab.count()

    spark = df.sparkSession
    classes = spark.createDataFrame(
        [(c, float(totals.get(c, 0))) for c in sorted(log_priors)],
        "label string, __ctot double",
    )
    # full vocab × class grid so every in-vocab token scores every class
    weights = (
        vocab.crossJoin(F.broadcast(classes))
        .join(pruned, ["token", "label"], "left")
        .select(
            "token",
            "label",
            F.log(
                (F.coalesce(F.col("count"), F.lit(0)) + F.lit(float(alpha)))
                / (F.col("__ctot") + F.lit(float(alpha)) * F.lit(float(vocab_size)))
            ).alias("log_prob"),
        )
    )
    return NBModel(
        weights=weights,
        log_priors=log_priors,
        vocab_size=vocab_size,
        alpha=float(alpha),
        min_len=min_len,
        broadcast_model=broadcast_model,
    )


def nbayes_score(
    model: NBModel,
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-(id, class) log posterior: prior + Σ log P(token | class).

    Output: (id_col, label, score, n_tokens_matched) — the full score
    frame (k rows per document), which the oracle can value-compare;
    ``nbayes_predict`` reduces it to the argmax. One token join (the
    weights broadcast when ``model.broadcast_model``) + one
    (id, label) aggregation; documents with zero in-vocab tokens get
    prior-only rows so the output covers every non-NULL-text input.
    """
    spark = df.sparkSession
    priors = spark.createDataFrame(
        sorted(model.log_priors.items()), "label string, __lp double"
    )
    base = df.where(F.col(text_col).isNotNull()).select(
        F.col(id_col), _tokens(F.col(text_col), model.min_len).alias("__toks")
    )
    toks = base.select(id_col, F.explode("__toks").alias("token"))
    w = F.broadcast(model.weights) if model.broadcast_model else model.weights
    matched = (
        toks.join(w, "token")
        .groupBy(id_col, "label")
        .agg(
            F.sum("log_prob").alias("__ll"),
            F.count(F.lit(1)).alias("n_tokens_matched"),
        )
    )
    scored = matched.join(F.broadcast(priors), "label").select(
        id_col,
        "label",
        (F.col("__lp") + F.col("__ll")).alias("score"),
        "n_tokens_matched",
    )
    # prior-only fallback rows for docs with zero in-vocab tokens
    unmatched = (
        base.select(id_col)
        .join(matched.select(id_col).distinct(), id_col, "left_anti")
        .crossJoin(F.broadcast(priors))
        .select(
            id_col,
            "label",
            F.col("__lp").alias("score"),
            F.lit(0).cast("long").alias("n_tokens_matched"),
        )
    )
    return scored.unionByName(unmatched)


def nbayes_predict(
    model: NBModel,
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Argmax over :func:`nbayes_score` — (id, predicted, score).

    Ties break to the lexicographically LARGEST label (max of the
    (score, label) struct) — explicit so the DuckDB oracle can replay
    the exact rule.
    """
    scores = nbayes_score(model, df, id_col, text_col)
    best = (
        scores.groupBy(id_col)
        .agg(F.max(F.struct("score", "label")).alias("__b"))
        .select(
            id_col,
            F.col("__b.label").alias("predicted"),
            F.col("__b.score").alias("score"),
        )
    )
    return best
