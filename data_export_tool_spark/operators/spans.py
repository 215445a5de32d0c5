"""Exact substring (duplicated n-gram span) deduplication.

Document-level dedup (operators/dedup.py) removes whole near-identical
documents; this module removes REPEATED PASSAGES — license headers,
boilerplate navigation, quoted chain-mail — that recur inside otherwise
unique documents, the corpus defect Lee et al. 2022 ("Deduplicating
Training Data Makes Language Models Better", ExactSubstr) showed
inflates memorization. The reference engine has no passage-level
operator; this is part of the LLM-curation surface beyond
`/root/reference` (SURVEY §2k).

Spark-first shape, sized for a 100 TB corpus:

- Tokenize (whitespace) and hash every n-token sliding window with
  ``xxhash64`` — the window stage is one ``posexplode`` whose row count
  is Σ tokens, the same order as the corpus itself (identical to the
  BPE/token-shard stages' working set; no suffix array is ever built,
  which is the standard distributed relaxation of ExactSubstr's
  suffix-array join).
- Corpus-wide duplication is one partial-aggregable ``groupBy`` on the
  64-bit window hash (uniformly distributed keys — a boilerplate
  window repeated 10⁹ times is ONE group, absorbed map-side), keeping
  only hashes seen more than once plus their canonical owner
  ``min(struct(doc, pos))`` — a single agg, no window function.
- Flagged positions come back via a hash-keyed shuffle join, and span
  assembly is per-document windowed gap-grouping (partitions bounded
  by document length, never by corpus size).

Nothing is collected to the driver at any stage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["duplicate_spans", "strip_duplicate_spans"]


def _tokens(text_col: str):
    # split(.., "\\s+") leaves "" edge elements (leading whitespace);
    # filter them so positions index real tokens
    return F.filter(
        F.split(F.col(text_col), r"\s+"), lambda x: x != F.lit("")
    )


def _window_occurrences(
    df: DataFrame, n: int, id_col: str, text_col: str
) -> DataFrame:
    """(id, pos, whash) for every n-token window start. Tokens are
    staged as a real column first — a HOF lambda capturing the
    split/filter subtree would re-evaluate it per element."""
    toks = df.select(F.col(id_col).alias("__id"), _tokens(text_col).alias("__t"))
    # the start sequence must be TOTAL (empty for short docs), not
    # guarded by a separate .where(): InferFiltersFromGenerate copies
    # `size(transform(...)) > 0` into the scan-side Filter, where
    # subexpression elimination evaluates the transform EAGERLY —
    # before any short-circuit — and sequence(0, negative) descends
    # through 0 into an invalid slice start
    starts = F.when(
        F.size("__t") >= n, F.sequence(F.lit(0), F.size("__t") - n)
    ).otherwise(F.array().cast("array<int>"))
    hashes = toks.select(
        "__id",
        F.transform(
            starts,
            lambda i: F.xxhash64(F.concat_ws("\x1f", F.slice("__t", i + 1, n))),
        ).alias("__h"),
    )
    return hashes.select("__id", F.posexplode("__h").alias("pos", "whash"))


def _merge_spans(flagged: DataFrame, n: int) -> DataFrame:
    """Gap-group flagged window starts per doc into maximal spans:
    starts p1 < p2 merge when p2 − p1 ≤ n (overlap or adjacency), so
    [start, end) covers every flagged token exactly once."""
    w = Window.partitionBy("__id").orderBy("pos")
    seg = flagged.withColumn(
        "__new",
        F.when(
            F.col("pos") - F.lag("pos").over(w) <= F.lit(n), F.lit(0)
        ).otherwise(F.lit(1)),
    ).withColumn("__seg", F.sum("__new").over(w))
    return seg.groupBy("__id", "__seg").agg(
        F.min("pos").alias("span_start"),
        (F.max("pos") + F.lit(n)).alias("span_end"),
        F.count(F.lit(1)).alias("n_windows"),
    )


def duplicate_spans(
    df: DataFrame,
    n: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
    keep_canonical: bool = False,
) -> DataFrame:
    """Maximal duplicated token spans per document.

    A window (n consecutive whitespace tokens) is *duplicated* when its
    token sequence occurs more than once corpus-wide — in another
    document or repeated within the same one. Overlapping/adjacent
    duplicated windows merge into one span ``[span_start, span_end)``
    (token indices into the whitespace tokenization).

    ``keep_canonical=False`` (default) reports every occurrence — the
    audit view. ``keep_canonical=True`` exempts, per window, the single
    canonical occurrence ``min(struct(id, pos))``, so the reported
    spans are exactly what :func:`strip_duplicate_spans` removes
    (Lee et al.'s keep-one-copy policy, made deterministic).

    Returns (id_col, span_start, span_end, n_tokens, n_windows).
    """
    if n < 1:
        raise ValueError("window length n must be >= 1")
    occ = _window_occurrences(df, n, id_col, text_col)
    dup = (
        occ.groupBy("whash")
        .agg(
            F.count(F.lit(1)).alias("__cnt"),
            F.min(F.struct("__id", "pos")).alias("__own"),
        )
        .where(F.col("__cnt") > 1)
        .select("whash", "__own.__id", "__own.pos")
        .toDF("whash", "own_id", "own_pos")
    )
    flagged = occ.join(dup, "whash")
    if keep_canonical:
        flagged = flagged.where(
            ~((F.col("__id") == F.col("own_id")) & (F.col("pos") == F.col("own_pos")))
        )
    spans = _merge_spans(flagged.select("__id", "pos").distinct(), n)
    return spans.select(
        F.col("__id").alias(id_col),
        "span_start",
        "span_end",
        (F.col("span_end") - F.col("span_start")).alias("n_tokens"),
        "n_windows",
    )


def strip_duplicate_spans(
    df: DataFrame,
    n: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Remove duplicated passages, keeping one canonical copy corpus-wide.

    Every duplicated window occurrence except its canonical owner
    (``min(struct(id, pos))`` — deterministic, no tie ambiguity) is
    removable; removable occurrences gap-merge into spans and the
    covered tokens are dropped from the document. All other columns
    pass through; a ``span_dedup_removed`` column counts dropped
    tokens.

    Contract: documents with no removable span keep their text byte
    -for-byte; modified documents are rebuilt from the whitespace
    tokenization (whitespace-normalized, single spaces) — the same
    normalization every downstream token-level stage applies anyway.
    """
    spans = duplicate_spans(
        df, n=n, id_col=id_col, text_col=text_col, keep_canonical=True
    )
    per_doc = spans.groupBy(id_col).agg(
        F.collect_list(F.struct("span_start", "span_end")).alias("__spans")
    )
    out = df.join(per_doc, id_col, "left")
    toks = _tokens(text_col)
    kept = F.filter(
        toks,
        lambda x, i: ~F.exists(
            F.col("__spans"),
            lambda s: (i >= s["span_start"]) & (i < s["span_end"]),
        ),
    )
    removed = F.size(toks) - F.size(kept)
    return out.select(
        *[c for c in df.columns if c != text_col],
        F.when(F.col("__spans").isNull(), F.col(text_col))
        .otherwise(F.concat_ws(" ", kept))
        .alias(text_col),
        F.when(F.col("__spans").isNull(), F.lit(0))
        .otherwise(removed)
        .alias("span_dedup_removed"),
    )
