"""Repetition-based document quality filters (extended surface).

The published web-corpus quality recipes (Gopher/MassiveText-style
rules) flag documents dominated by internal repetition: a single
repeated bigram, or a high fraction of duplicated n-grams. Two
signals, both cheap and exactly reproducible by a SQL oracle:

- ``top2_frac``: occurrences of the document's most frequent word
  bigram over total bigram occurrences. The modal count is the
  longest run of equal adjacent elements in the SORTED bigram array —
  ``array_sort`` + one ``aggregate`` fold per row, entirely inside
  the projection.
- ``dup3_frac``: 1 − distinct/total word trigrams. Pure per-row
  column algebra (``array_distinct``/``size`` over the higher-order
  n-gram build).

Both signals are per-row projections: ZERO shuffles, one corpus scan.
At 100 TB that matters more than anything else — the alternative
(explode every bigram and aggregate) moves tokens×corpus rows through
an exchange; this shape moves nothing.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from data_export_tool_spark.functions.text import token_count, word_ngrams_all


def _sorted_run_fold(arr: Column, finish) -> Column:
    """One JVM ``aggregate`` fold over ``array_sort(arr)`` carrying
    (prev, run, best, n): the longest run of equal adjacent elements
    (== max multiplicity of any element) and the element count, handed
    to ``finish`` for the final projection. Shared by
    ``max_run_length`` and ``is_repetitive`` so the run-length
    recurrence lives in exactly one place. Empty arrays fold to
    best=0, n=0; a NULL array folds to NULL."""

    def run(acc, x):
        return (
            F.when(x.eqNullSafe(acc["prev"]), acc["run"] + 1)
            .otherwise(F.lit(1).cast("long"))
        )

    return F.aggregate(
        F.array_sort(arr),
        F.struct(
            F.lit(None).cast("string").alias("prev"),
            F.lit(0).cast("long").alias("run"),
            F.lit(0).cast("long").alias("best"),
            F.lit(0).cast("long").alias("n"),
        ),
        lambda acc, x: F.struct(
            x.alias("prev"),
            run(acc, x).alias("run"),
            F.greatest(acc["best"], run(acc, x)).alias("best"),
            (acc["n"] + 1).alias("n"),
        ),
        finish,
    )


def max_run_length(arr: Column) -> Column:
    """Longest run of equal adjacent elements in a SORTED array<string>
    == the maximum multiplicity of any element."""
    return _sorted_run_fold(arr, lambda acc: acc["best"])


def is_repetitive(text: Column, top2_threshold: float = 0.1) -> Column:
    """Boolean repetition verdict as a pure COLUMN expression (the
    modal bigram occurs more than once and holds at least
    ``top2_threshold`` of all bigram slots). Same definition
    (including the 6-dp rounding) as ``repetition_stats``'s
    ``repetitive`` column.

    Shape: ONE fold over the sorted bigram array carrying
    (prev, run, best, n) — the bigram array, the modal count and the
    slot count are each referenced exactly once, so the verdict costs
    the same whether Catalyst evaluates it in a Project or substitutes
    it into a pushed-down Filter predicate (where no common-
    subexpression elimination would rescue a multi-reference form —
    the previous 3-reference version cost ~8× more as a filter,
    measured at sf0.1)."""
    return _sorted_run_fold(
        word_ngrams_all(text, 2),
        lambda acc: (acc["best"] > 1)
        & (
            F.round(acc["best"] / F.greatest(acc["n"], F.lit(1)), 6)
            >= F.lit(top2_threshold)
        ),
    )


def repetition_stats(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    top2_threshold: float = 0.1,
) -> DataFrame:
    """Per-document repetition metrics.

    Returns ``id_col``, ``n_tokens``, ``top2_count`` (occurrences of
    the modal bigram), ``top2_frac``, ``dup3_frac`` (both rounded to
    6 dp), and ``repetitive`` (modal bigram occurs more than once AND
    its share is at or above ``top2_threshold``).
    """
    base = df.select(
        F.col(id_col),
        token_count(F.col(text_col)).alias("n_tokens"),
        word_ngrams_all(F.col(text_col), 2).alias("_g2"),
        word_ngrams_all(F.col(text_col), 3).alias("_g3"),
    )

    return (
        base.select(
            id_col,
            "n_tokens",
            F.size("_g2").alias("n2_total"),
            F.round(
                F.lit(1.0)
                - F.size(F.array_distinct("_g3"))
                / F.greatest(F.size("_g3"), F.lit(1)).cast("double"),
                6,
            ).alias("dup3_frac"),
            max_run_length(F.col("_g2")).alias("top2_count"),
        )
        .withColumn(
            "top2_frac",
            F.round(
                F.col("top2_count") / F.greatest(F.col("n2_total"), F.lit(1)), 6
            ),
        )
        .withColumn(
            "repetitive",
            (F.col("top2_count") > 1)
            & (F.col("top2_frac") >= F.lit(top2_threshold)),
        )
        .select(
            id_col,
            "n_tokens",
            "top2_count",
            "top2_frac",
            "dup3_frac",
            "repetitive",
        )
    )


# ---------------------------------------------------------------------------
# Gopher-style document quality rules (Rae et al. 2021, §A1.1 — the
# published heuristic battery most corpus-curation pipelines start
# from). Every rule is scan-side column algebra over the whitespace
# token / line structure — no Python, fully SQL-replayable — and the
# per-rule verdicts are exposed individually so threshold tuning is an
# analyst query, not a re-run.
# ---------------------------------------------------------------------------

#: the Gopher "must contain ≥ 2 of these" stop set (public list)
GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")


def gopher_quality_flags(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    max_symbol_word_ratio: float = 0.1,
    max_bullet_line_frac: float = 0.9,
    max_ellipsis_line_frac: float = 0.3,
    min_alpha_word_frac: float = 0.8,
    min_stopword_hits: int = 2,
) -> DataFrame:
    """Per-document Gopher rule verdicts plus the metrics behind them:
    ``(id_col, n_words, mean_word_len, symbol_word_ratio,
    bullet_line_frac, ellipsis_line_frac, alpha_word_frac,
    stopword_hits, ok_* one boolean per rule, gopher_keep)``.
    NULL/empty text fails the word-count rule and keeps NULL metrics
    where undefined. Thresholds default to the published values."""
    # words/lines are STAGED as real columns (first select below): each
    # feeds ~4 HOF filters/folds, and an inline expression would re-run
    # its split per consumer (~8 splits/row total)
    words = F.col("__words")
    lines = F.col("__lines")
    staged = df.select(
        "*",
        F.filter(
            F.split(F.trim(F.coalesce(F.col(text_col), F.lit(""))), r"\s+"),
            lambda w: w != "",
        ).alias("__words"),
        F.filter(
            F.split(F.coalesce(F.col(text_col), F.lit("")), r"\n"),
            lambda l: F.trim(l) != "",
        ).alias("__lines"),
    )
    n_words = F.size(words)
    n_lines = F.size(lines)
    mean_wl = F.when(
        n_words > 0,
        F.aggregate(
            words, F.lit(0).cast("long"),
            lambda acc, w: acc + F.length(w),
        )
        / n_words.cast("double"),
    )
    n_symbol = F.size(
        F.filter(words, lambda w: w.contains("#") | w.contains("..."))
    )
    n_bullet = F.size(
        F.filter(
            lines,
            lambda l: F.trim(l).rlike(r"^([\-\*•‣◦])"),
        )
    )
    n_ellipsis = F.size(F.filter(lines, lambda l: F.trim(l).endswith("...")))
    n_alpha = F.size(F.filter(words, lambda w: w.rlike(r"\p{L}")))
    stop_hits = F.size(
        F.array_intersect(
            F.transform(words, lambda w: F.lower(w)),
            F.array(*[F.lit(s) for s in GOPHER_STOPWORDS]),
        )
    )

    base = staged.select(
        F.col(id_col),
        n_words.alias("n_words"),
        F.round(mean_wl, 6).alias("mean_word_len"),
        F.round(
            n_symbol / F.greatest(n_words, F.lit(1)).cast("double"), 6
        ).alias("symbol_word_ratio"),
        F.round(
            n_bullet / F.greatest(n_lines, F.lit(1)).cast("double"), 6
        ).alias("bullet_line_frac"),
        F.round(
            n_ellipsis / F.greatest(n_lines, F.lit(1)).cast("double"), 6
        ).alias("ellipsis_line_frac"),
        F.round(
            n_alpha / F.greatest(n_words, F.lit(1)).cast("double"), 6
        ).alias("alpha_word_frac"),
        stop_hits.alias("stopword_hits"),
    )
    out = (
        base.withColumn(
            "ok_word_count",
            F.col("n_words").between(min_words, max_words),
        )
        .withColumn(
            "ok_mean_word_len",
            F.coalesce(
                F.col("mean_word_len").between(
                    min_mean_word_len, max_mean_word_len
                ),
                F.lit(False),
            ),
        )
        .withColumn(
            "ok_symbol_ratio", F.col("symbol_word_ratio") < max_symbol_word_ratio
        )
        .withColumn(
            "ok_bullet_lines", F.col("bullet_line_frac") < max_bullet_line_frac
        )
        .withColumn(
            "ok_ellipsis_lines",
            F.col("ellipsis_line_frac") < max_ellipsis_line_frac,
        )
        .withColumn(
            "ok_alpha_words", F.col("alpha_word_frac") > min_alpha_word_frac
        )
        .withColumn(
            "ok_stopwords", F.col("stopword_hits") >= min_stopword_hits
        )
    )
    rules = [
        "ok_word_count", "ok_mean_word_len", "ok_symbol_ratio",
        "ok_bullet_lines", "ok_ellipsis_lines", "ok_alpha_words",
        "ok_stopwords",
    ]
    keep = None
    for r in rules:
        keep = F.col(r) if keep is None else (keep & F.col(r))
    return out.withColumn("gopher_keep", keep)


def ngram_novelty(
    df: DataFrame,
    n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Corpus-level n-gram novelty per document: of the doc's DISTINCT
    word n-grams, what fraction appears in NO other document
    (``novel_frac``), plus the mean document frequency of its n-grams
    (``mean_df`` — high values mark boilerplate assembled from
    corpus-common phrasing even when no single document matches). The
    diversity/memorization curation signal that pairs with the dedup
    tiers: near-dup detection finds documents that match each OTHER;
    novelty finds documents made of corpus-wide clichés.

    Output: ``(id_col, n_ngrams, novel_frac, mean_df)`` — one row per
    document with at least one n-gram (NULL/whitespace-only docs
    produce no row, same contract as the dedup tiers).

    Scale shape: scan-side shingle explode (shared ``word_shingles``
    builder — same normalization as MinHash, so the two signals are
    comparable), grams immediately folded to PORTABLE 64-bit hashes so
    the frequency groupBy, the join, and the per-doc aggregate all
    shuffle 8-byte longs instead of multi-word strings (frequencies
    over hashed grams equal raw-gram frequencies up to documented
    2⁻⁶⁴ collisions — the ``near_dup_store`` trade, and the hash stays
    md5-based so external oracles replay it); ONE map-side-combined
    groupBy for corpus document frequencies, one hash join against
    those counts (count side is one row per distinct n-gram; AQE
    handles hot-gram skew), one per-doc aggregate. O(total n-grams)
    shuffle — the dedup_lines cost class, inherent to any
    corpus-frequency signal.
    """
    from data_export_tool_spark.operators.dedup import (
        portable_hash64,
        word_shingles,
    )

    shingles = df.where(F.col(text_col).isNotNull()).select(
        F.col(id_col),
        F.explode(word_shingles(F.col(text_col), n)).alias("__g"),
    ).where(
        # concat_ws renders a NULL/empty token array as "" — that is
        # the absence of content, not an n-gram; counting it would hand
        # every blank doc a shared phantom gram
        F.col("__g") != ""
    ).select(id_col, portable_hash64(F.col("__g")).alias("__g64"))
    freqs = shingles.groupBy("__g64").agg(
        F.count(F.lit(1)).alias("__df")  # shingles are distinct per doc
    )
    return (
        shingles.join(freqs, on="__g64")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_ngrams"),
            F.avg((F.col("__df") == 1).cast("double")).alias("novel_frac"),
            F.avg(F.col("__df").cast("double")).alias("mean_df"),
        )
    )


def corpus_datasheet(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    lang_col: str | None = "lang",
    exact_distinct: bool = True,
) -> DataFrame:
    """One-call dataset-card numbers for a document corpus — the
    first table a training-data team publishes about a dump:

    ``(n_docs, n_null_text, total_tokens, mean_tokens,
    distinct_fingerprints, exact_dup_rate, mean_quality,
    lang_counts)`` as ONE row. ``exact_dup_rate`` is
    1 − distinct(normalized-content fingerprints)/n_docs — the
    exact-duplicate mass the dedup tier would remove. ``lang_counts``
    is a map of language → doc count (omitted when ``lang_col`` is
    None). All engine metrics reuse the shared column algebra
    (``token_count``, ``quality_score``, ``doc_fingerprint_md5``), so
    the datasheet is consistent with what the curation operators will
    actually do.

    Cost: ONE map-side-combined aggregation pass over a pruned scan
    (id, text, lang) — ``exact_distinct`` uses count(DISTINCT md5),
    one expand; set it False for the HLL sketch at 100 TB (±rsd, no
    expand). The lang histogram rides in the same pass as a
    count-per-value map aggregate built from a pivot-free
    ``map_from_entries(collect of (lang, count))`` second aggregate
    over the grouped counts — two jobs total, both tiny outputs.
    """
    from data_export_tool_spark.functions.text import (
        doc_fingerprint_md5,
        quality_score,
        token_count,
    )

    cols = [id_col, text_col] + ([lang_col] if lang_col else [])
    pruned = df.select(*cols)
    fp = doc_fingerprint_md5(F.coalesce(F.col(text_col), F.lit("")))
    distinct_fp = (
        F.countDistinct(fp)
        if exact_distinct
        else F.approx_count_distinct(fp)
    )
    stats = pruned.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.col(text_col).isNull().cast("long")).alias("n_null_text"),
        F.sum(
            F.when(
                F.col(text_col).isNotNull(), token_count(F.col(text_col))
            ).otherwise(F.lit(0))
        ).cast("long").alias("total_tokens"),
        distinct_fp.alias("distinct_fingerprints"),
        F.round(
            F.avg(
                F.when(
                    F.col(text_col).isNotNull(),
                    quality_score(F.col(text_col)),
                )
            ),
            6,
        ).alias("mean_quality"),
    ).withColumn(
        "mean_tokens",
        F.round(
            F.col("total_tokens") / F.greatest(F.col("n_docs"), F.lit(1)),
            6,
        ),
    ).withColumn(
        "exact_dup_rate",
        F.round(
            F.lit(1.0)
            - F.col("distinct_fingerprints")
            / F.greatest(F.col("n_docs"), F.lit(1)).cast("double"),
            6,
        ),
    )
    if lang_col is None:
        return stats.select(
            "n_docs", "n_null_text", "total_tokens", "mean_tokens",
            "distinct_fingerprints", "exact_dup_rate", "mean_quality",
        )
    lang_map = (
        pruned.groupBy(F.coalesce(F.col(lang_col), F.lit("<null>")).alias("__l"))
        .agg(F.count(F.lit(1)).alias("__c"))
        .agg(
            F.map_from_entries(
                F.array_sort(F.collect_list(F.struct("__l", "__c")))
            ).alias("lang_counts")
        )
    )
    return stats.crossJoin(lang_map).select(
        "n_docs", "n_null_text", "total_tokens", "mean_tokens",
        "distinct_fingerprints", "exact_dup_rate", "mean_quality",
        "lang_counts",
    )


def py_compression_ratio(text: str | None, level: int = 6) -> float | None:
    """Stdlib twin of ``compression_ratio`` for exact oracle replay."""
    import zlib

    if text is None:
        return None
    raw = text.encode("utf-8")
    if not raw:
        return None
    return len(zlib.compress(raw, level)) / len(raw)


def compression_ratio(
    df: DataFrame,
    text_col: str = "text",
    out_col: str = "compress_ratio",
    level: int = 6,
) -> DataFrame:
    """Append ``len(zlib.compress(utf8(text))) / len(utf8(text))`` —
    the classic corpus-curation repetitiveness signal (used by the
    published CCNet/Dolma-style recipes): templated or heavily
    repeated text compresses far below ~0.4, while natural prose
    lands around 0.4–0.7, so a low ratio flags boilerplate the
    n-gram rules (``repetition_stats``) can miss (long-period
    repetition beyond the trigram horizon) and a ratio near 1.0
    flags high-entropy non-text (base64 blobs, minified noise).

    NULL or empty text → NULL. Shape: a pure projection — one
    Arrow-batched pandas UDF whose per-row work is zlib's C core, no
    shuffle, all columns kept. The stdlib twin
    (``py_compression_ratio``) replays values bit-exactly, zlib being
    deterministic for a fixed level across platforms.
    """
    import pandas as pd
    import zlib

    if not (0 <= level <= 9):
        raise ValueError(f"zlib level must be in [0, 9]: {level}")

    def _ratio(texts):
        out = []
        for t in texts:
            if t is None:
                out.append(None)
                continue
            raw = t.encode("utf-8")
            if not raw:
                out.append(None)
                continue
            out.append(len(zlib.compress(raw, level)) / len(raw))
        return pd.Series(out, dtype="float64")

    _ratio.__annotations__ = {"texts": pd.Series, "return": pd.Series}
    udf = F.pandas_udf(_ratio, "double")
    return df.withColumn(out_col, udf(F.col(text_col)))


def unigram_logprob_scores(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    alpha: float = 0.5,
    vocab: DataFrame | None = None,
) -> DataFrame:
    """Per-document mean unigram negative log₂-probability — the
    dependency-free stand-in for the KenLM perplexity filters the
    published curation recipes (CCNet-class) rank documents with: a
    doc whose words are corpus-typical scores low (fluent/common), a
    doc full of rare garbage scores high, and a doc of endlessly
    repeated common words scores suspiciously low — use alongside the
    repetition rules, not instead of them.

    Model: add-``alpha`` smoothed corpus unigram LM over the shared
    ``TOKEN_SPLIT_RE`` pre-tokenization (``operators.bpe.word_counts``
    — ONE raw-text pass, map-side combined). ``p(w) = (c(w) + α) /
    (N + α·(V+1))`` with one reserved OOV type, so scoring OTHER
    corpora against this vocab (pass ``vocab=``) is well-defined.

    Scoring shape: explode doc words → broadcast-or-shuffle join with
    the vocab table on the word key → one per-doc aggregate. The
    vocab is Heaps-law-bounded (≪ corpus) and the join key is the
    word — Spark broadcasts it when small and hash-joins otherwise;
    no driver materialization. Output: ``(id_col, n_scored_tokens,
    mean_nll)`` — NULL/empty/whitespace docs get NULL mean_nll.
    """
    from data_export_tool_spark.operators.bpe import word_counts

    if vocab is None:
        vocab = word_counts(df, text_col)
    stats = vocab.agg(
        F.sum("cnt").alias("N"), F.count(F.lit(1)).alias("V")
    ).first()
    n_total, v_size = int(stats["N"] or 0), int(stats["V"] or 0)
    denom = n_total + alpha * (v_size + 1)
    if denom <= 0:
        raise ValueError("empty vocabulary: nothing to score against")

    from data_export_tool_spark.operators.ranking import TOKEN_SPLIT_RE

    words = df.select(
        F.col(id_col),
        F.explode(
            F.filter(
                F.split(F.lower(F.col(text_col)), TOKEN_SPLIT_RE),
                lambda t: F.length(t) > 0,
            )
        ).alias("word"),
    )
    nll = -F.log2(
        (F.coalesce(F.col("cnt"), F.lit(0)) + F.lit(float(alpha)))
        / F.lit(float(denom))
    )
    scored = (
        words.join(vocab, "word", "left")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_scored_tokens"),
            F.avg(nll).alias("mean_nll"),
        )
    )
    # docs with no scoreable tokens (NULL/empty text) keep a row
    return (
        df.select(id_col)
        .join(scored, id_col, "left")
        .select(
            id_col,
            F.coalesce(F.col("n_scored_tokens"), F.lit(0)).alias(
                "n_scored_tokens"
            ),
            "mean_nll",
        )
    )
