"""Benchmark decontamination: n-gram overlap between a training corpus
and an evaluation/benchmark set (extended large-scale surface).

The standard LLM-pipeline hygiene step: any training document sharing
too many word n-grams with a held-out benchmark is flagged (and usually
dropped) so the benchmark stays uncontaminated. Semantics follow the
widely-published recipe (exact n-gram collision, n around 8-13 for
natural text; configurable here): per training document, the fraction
of its DISTINCT n-grams that also occur anywhere in the eval set.

Scale design (100 TB training corpus, MB-GB eval set):

- The eval side is reduced to DISTINCT n-gram strings once — benchmark
  suites are tiny relative to the corpus, so this side is broadcast by
  default (``broadcast_eval=True``); flip it off to get a plain
  shuffle-on-ngram equi-join when the eval set is genuinely large.
- The training side explodes each document's distinct shingle array,
  LEFT joins the eval n-grams to pick up a hit marker, and a single
  map-side-combining aggregation counts n-grams + hits per document
  in one pass — no second corpus branch, no join-back, no
  per-document state, and no skew beyond the n-gram key distribution
  itself (hot n-grams only multiply by the EVAL side's distinct set,
  which is 1 per n-gram by construction).
- Nothing ever shuffles document bodies: after shingling, only
  (doc_id, ngram) pairs and small count rows move.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from data_export_tool_spark.operators.dedup import word_shingles


def eval_ngrams(
    eval_df: DataFrame, text_col: str = "text", n: int = 5
) -> DataFrame:
    """The eval set's distinct word n-grams — one ``ngram`` column.

    This is the small side of the contamination join; dedup happens
    here (single shuffle over the eval set only) so the train-side
    join multiplies each hot n-gram by exactly 1.
    """
    return (
        eval_df.select(
            F.explode(word_shingles(F.col(text_col), n)).alias("ngram")
        )
        # a doc that normalizes to empty (null/whitespace/punct-only)
        # produces the single shingle "" — not an n-gram; without this
        # filter every empty train doc would "collide" with an empty
        # eval doc at contamination 1.0
        .filter(F.col("ngram") != "")
        .distinct()
    )


def contamination_scores(
    train_df: DataFrame,
    eval_df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 5,
    threshold: float = 0.2,
    broadcast_eval: bool = True,
    keep_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Per-training-document benchmark-overlap scores.

    Returns one row per training document:
    ``id_col``, ``n_ngrams`` (distinct n-grams in the doc),
    ``n_matched`` (of those, how many occur in the eval set),
    ``contamination`` (= matched/total, rounded to 6 dp), and
    ``contaminated`` (contamination >= threshold).

    ``decontaminate`` filters the corpus with these scores; exposing
    the scores (not just the verdict) is deliberate — threshold tuning
    is an offline analyst step at this scale, not a re-run of the join.
    ``keep_cols`` are additional training columns carried through
    (metadata like source/lang; never the text body).

    Single pass over the corpus: each exploded training n-gram LEFT
    joins the (broadcast) eval set picking up a hit marker, and one
    map-side-combining aggregation counts rows + hits per document.
    Zero-overlap documents never leave the pipeline (their exploded
    rows survive the left join), so there is no second corpus branch
    and no join-back — the diamond-plan shape that would scan and
    shingle a 100 TB corpus twice.
    """
    ev = eval_ngrams(eval_df, text_col, n).withColumn("_hit", F.lit(1))
    if broadcast_eval:
        ev = F.broadcast(ev)

    # the shingle array is built exactly ONCE (only the explode
    # consumes it — a separate size() projection would get the whole
    # normalize/shingle expression inlined a second time by
    # CollapseProject); because shingles are distinct per document,
    # n_ngrams is simply the exploded row count per document
    exploded = train_df.select(
        F.col(id_col),
        *[F.col(c) for c in keep_cols],
        F.explode(word_shingles(F.col(text_col), n)).alias("ngram"),
    )

    scored = (
        exploded.join(ev, "ngram", "left")
        .groupBy(id_col, *keep_cols)
        .agg(
            F.count(F.lit(1)).cast("int").alias("n_ngrams"),
            F.coalesce(F.sum("_hit"), F.lit(0)).alias("n_matched"),
        )
    )

    contamination = F.round(
        F.col("n_matched") / F.greatest(F.col("n_ngrams"), F.lit(1)), 6
    )
    return scored.withColumn("contamination", contamination).withColumn(
        "contaminated", F.col("contamination") >= F.lit(threshold)
    )


#: second-hash seed for the bloom double-hashing scheme (position_i =
#: (h1 + i·h2) mod m, Kirsch–Mitzenmacher); h1 = xxhash64(ngram), h2 =
#: xxhash64(ngram, SEED) — both JVM-side, so build and probe sides can
#: never disagree on the hash
_BLOOM_H2_SEED = 0x9E3779B9


def _bloom_params(n_items: int, fpp: float) -> tuple[int, int]:
    """(n_bits rounded up to a multiple of 64, n_hashes) for the
    standard optimal sizing m = −n·ln(p)/ln²2, k = ln2·m/n."""
    import math

    m = max(64, int(-n_items * math.log(fpp) / (math.log(2) ** 2)))
    m = ((m + 63) // 64) * 64
    k = max(1, round(math.log(2) * m / n_items))
    return m, k


def _bloom_hash_cols(ngram_col):
    return (
        F.xxhash64(ngram_col).alias("__h1"),
        F.xxhash64(ngram_col, F.lit(_BLOOM_H2_SEED)).alias("__h2"),
    )


def eval_ngram_bloom(
    eval_df: DataFrame,
    text_col: str = "text",
    n: int = 5,
    fpp: float = 0.001,
):
    """Bloom filter over the eval set's distinct n-grams, built
    DISTRIBUTIVELY from public primitives (Spark 4 does not register
    ``bloom_filter_agg``/``might_contain`` as SQL-callable): hashes
    are JVM ``xxhash64`` twins, each partition sets its bits into a
    local numpy bitmap and emits only its NONZERO 64-bit words
    ``(word_idx, bits)``, and one ``groupBy(word_idx).bit_or`` merges
    them — shuffle bounded by the eval set's set-bit count, never the
    corpus; the driver assembles the final word array.

    Returns ``((n_bits, n_hashes, words uint64 ndarray) | None,
    n_items)``; None when the eval set is empty. A few MB for millions
    of n-grams vs GBs for the raw string set — build once per
    benchmark suite and reuse."""
    import numpy as np

    ev = eval_ngrams(eval_df, text_col, n)
    n_items = ev.count()
    if n_items == 0:
        return None, 0
    n_bits, n_hashes = _bloom_params(n_items, fpp)
    hashed = ev.select(*_bloom_hash_cols(F.col("ngram")))

    def to_words(batches):
        import pandas as pd

        words = np.zeros(n_bits // 64, dtype=np.uint64)
        for pdf in batches:
            if len(pdf) == 0:
                continue
            h1 = pdf["__h1"].to_numpy().astype(np.uint64)
            h2 = pdf["__h2"].to_numpy().astype(np.uint64)
            for i in range(n_hashes):
                pos = (h1 + np.uint64(i) * h2) % np.uint64(n_bits)
                np.bitwise_or.at(
                    words, (pos // 64).astype(np.int64),
                    np.uint64(1) << (pos % np.uint64(64)),
                )
        nz = np.flatnonzero(words)
        # int64 view: Spark longs are signed; the probe side views back
        yield pd.DataFrame(
            {"word_idx": nz.astype("int64"),
             "bits": words[nz].view(np.int64)}
        )

    merged = (
        hashed.mapInPandas(to_words, "word_idx long, bits long")
        .groupBy("word_idx")
        .agg(F.expr("bit_or(bits)").alias("bits"))
        .collect()
    )
    words = np.zeros(n_bits // 64, dtype=np.int64)
    for r in merged:
        words[r["word_idx"]] = r["bits"]
    return (n_bits, n_hashes, words.view(np.uint64)), n_items


def contamination_scores_bloom(
    train_df: DataFrame,
    eval_df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 5,
    threshold: float = 0.2,
    fpp: float = 0.001,
    keep_cols: tuple[str, ...] = (),
    eval_bloom=None,
) -> DataFrame:
    """``contamination_scores`` for eval sets TOO BIG TO BROADCAST raw:
    identical output contract and values (a Bloom filter has no false
    negatives, and every candidate is still exactly verified), but the
    n-gram join's left side is pruned SCAN-SIDE by an Arrow-batched
    bloom membership test over JVM xxhash64 twins first, so the shuffle
    carries only the (rare) candidate postings instead of every
    (doc, n-gram) pair in the corpus — at 100 TB that is the
    difference between shuffling a few GB and shuffling the corpus
    n-gram-expanded.

    Plan shape: two corpus scans (a cheap ``size(shingles)`` count
    projection, and the pruned explode → exact join), plus one tiny
    per-doc join-back. The second scan is deliberate: it is far
    cheaper than the alternative — shuffling the full n-gram explode —
    and documents' bodies never move either way. Pass ``eval_bloom``
    (the ``(n_bits, n_hashes, words)`` tuple from ``eval_ngram_bloom``)
    to amortize the filter across corpus partitions/runs.
    """
    import numpy as np
    import pandas as pd

    if eval_bloom is None:
        eval_bloom, _ = eval_ngram_bloom(eval_df, text_col, n, fpp)
    counts = train_df.select(
        F.col(id_col),
        *[F.col(c) for c in keep_cols],
        F.size(word_shingles(F.col(text_col), n)).alias("n_ngrams"),
    )
    if eval_bloom is None:  # empty eval set: nothing can match
        return (
            counts.withColumn("n_matched", F.lit(0).cast("long"))
            .withColumn("contamination", F.lit(0.0))
            .withColumn("contaminated", F.lit(False))
        )
    n_bits, n_hashes, words = eval_bloom
    b_words = train_df.sparkSession.sparkContext.broadcast(np.asarray(words))

    def _probe(h1, h2):
        w = b_words.value
        h1u = h1.to_numpy().astype(np.uint64)
        h2u = h2.to_numpy().astype(np.uint64)
        ok = np.ones(len(h1u), dtype=bool)
        for i in range(n_hashes):
            pos = (h1u + np.uint64(i) * h2u) % np.uint64(n_bits)
            bits = w[(pos // np.uint64(64)).astype(np.int64)]
            ok &= ((bits >> (pos % np.uint64(64))) & np.uint64(1)).astype(bool)
        return pd.Series(ok)

    # REAL annotation objects: `from __future__ import annotations`
    # stringifies inline hints, which pandas_udf's inference rejects
    _probe.__annotations__ = {"h1": pd.Series, "h2": pd.Series, "return": pd.Series}
    might_contain = F.pandas_udf(_probe, "boolean")

    ev = eval_ngrams(eval_df, text_col, n)
    h1c, h2c = _bloom_hash_cols(F.col("ngram"))
    cands = (
        train_df.select(
            F.col(id_col),
            F.explode(word_shingles(F.col(text_col), n)).alias("ngram"),
        )
        .where(might_contain(h1c, h2c))
    )
    hits = (
        cands.join(ev, "ngram")  # exact verify: kills bloom false positives
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_matched"))
    )
    scored = counts.join(hits, id_col, "left").withColumn(
        "n_matched", F.coalesce(F.col("n_matched"), F.lit(0))
    )
    contamination = F.round(
        F.col("n_matched") / F.greatest(F.col("n_ngrams"), F.lit(1)), 6
    )
    return scored.withColumn("contamination", contamination).withColumn(
        "contaminated", F.col("contamination") >= F.lit(threshold)
    )


def decontaminate(
    train_df: DataFrame,
    eval_df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 5,
    threshold: float = 0.2,
    broadcast_eval: bool = True,
) -> DataFrame:
    """The training corpus with contaminated documents removed.

    Keeps the full training schema; drops rows whose distinct-n-gram
    overlap with the eval set is at or above ``threshold``.
    """
    flagged = contamination_scores(
        train_df, eval_df, id_col, text_col, n, threshold, broadcast_eval
    ).where(F.col("contaminated"))
    return train_df.join(
        flagged.select(id_col), id_col, "left_anti"
    )
