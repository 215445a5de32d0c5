"""Bloom-accelerated semi/anti joins — scan-side key pre-filtering.

The missing middle between a broadcast join (dim fits in memory raw)
and a full shuffle join (nothing fits): when the dim side's KEYS are
millions of values, their Bloom filter is a few MB — broadcastable —
so the fact scan can drop definitely-unmatched rows BEFORE the
shuffle. On a 0.1%-selective 100 TB semi join the shuffle carries
~0.1% of the corpus instead of all of it; the exact residual join
then only dedups the filter's false positives.

Build (the ``contamination.eval_ngram_bloom`` construction,
generalized to arbitrary keys): Kirsch-Mitzenmacher double hashing
over two ``xxhash64`` values, each partition sets bits into a local
numpy bitmap and emits only NONZERO 64-bit words, one
``groupBy(word).bit_or`` merges — the shuffle is bounded by the set-
bit count, never the key count. Probe: broadcast word array + one
Arrow-batched vectorized membership test.

Modes:

- ``bloom_semi_join(..., exact=True)`` (default) — EXACTLY
  ``facts.join(keys, 'left_semi')``: the bloom is a pre-filter, the
  residual semi join kills false positives. Plan-pinned: the exchange
  sits ABOVE the bloom filter.
- ``exact=False`` — approximate membership with the declared ``fpp``
  (no shuffle at all; the documented trade for e.g. candidate
  generation).
- ``bloom_anti_join`` — EXACT ``left_anti``: bloom-negative rows are
  definitely unmatched and bypass the join entirely; only
  bloom-positive rows (matched ∪ false positives) pay the anti join.

NULL fact keys: never match (semi drops them, anti keeps them —
ANSI semi/anti semantics, test-pinned).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

try:  # pragma: no cover - trivial registration
    import sys as _sys

    from pyspark import cloudpickle as _cloudpickle

    _cloudpickle.register_pickle_by_value(_sys.modules[__name__])
except Exception:
    pass

__all__ = ["build_key_bloom", "bloom_semi_join", "bloom_anti_join"]

_H2_SEED = 0x9E3779B9


def _hash_cols(key_col):
    return (
        F.xxhash64(key_col).alias("__h1"),
        F.xxhash64(key_col, F.lit(_H2_SEED)).alias("__h2"),
    )


def _params(n_items: int, fpp: float) -> tuple[int, int]:
    import math

    n_items = max(n_items, 1)
    n_bits = max(64, int(-n_items * math.log(fpp) / (math.log(2) ** 2)))
    n_bits = ((n_bits + 63) // 64) * 64
    n_hashes = max(1, round(n_bits / n_items * math.log(2)))
    return n_bits, n_hashes


def build_key_bloom(
    keys_df: DataFrame,
    key_col: str,
    fpp: float = 0.001,
    n_items: int | None = None,
):
    """Bloom filter over the DISTINCT non-null values of ``key_col``.
    Returns ``(n_bits, n_hashes, words uint64 ndarray)`` or None for
    an empty key set. ``n_items`` skips the sizing count when the
    caller already knows the cardinality (approximately is fine —
    fpp degrades gracefully)."""
    import numpy as np

    if not 0 < fpp < 1:
        raise ValueError(f"fpp must be in (0, 1): {fpp}")
    keys = keys_df.select(F.col(key_col)).where(
        F.col(key_col).isNotNull()
    ).distinct()
    if n_items is None:
        n_items = keys.count()
    if n_items == 0:
        return None
    n_bits, n_hashes = _params(n_items, fpp)
    n_words = n_bits // 64
    hashed = keys.select(*_hash_cols(F.col(key_col)))

    def to_words(batches):
        import pandas as pd

        for pdf in batches:
            bitmap = np.zeros(n_words, dtype=np.uint64)
            h1 = pdf["__h1"].to_numpy().astype(np.uint64)
            h2 = pdf["__h2"].to_numpy().astype(np.uint64)
            for i in range(n_hashes):
                pos = (h1 + np.uint64(i) * h2) % np.uint64(n_bits)
                np.bitwise_or.at(
                    bitmap,
                    (pos // np.uint64(64)).astype(np.int64),
                    np.uint64(1) << (pos % np.uint64(64)),
                )
            nz = np.nonzero(bitmap)[0]
            yield pd.DataFrame(
                {"w": nz.astype("int64"), "b": bitmap[nz].astype("int64")}
            )

    merged = (
        hashed.mapInPandas(to_words, schema="w long, b long")
        .groupBy("w")
        .agg(F.expr("bit_or(b)").alias("b"))
        .collect()
    )
    words = np.zeros(n_words, dtype=np.uint64)
    for r in merged:
        words[r["w"]] = np.uint64(r["b"] & 0xFFFFFFFFFFFFFFFF)
    return n_bits, n_hashes, words


def _probe_col(df: DataFrame, key_col: str, bloom):
    import numpy as np
    import pandas as pd

    n_bits, n_hashes, words = bloom
    b_words = df.sparkSession.sparkContext.broadcast(np.asarray(words))

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

    _probe.__annotations__ = {
        "h1": pd.Series, "h2": pd.Series, "return": pd.Series
    }
    might = F.pandas_udf(_probe, "boolean")
    h1c, h2c = _hash_cols(F.col(key_col))
    return might(h1c, h2c) & F.col(key_col).isNotNull()


def bloom_semi_join(
    facts: DataFrame,
    keys_df: DataFrame,
    key_col: str,
    fpp: float = 0.001,
    exact: bool = True,
    bloom=None,
) -> DataFrame:
    """See module docstring. Pass ``bloom`` (a ``build_key_bloom``
    result) to reuse a prebuilt filter across queries."""
    if bloom is None:
        bloom = build_key_bloom(keys_df, key_col, fpp)
    if bloom is None:  # empty key set: semi join matches nothing
        return facts.limit(0)
    pre = facts.where(_probe_col(facts, key_col, bloom))
    if not exact:
        return pre
    return pre.join(
        keys_df.select(key_col).where(F.col(key_col).isNotNull()).distinct(),
        key_col,
        "left_semi",
    )


def bloom_anti_join(
    facts: DataFrame,
    keys_df: DataFrame,
    key_col: str,
    fpp: float = 0.001,
    bloom=None,
) -> DataFrame:
    """EXACT ``left_anti`` with bloom short-circuit: bloom-negative
    rows (and NULL keys) bypass the join; only bloom-positive rows pay
    the exact anti join against the key set."""
    if bloom is None:
        bloom = build_key_bloom(keys_df, key_col, fpp)
    if bloom is None:  # empty key set: anti join keeps everything
        return facts
    probe = _probe_col(facts, key_col, bloom)
    definite_out = facts.where(~probe | F.col(key_col).isNull())
    maybe = facts.where(probe)
    survivors = maybe.join(
        keys_df.select(key_col).where(F.col(key_col).isNotNull()).distinct(),
        key_col,
        "left_anti",
    )
    return definite_out.unionByName(survivors)
