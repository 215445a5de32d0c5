"""Portable deterministic hex→integer hashing — the ``conv``-free path.

Every deterministic-selection primitive in this repo (sampling,
splits, SimHash, negative pairs, conformal partitions) derives an
integer from a slice of ``md5(key)``. The obvious Spark expression is
``F.conv(hex_slice, 16, 10)`` — but on this Spark 4.1 build (ansi on)
``conv`` inside a wide projection intermittently returned the value of
a DIFFERENT key than the one md5'd beside it (the
NumberConverter/UTF8String shared-buffer corruption class; first
observed and documented in ``operators/walks.py``). A silently flipped
hash is the worst failure mode possible for "leakage-safe" splits, so
NO correctness-critical path may use ``conv``.

The replacement is an explicit per-digit ascii fold in long
arithmetic: only immutable primitives (``ascii``, ``substring``,
integer ops), fully inside whole-stage codegen, and replayable in any
oracle as plain ``int(hex_slice, 16)`` (DuckDB:
``('0x' || hex_slice)::UBIGINT``). Cost is ~4·L primitive ops per row
for an L-digit slice — noise next to the md5 itself.

Limits: ``length`` ≤ 15 hex digits (16^15 < 2^63, so the fold never
overflows a signed long); callers needing 64 bits compose two 8-digit
folds (see ``operators/dedup.portable_hash64``).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = ["hex_fold", "md5_long"]


def hex_fold(hex_col: Column, start: int = 1, length: int = 8) -> Column:
    """Parse ``substring(hex_col, start, length)`` as a base-16 long.

    Equivalent to ``int(hex[start-1:start-1+length], 16)`` — the
    conv-free fold (module docstring). Lower-case hex input only (the
    output of ``md5``); ``length`` ≤ 15 so the result fits a signed
    long.
    """
    if not 1 <= length <= 15:
        raise ValueError(f"length must be in [1, 15]: {length}")
    sub = F.substring(hex_col, start, length)
    h = F.lit(0).cast("long")
    for i in range(length):
        c = F.ascii(F.substring(sub, i + 1, 1)).cast("long")
        # '0'-'9' → 0-9 (ascii 48-57); 'a'-'f' → 10-15 (ascii 97-102)
        v = c - 48 - F.when(c >= 97, F.lit(39)).otherwise(F.lit(0))
        h = h * 16 + v
    return h


def md5_long(key: Column, start: int = 9, length: int = 8) -> Column:
    """``int(md5(key)[start-1:start-1+length], 16)`` as a long — the
    standard deterministic row-key hash (defaults: low-order 32 bits,
    matching ``sampling.sample_bucket``'s published oracle contract)."""
    return hex_fold(F.md5(key), start, length)
