"""Skyline (Pareto frontier) query: the maximal vectors of a relation.

The multi-criteria shortlist primitive (Börzsönyi, Kossmann &
Stocker, "The Skyline Operator", ICDE 2001): keep every row not
DOMINATED by another — ``b`` dominates ``a`` when ``b`` is at least
as good on every criterion and strictly better on at least one.
"Cheapest-and-closest hotels", "fastest-and-smallest model configs",
"highest-quality-and-least-toxic documents" are all skylines; a
training-data pipeline uses it to shortlist candidates under several
quality scores without inventing a weighted blend.

Algorithm — the classic two-phase distributed skyline:

1. **Local skyline per partition** (``mapInPandas``, numpy): sort the
   partition lexicographically, then a dominance sweep — a point can
   only be dominated by sort-predecessors, so one pass against the
   growing local frontier suffices. A partition of n rows emits only
   its own frontier (typically ≪ n; for anti-correlated worst cases
   still bounded by the partition).
2. **Global merge**: the union of local frontiers gathers onto ONE
   partition (skylines are closed under union-then-filter: the global
   skyline is a subset of every-partition-local skylines) and the same
   sweep runs once more, exactly.

The gather is the honest bottleneck and is GUARDED: the merge stage
counts rows as batches stream through and raises past
``max_candidates`` (default 2M ≈ a few hundred MB of doubles) instead
of silently OOMing the one merge task — high-dimensional or
anti-correlated inputs legitimately have huge skylines and the error
says so. Rows with NULL in any criterion are excluded (incomparable
under dominance — documented, matches the oracle's ``WHERE ... NOT
NULL``). Ties (equal on every criterion) dominate nothing and both
survive, matching the strict-dominance oracle.

Oracle: DuckDB ``NOT EXISTS`` strict-dominance anti-join
(tests/test_skyline.py → OPCHECK ``skyline``).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["skyline", "py_skyline"]


def _block_nondominated(block: np.ndarray) -> np.ndarray:
    """Indices of rows of ``block`` dominated by no other row of
    ``block`` (exact: dominance is transitive, so testing against ALL
    rows — not just surviving ones — removes exactly the dominated
    set). Pairwise-vectorized; caller bounds the block size."""
    le = (block[:, None, :] <= block[None, :, :]).all(axis=2)
    lt = (block[:, None, :] < block[None, :, :]).any(axis=2)
    dominated = (le & lt).any(axis=0)
    return np.nonzero(~dominated)[0]


def _sweep(vals: np.ndarray) -> np.ndarray:
    """Indices (into the given order) of non-dominated rows, assuming
    ``vals`` is lexicographically sorted ascending (minimization).

    Block-vectorized two-level sweep (the predecessor rule — a point
    can only be dominated by sort-predecessors or exact ties, and ties
    never dominate — makes one forward pass exact): each block is
    first filtered against the accumulated frontier in chunked
    broadcast comparisons (no per-point Python loop, no per-point
    frontier copy — the old one-row-at-a-time sweep re-``vstack``-ed
    the whole frontier for EVERY candidate, an O(n·|frontier|·d)
    memcpy), then the survivors resolve intra-block dominance with one
    pairwise comparison matrix."""
    n, d = vals.shape
    keep_parts: list[np.ndarray] = []
    frontier = np.empty((0, d), dtype=vals.dtype)
    block_rows = 2048
    # ~8M candidate×frontier pairs per comparison chunk keeps the
    # boolean broadcast buffers around 25 MB regardless of skyline size
    pair_budget = 8_000_000
    for i0 in range(0, n, block_rows):
        block = vals[i0 : i0 + block_rows]
        alive = np.ones(len(block), dtype=bool)
        if len(frontier):
            step = max(1, pair_budget // len(block))
            for j0 in range(0, len(frontier), step):
                fc = frontier[j0 : j0 + step]
                le = (fc[:, None, :] <= block[None, :, :]).all(axis=2)
                lt = (fc[:, None, :] < block[None, :, :]).any(axis=2)
                alive &= ~(le & lt).any(axis=0)
                if not alive.any():
                    break
        idx = np.nonzero(alive)[0]
        if len(idx) == 0:
            continue
        survivors = idx[_block_nondominated(vals[i0 + idx])]
        keep_parts.append(i0 + survivors)
        frontier = np.concatenate([frontier, vals[i0 + survivors]])
    if not keep_parts:
        return np.empty(0, dtype=np.int64)
    return np.concatenate(keep_parts).astype(np.int64)


def py_skyline(rows: list[tuple], directions: list[str]) -> set:
    """Reference scorer: brute-force O(n²) strict-dominance filter over
    value tuples. Returns the SET of surviving tuples."""
    sign = [(-1.0 if d == "max" else 1.0) for d in directions]
    pts = [tuple(s * float(v) for s, v in zip(sign, r)) for r in rows]
    out = set()
    for i, a in enumerate(pts):
        dominated = False
        for j, b in enumerate(pts):
            if i == j:
                continue
            if all(x <= y for x, y in zip(b, a)) and any(
                x < y for x, y in zip(b, a)
            ):
                dominated = True
                break
        if not dominated:
            out.add(rows[i])
    return out


def skyline(
    df: DataFrame,
    cols: list[str],
    directions: list[str] | None = None,
    max_candidates: int = 2_000_000,
) -> DataFrame:
    """All non-dominated rows of ``df`` under the given criteria.

    ``directions[i]`` is ``'min'`` (default) or ``'max'`` per column.
    Returns the full input rows that survive; NULL-criterion rows are
    excluded.
    """
    if not cols:
        raise ValueError("cols must name at least one column")
    directions = directions or ["min"] * len(cols)
    if len(directions) != len(cols):
        raise ValueError(
            f"directions has {len(directions)} entries for {len(cols)} cols"
        )
    bad = [d for d in directions if d not in ("min", "max")]
    if bad:
        raise ValueError(f"directions must be 'min'/'max', got {bad}")
    sign = np.array(
        [(-1.0 if d == "max" else 1.0) for d in directions]
    )

    import functools

    clean = df.where(
        functools.reduce(
            lambda a, b: a & b, [F.col(c).isNotNull() for c in cols]
        )
    )
    schema = clean.schema

    def _filter(
        batches: Iterator[pd.DataFrame], guard: int | None
    ) -> Iterator[pd.DataFrame]:
        chunks = [b for b in batches if len(b)]
        if not chunks:
            return
        # per-partition materialization: bounded by the scan's
        # maxPartitionBytes (local phase) / by the guard (merge phase)
        pdf = pd.concat(chunks, ignore_index=True)
        if guard is not None and len(pdf) > guard:
            raise ValueError(
                f"skyline merge received {len(pdf)} candidates "
                f"(> max_candidates={guard}); the frontier itself is "
                "large — raise max_candidates or reduce dimensions"
            )
        vals = pdf[cols].to_numpy(dtype=np.float64) * sign
        order = np.lexsort(tuple(vals[:, k] for k in range(
            vals.shape[1] - 1, -1, -1
        )))
        keep = _sweep(vals[order])
        yield pdf.iloc[order[keep]]

    def _local(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        yield from _filter(batches, None)

    def _merge(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        yield from _filter(batches, max_candidates)

    local = clean.mapInPandas(_local, schema=schema)
    # repartition(1), not coalesce(1): coalesce is a narrow dependency and
    # would collapse scan + local sweep + merge into ONE task, serializing
    # the "parallel" local phase. The shuffle boundary keeps local sweeps
    # per-partition and ships only frontier rows to the single merge task.
    return local.repartition(1).mapInPandas(_merge, schema=schema)
