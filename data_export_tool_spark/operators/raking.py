"""Survey raking: iterative proportional fitting of row weights to
known margins.

The weighting step every survey/panel/eval-set pipeline needs: the
collected sample is demographically skewed, the POPULATION margins are
known (e.g. region shares from a census, device shares from telemetry),
and each row needs a weight so that every weighted margin matches its
target simultaneously — classic IPF / raking (Deming & Stephan 1940).

Scale shape
-----------
IPF never iterates over rows: a row's weight depends only on its CELL
(its combination of margin-column values), so ONE map-side-combinable
groupBy collapses the data to cell grain (≤ Π cardinalities rows,
enforced ≤ ``max_cells`` — margins are low-cardinality by nature),
the IPF loop runs on the driver over that metadata-sized table, and
ONE broadcast equi-join maps cell → weight back onto the rows. Raw
data is touched exactly twice.

Conventions (the replay oracle pins them)
-----------------------------------------
* Margin targets are SHARES (they are renormalized to sum to 1 per
  column); sample cells outside a margin's target set raise — an
  unknown category can't be raked to.
* NULL in a margin column is a category like any other IF the target
  includes a ``None`` key, else it raises.
* Convergence: max absolute deviation of every weighted margin share
  from target < ``tol``, else ``max_iter`` sweeps (one sweep =
  adjusting each margin once, in the given dict order).
* Output weights are normalized to MEAN 1 over the input rows (so
  weighted counts stay on the raw-count scale); per-cell weight =
  target-driven factor product, identical for every row of the cell.
* Degenerate: a margin category with target share > 0 but zero sample
  rows raises (IPF cannot create mass) — disclosed, not silently
  renormalized.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["rake_weights", "py_ipf"]


def py_ipf(
    cells: list[tuple[tuple, int]],
    margins: list[dict],
    max_iter: int = 50,
    tol: float = 1e-9,
) -> tuple[list[float], int, float]:
    """Reference IPF over ``(cell-value tuple, count)`` rows and a
    list of per-column ``{value: target_share}`` dicts (shares already
    normalized) — the exact driver arithmetic of ``rake_weights``.
    Returns (per-cell weights aligned with ``cells``, sweeps,
    max_deviation). Weights start at 1 and are NOT mean-normalized
    here (the caller does that at row grain)."""
    k = len(margins)
    n_total = float(sum(c for _, c in cells))
    w = [1.0] * len(cells)
    sweeps = 0
    dev = float("inf")

    def margin_shares(dim: int) -> dict:
        acc: dict = {}
        for (vals, cnt), wi in zip(cells, w):
            acc[vals[dim]] = acc.get(vals[dim], 0.0) + wi * cnt
        tot = sum(acc.values())
        return {v: s / tot for v, s in acc.items()}

    for sweeps in range(1, max_iter + 1):
        for dim in range(k):
            cur = margin_shares(dim)
            target = margins[dim]
            factors = {}
            for v, t in target.items():
                have = cur.get(v, 0.0)
                if t > 0.0 and have <= 0.0:
                    raise ValueError(
                        f"margin column {dim}: category {v!r} has target "
                        f"share {t} but zero sample mass"
                    )
                factors[v] = t / have if have > 0.0 else 0.0
            for i, (vals, _) in enumerate(cells):
                w[i] *= factors[vals[dim]]
        dev = 0.0
        for dim in range(k):
            cur = margin_shares(dim)
            for v, t in margins[dim].items():
                dev = max(dev, abs(cur.get(v, 0.0) - t))
        if dev < tol:
            break
    # rescale so the weighted total equals the raw total
    tot_w = sum(wi * cnt for (_, cnt), wi in zip(cells, w))
    scale = n_total / tot_w if tot_w > 0.0 else 1.0
    return [wi * scale for wi in w], sweeps, dev


def rake_weights(
    df: DataFrame,
    margins: dict,
    weight_col: str = "rake_weight",
    max_iter: int = 50,
    tol: float = 1e-9,
    max_cells: int = 1_000_000,
) -> DataFrame:
    """Append an IPF-raked ``weight_col`` to ``df``.

    ``margins`` maps column name → ``{value: target_share}``; shares
    per column are renormalized to 1. Sample values not present in a
    column's target dict raise (recode upstream). Cost: one cell-grain
    groupBy + driver IPF + one broadcast join back.
    """
    cols = list(margins)
    if not cols:
        raise ValueError("rake_weights needs at least one margin column")
    norm_margins = []
    for c in cols:
        t = dict(margins[c])
        if not t:
            raise ValueError(f"margin for {c!r} is empty")
        if any(s < 0 for s in t.values()):
            raise ValueError(f"margin for {c!r} has negative shares")
        tot = float(sum(t.values()))
        if tot <= 0:
            raise ValueError(f"margin for {c!r} has no mass")
        norm_margins.append({v: s / tot for v, s in t.items()})

    cell_rows = df.groupBy(*cols).agg(F.count(F.lit(1)).alias("__cnt"))
    collected = cell_rows.limit(max_cells + 1).collect()
    if len(collected) > max_cells:
        raise ValueError(
            f"rake_weights: > {max_cells} distinct margin cells; margins "
            "must be low-cardinality (recode upstream)"
        )
    cells = []
    for r in collected:
        vals = tuple(r[c] for c in cols)
        for dim, c in enumerate(cols):
            if vals[dim] not in norm_margins[dim]:
                raise ValueError(
                    f"sample value {vals[dim]!r} in column {c!r} has no "
                    "margin target (recode or add it)"
                )
        cells.append((vals, int(r["__cnt"])))
    if not cells:
        raise ValueError("no rows to rake")
    weights, _sweeps, dev = py_ipf(cells, norm_margins, max_iter, tol)
    if dev >= tol * 10 and dev > 1e-6:
        # IPF converges for consistent targets; a large residual means
        # the targets are mutually inconsistent with the sample support
        import warnings

        warnings.warn(
            f"rake_weights: margins not met to tol (max dev {dev:.2e}) "
            f"after {max_iter} sweeps",
            stacklevel=2,
        )
    spark = df.sparkSession
    wtab = spark.createDataFrame(
        [(*vals, wi) for (vals, _), wi in zip(cells, weights)],
        df.select(*cols).schema.add("__w", "double"),
    )
    # NULL is a legal raked category (when the target carries a None
    # key), so the join must be null-safe per margin column
    wtab = wtab.select(
        *[F.col(c).alias(f"__k_{c}") for c in cols], "__w"
    )
    cond = None
    for c in cols:
        piece = F.col(c).eqNullSafe(F.col(f"__k_{c}"))
        cond = piece if cond is None else (cond & piece)
    joined = df.join(F.broadcast(wtab), on=cond, how="left")
    return joined.withColumn(weight_col, F.col("__w")).drop(
        "__w", *[f"__k_{c}" for c in cols]
    )
