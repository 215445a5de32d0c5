"""Isolation Forest anomaly scoring (Liu, Ting & Zhou 2008).

The unsupervised point-anomaly tier beside the per-key time-series
detectors (``timeseries.detect_anomalies`` is "this KEY deviates from
ITS OWN history"; iForest is "this ROW is unlike the corpus" over
arbitrary numeric features): anomalies are isolated by FEW random
splits, so the score is the average tree depth at which a row
separates, normalized by the expected BST depth
``c(n) = 2·H(n−1) − 2(n−1)/n``; score = 2^(−E[depth]/c(ψ)) ∈ (0, 1],
> ~0.6 suspicious.

Division of labor (the IVF/PQ train-vs-apply contract):

- **fit** — the ORIGINAL paper's recipe is already bounded: each tree
  is built on a ψ=256-row subsample, so training is driver-side numpy
  over ``n_trees`` deterministic md5-ordered subsamples (disjoint
  slices of one hash-ordered sample — replayable, no RNG state;
  splits use seeded splitmix64 uniforms, so an external oracle
  regenerates every tree bit-for-bit). The model is a plain dict of
  array-encoded trees (JSON-portable).
- **score** — one Arrow-batched ``pandas_udf`` pass: vectorized
  traversal (numpy index arithmetic per level over the whole batch,
  ~8·n_trees ops/row — a Python loop per ROW would be the slow path
  this repo bans). No shuffle; the scan stays whole-stage until the
  UDF projection.

NULL policy: a NULL feature routes to the LEFT child at every split
on that feature (documented contract, mirrors boost.py); rows that
are entirely NULL still score (they follow left spines — typically
isolated fast, i.e. flagged, which is the conservative reading for
malformed rows).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

try:  # pragma: no cover - trivial registration
    import sys as _sys

    from pyspark import cloudpickle as _cloudpickle

    _cloudpickle.register_pickle_by_value(_sys.modules[__name__])
except Exception:
    pass

__all__ = ["iforest_fit", "iforest_score"]


def _splitmix(seed: int):
    """Deterministic uniform stream in [0, 1) — splitmix64 (the
    similarity.py hyperplane generator's mixer)."""
    x = seed & 0xFFFFFFFFFFFFFFFF

    def nxt() -> float:
        nonlocal x
        x = (x + 0x9E3779B97F4A7C15) & 0xFFFFFFFFFFFFFFFF
        z = x
        z = ((z ^ (z >> 30)) * 0xBF58476D1CE4E5B9) & 0xFFFFFFFFFFFFFFFF
        z = ((z ^ (z >> 27)) * 0x94D049BB133111EB) & 0xFFFFFFFFFFFFFFFF
        z = z ^ (z >> 31)
        return z / 2**64

    return nxt


def _c(n: int) -> float:
    """Expected unsuccessful-search depth in a BST of n points."""
    if n <= 1:
        return 0.0
    h = math.log(n - 1) + 0.5772156649015329
    return 2.0 * h - 2.0 * (n - 1) / n


def _build_tree(X, rng, max_depth: int) -> dict:
    """Array-encoded isolation tree: node i has feature[i]/thresh[i],
    children 2i+1 / 2i+2; feature −1 marks a leaf storing its size."""
    import numpy as np

    n_nodes = 2 ** (max_depth + 1) - 1
    feat = [-1] * n_nodes
    thr = [0.0] * n_nodes
    size = [0] * n_nodes

    def build(node: int, idx, depth: int) -> None:
        size[node] = len(idx)
        if depth >= max_depth or len(idx) <= 1:
            return
        sub = X[idx]
        lo, hi = sub.min(0), sub.max(0)
        splittable = [j for j in range(X.shape[1]) if hi[j] > lo[j]]
        if not splittable:
            return
        j = splittable[int(rng() * len(splittable)) % len(splittable)]
        t = lo[j] + rng() * (hi[j] - lo[j])
        feat[node] = j
        thr[node] = float(t)
        mask = sub[:, j] <= t
        build(2 * node + 1, idx[np.where(mask)[0]], depth + 1)
        build(2 * node + 2, idx[np.where(~mask)[0]], depth + 1)

    import numpy as np

    build(0, np.arange(len(X)), 0)
    return {"feature": feat, "threshold": thr, "size": size}


def iforest_fit(
    df: DataFrame,
    feature_cols: list[str],
    n_trees: int = 32,
    subsample: int = 256,
    seed: int = 42,
) -> dict:
    """Fit on ``n_trees`` disjoint slices of ONE md5-ordered sample
    (NULL features impute to the slice median for BOUNDS only — splits
    never see NULLs; scoring routes them left). Returns a
    JSON-portable model dict."""
    import numpy as np

    if not feature_cols:
        raise ValueError("feature_cols must name at least one column")
    if n_trees < 1 or subsample < 2:
        raise ValueError("n_trees >= 1 and subsample >= 2 required")
    cap = n_trees * subsample
    sample_pd = (
        df.select(*[F.col(c).cast("double") for c in feature_cols])
        .orderBy(
            F.md5(F.concat_ws("␟", *[F.col(c).cast("string") for c in feature_cols])),
            *feature_cols,
        )
        .limit(cap)
        .toPandas()
    )
    if sample_pd.empty:
        raise ValueError("iforest_fit: no rows")
    X = sample_pd.to_numpy(dtype="float64")
    med = np.nanmedian(X, axis=0)
    med = np.where(np.isnan(med), 0.0, med)
    X = np.where(np.isnan(X), med, X)
    psi = min(subsample, len(X))
    max_depth = max(1, int(math.ceil(math.log2(psi))))
    rng = _splitmix(seed)
    trees = []
    for t in range(n_trees):
        lo = (t * psi) % len(X)
        sl = X[lo : lo + psi]
        if len(sl) < psi:  # wrap the tail slice
            sl = np.vstack([sl, X[: psi - len(sl)]])
        trees.append(_build_tree(sl, rng, max_depth))
    return {
        "features": list(feature_cols),
        "psi": int(psi),
        "max_depth": int(max_depth),
        "trees": trees,
    }


def iforest_score(
    df: DataFrame, model: dict, out_col: str = "anomaly_score"
) -> DataFrame:
    """Append the iForest score — one Arrow pass, vectorized per-level
    traversal (module docstring)."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    feats = model["features"]
    cn = _c(model["psi"])
    depth_cap = model["max_depth"]
    tree_feat = [np.asarray(t["feature"], dtype="int64") for t in model["trees"]]
    tree_thr = [np.asarray(t["threshold"], dtype="float64") for t in model["trees"]]
    tree_size = [np.asarray(t["size"], dtype="int64") for t in model["trees"]]
    # c(size) lookup table: leaf adjustments become one vectorized
    # index instead of a per-row python call
    c_table = np.asarray([_c(s) for s in range(model["psi"] + 1)])

    def score(s):
        X = np.column_stack(
            [s.iloc[:, i].to_numpy(dtype="float64") for i in range(len(feats))]
        )
        n = len(X)
        total = np.zeros(n)
        for feat, thr, size in zip(tree_feat, tree_thr, tree_size):
            node = np.zeros(n, dtype="int64")
            depth = np.zeros(n)
            done = np.zeros(n, dtype=bool)
            for _ in range(depth_cap):
                f = feat[node]
                leaf = (f < 0) & ~done
                if leaf.any():
                    # leaf adjustment: + c(leaf size), table lookup
                    total[leaf] += depth[leaf] + c_table[size[node[leaf]]]
                    done |= leaf
                live = ~done
                if not live.any():
                    break
                fv = X[np.arange(n), np.clip(f, 0, None)]
                go_left = np.isnan(fv) | (fv <= thr[node])
                node = np.where(
                    live, np.where(go_left, 2 * node + 1, 2 * node + 2), node
                )
                depth = np.where(live, depth + 1, depth)
            # rows that ran out of depth: leaf at the cap
            live = ~done
            if live.any():
                total[live] += depth[live] + c_table[size[node[live]]]
        avg = total / len(tree_feat)
        return pd.Series(2.0 ** (-avg / cn) if cn > 0 else np.ones(n))

    # REAL annotation objects: `from __future__ import annotations`
    # stringifies inline hints, which pandas_udf's inference rejects
    score.__annotations__ = {"s": pd.DataFrame, "return": pd.Series}
    score = pandas_udf(score, "double")

    return df.withColumn(
        out_col,
        F.round(
            score(F.struct(*[F.col(c).cast("double") for c in feats])), 6
        ),
    )
