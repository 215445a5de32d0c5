"""Distributed corpus clustering: k-means over an embedding column.

The curation recipes that need cluster structure — SemDeDup prototypes
(cluster-then-dedup-within), topic-balanced mixture sampling, IVF cell
layouts — all reduce to Lloyd's iterations over a 100 TB embedding
table. ``pyspark.ml.clustering.KMeans`` exists, but it is RDD/MLlib
machinery with its own Vector type; this module keeps the engine's
DataFrame-native column types (``array<float/double>``) and makes every
round's data movement explicit and minimal:

- **assignment** is a scalar Arrow pandas UDF (one BLAS matmul per
  batch against the broadcast centroid matrix) — a pure projection, no
  shuffle, all input columns preserved.
- **re-estimation** never shuffles vectors: the same Arrow pass reduces
  each batch to per-cell partial sums (``k × (dim+1)`` numbers per
  batch — a manual map-side combine), and one tiny ``groupBy(cell)``
  aggregate merges the partials. Per-iteration shuffle volume is
  O(batches · k · dim) scalars, independent of row count.
- **the driver** holds only the k×dim centroid matrix.

Iterating re-scans the input once per round, exactly like MLlib; the
fit projects the id/vector columns only and (by default) persists that
narrow relation for the loop, unpersisting before returning. Init is
the deterministic hash-ordered sample (same policy as IVF training:
first rows by ``md5(id)``), so an external oracle can replay the whole
fit bit-for-bit — no RNG over the data anywhere.

Practical dim note: re-estimation builds ``dim`` aggregate columns;
whole-stage codegen handles embedding-sized dims (≤ ~1024) comfortably.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import IntegerType

# The Arrow-batch functions below reference module-level helpers
# (_as_matrix, _unit_rows); ship the module BY VALUE so executors
# whose Python workers lack this package on sys.path can still run
# them (same policy as streaming/events.py).
try:  # pragma: no cover - trivial registration
    import sys as _sys

    from pyspark import cloudpickle as _cloudpickle

    _cloudpickle.register_pickle_by_value(_sys.modules[__name__])
except Exception:
    pass


def _as_matrix(series):
    import numpy as np

    return np.stack(series.to_numpy()).astype("float64")


def _unit_rows(M):
    import numpy as np

    n = np.linalg.norm(M, axis=1, keepdims=True)
    return np.where(n > 0, M / np.where(n > 0, n, 1.0), M)


def maximin_init(X, k: int, spherical: bool = True):
    """Deterministic farthest-point (maximin) seeding over a sample:
    start from the sample's first row, then repeatedly add the point
    farthest from its nearest chosen seed (ties → first index). The
    classic kmeans++ hardened to determinism — no RNG, so an external
    oracle replays it exactly; unlike Forgy-k it cannot draw every
    seed from one dense cluster."""
    import numpy as np

    X = np.asarray(X, dtype=np.float64)
    if spherical:
        X = _unit_rows(X)

    def dist_to(j):
        if spherical:
            return 1.0 - X @ X[j]
        d = X - X[j]
        return (d * d).sum(axis=1)

    chosen = [0]
    d = dist_to(0)
    for _ in range(min(k, len(X)) - 1):
        nxt = int(np.argmax(d))
        chosen.append(nxt)
        d = np.minimum(d, dist_to(nxt))
    return X[chosen].copy()


def assign_clusters(
    df: DataFrame,
    centroids,
    vec_col: str = "embedding",
    out_col: str = "cluster",
    spherical: bool = True,
) -> DataFrame:
    """Append ``out_col``: the index of the nearest centroid (cosine
    when ``spherical`` — rows and centroids unit-normalized first —
    else squared Euclidean), ties to the lowest index. A projection:
    no shuffle, every input column kept. NULL/empty vectors get NULL."""
    import numpy as np
    import pandas as pd

    C = np.asarray(centroids, dtype=np.float64)
    if spherical:
        C = _unit_rows(C)
    sc = df.sparkSession.sparkContext
    b_c = sc.broadcast(C)

    def _nearest(vecs):
        Cm = b_c.value
        ok = vecs.map(lambda v: v is not None and len(v) > 0)
        out = pd.Series([None] * len(vecs), dtype="object")
        if ok.any():
            X = _as_matrix(vecs[ok])
            if spherical:
                X = _unit_rows(X)
                # unit rows: argmax cosine == argmin distance; argmax
                # on the negated matrix keeps first-index tie-break
                lab = np.argmin(-(X @ Cm.T), axis=1)
            else:
                d2 = (X * X).sum(1, keepdims=True) - 2 * X @ Cm.T + (
                    Cm * Cm
                ).sum(1)
                lab = np.argmin(d2, axis=1)
            out[np.flatnonzero(ok.to_numpy())] = lab
        return out.astype("Int32")

    # set REAL annotation objects: `from __future__ import annotations`
    # stringifies inline hints, which pandas_udf's signature inference
    # rejects
    _nearest.__annotations__ = {"vecs": pd.Series, "return": pd.Series}
    nearest = F.pandas_udf(_nearest, IntegerType())
    return df.withColumn(out_col, nearest(F.col(vec_col).cast("array<double>")))


def kmeans_fit(
    df: DataFrame,
    n_clusters: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    iters: int = 10,
    tol: float = 1e-6,
    spherical: bool = True,
    persist: bool = True,
):
    """Distributed Lloyd's. Returns the final ``n_clusters × dim``
    centroid array (a plain nested list — broadcastable, memoizable,
    replayable).

    Init: deterministic maximin seeding (``maximin_init``) over the
    first ``max(64·k, 1024)`` rows by ``md5(id)`` — a hash-scattered
    sample, farthest-point-selected, so seeds spread across the real
    cluster structure without any RNG. Each round:
    one Arrow pass emits per-batch per-cell partial sums, one
    metadata-sized aggregate merges them, the driver forms the new
    centroids (empty cells keep their previous centroid; spherical
    fits re-normalize). Stops early when the max centroid movement
    drops below ``tol``.
    """
    import numpy as np

    if n_clusters < 1:
        raise ValueError(f"n_clusters must be >= 1: {n_clusters}")
    # vector validity is masked Arrow-side inside each pass (a WHERE on
    # a pandas-UDF vector column can fuse into an upstream join
    # condition — the linear.py hazard); the per-round partials and the
    # init sample both re-apply the same mask
    base = df.select(F.col(vec_col).cast("array<double>").alias("__v"))
    if persist:
        base = base.persist()
    try:
        sample_cap = max(64 * n_clusters, 1024)
        # over-fetch 2x then mask pandas-side: the md5-ordered LIMIT
        # must run without a vector predicate (same hazard as above);
        # a corpus more than half NULL/empty vectors under-fills and
        # raises the same too-few-vectors error below
        init_rows = (
            df.select(
                F.col(id_col).alias("__id"),
                F.col(vec_col).cast("array<double>").alias("__v"),
            )
            .orderBy(F.md5(F.col("__id").cast("string")), F.col("__id"))
            .limit(2 * sample_cap)
            .toPandas()
        )
        init_rows = init_rows[
            init_rows["__v"].map(lambda v: v is not None and len(v) > 0)
        ].head(sample_cap)
        S = _as_matrix(init_rows["__v"]) if len(init_rows) else None
        if S is None or len(S) < n_clusters:
            raise ValueError(
                f"corpus has only {0 if S is None else len(S)} usable"
                f" vectors < k={n_clusters}"
            )
        C = maximin_init(S, n_clusters, spherical=spherical)
        dim = C.shape[1]
        sc = df.sparkSession.sparkContext

        for _ in range(iters):
            b_c = sc.broadcast(C)

            def partials(batches):
                import pandas as pd

                Cm = b_c.value
                k = len(Cm)
                for pdf in batches:
                    if len(pdf) == 0:
                        continue
                    X = _as_matrix(pdf["__v"])
                    Xa = _unit_rows(X) if spherical else X
                    if spherical:
                        lab = np.argmin(-(Xa @ Cm.T), axis=1)
                    else:
                        d2 = (Xa * Xa).sum(1, keepdims=True) - 2 * Xa @ Cm.T + (
                            Cm * Cm
                        ).sum(1)
                        lab = np.argmin(d2, axis=1)
                    cells = np.unique(lab)
                    # means are taken over the ASSIGNED representation
                    # (unit rows when spherical) — classic spherical
                    # k-means re-estimation
                    yield pd.DataFrame(
                        {
                            "cell": cells.astype("int32"),
                            "cnt": [
                                int((lab == c).sum()) for c in cells
                            ],
                            "sums": [
                                Xa[lab == c].sum(axis=0).tolist() for c in cells
                            ],
                        }
                    )

            part_df = base.mapInPandas(
                partials, "cell int, cnt long, sums array<double>"
            )
            merged = (
                part_df.groupBy("cell")
                .agg(
                    F.sum("cnt").alias("cnt"),
                    *[
                        F.sum(F.col("sums")[i]).alias(f"s{i}")
                        for i in range(dim)
                    ],
                )
                .collect()
            )
            # the round's broadcast is fully consumed once the partial
            # sums are collected — release it, or a long-lived session
            # (the bench loop, repeated fits) accumulates one dead
            # centroid matrix per iteration on driver AND executors
            b_c.unpersist(blocking=False)
            new_C = C.copy()
            for r in merged:
                if r["cnt"] > 0:
                    new_C[r["cell"]] = (
                        np.array([r[f"s{i}"] for i in range(dim)]) / r["cnt"]
                    )
            if spherical:
                new_C = _unit_rows(new_C)
            shift = float(np.abs(new_C - C).max())
            C = new_C
            if shift < tol:
                break
        return [[float(x) for x in row] for row in C]
    finally:
        if persist:
            base.unpersist()


def kmeans_fit_assign(
    df: DataFrame,
    n_clusters: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    out_col: str = "cluster",
    iters: int = 10,
    spherical: bool = True,
):
    """Fit + assign in one call. Returns ``(centroids, df_with_cluster)``."""
    cent = kmeans_fit(
        df, n_clusters, id_col=id_col, vec_col=vec_col, iters=iters,
        spherical=spherical,
    )
    return cent, assign_clusters(
        df, cent, vec_col=vec_col, out_col=out_col, spherical=spherical
    )


def cluster_profile(
    assigned: DataFrame, cluster_col: str = "cluster", weight_col: str | None = None
) -> DataFrame:
    """Per-cluster size (and summed weight) — one partial-aggregable
    pass; the audit a mixture-balancing step reads first."""
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    if weight_col:
        aggs.append(F.sum(weight_col).alias(f"sum_{weight_col}"))
    return assigned.groupBy(cluster_col).agg(*aggs)
