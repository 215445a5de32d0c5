"""Approximate-nearest-neighbor search over embedding columns.

Three tiers over an ``array<float>`` column:

- **brute-force cosine top-k** — the exactness baseline. Dot products
  via ``zip_with``+``aggregate`` (JVM higher-order functions); queries
  are broadcast, so the corpus is scanned exactly once with no shuffle
  of the corpus side. At 100 TB this is one pass; fine for small query
  batches.
- **random-hyperplane LSH buckets** — signature = sign pattern against
  d deterministic pseudo-random hyperplanes (seeded, engine-side, no
  stored model). Candidates come from same-bucket (or neighboring
  band) membership; brute-force only within buckets.
- **IVF (inverted file)** — coarse k-means centroids (pyspark.ml),
  assign each corpus vector to its nearest centroid, search only the
  ``n_probe`` closest centroids per query. The classic FAISS-IVF
  layout expressed as two broadcast joins.

Also: embedding-cosine near-duplicate pairs for dedup.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from data_export_tool_spark.parallelism import fan_out


def dot(a: Column, b: Column) -> Column:
    """Dot product of two array<float/double> columns (fold, JVM-side)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x * x), F.lit(0.0), lambda acc, v: acc + v
        )
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
) -> DataFrame:
    """Exact cosine top-k neighbors for each query vector.

    Plan shape: broadcast(queries) × corpus → per-pair cosine →
    window top-k per query. The corpus never shuffles; the only
    exchange is the (tiny) per-query candidate set for the window.
    Ties break deterministically by neighbor id.
    """
    q = F.broadcast(
        queries.select(
            F.col(query_id_col), F.col(query_vec_col).cast("array<double>").alias("__qv")
        )
    )
    c = fan_out(corpus).select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).cast("array<double>").alias("__cv"),
    )
    scored = c.crossJoin(q).select(
        query_id_col,
        "neighbor_id",
        cosine(F.col("__qv"), F.col("__cv")).alias("__cos"),
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("__cos").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            query_id_col,
            "rank",
            "neighbor_id",
            F.round("__cos", 6).alias("cosine_sim"),
        )
    )


def _hyperplane(seed: int, dim: int) -> list[float]:
    """Deterministic pseudo-random unit-ish hyperplane (pure python,
    splitmix64-style mixing — no RNG state, reproducible everywhere)."""
    vals = []
    x = (seed * 0x9E3779B97F4A7C15 + 0xD1B54A32D192ED03) & 0xFFFFFFFFFFFFFFFF
    for i in range(dim):
        x = (x + 0x9E3779B97F4A7C15) & 0xFFFFFFFFFFFFFFFF
        z = x
        z = ((z ^ (z >> 30)) * 0xBF58476D1CE4E5B9) & 0xFFFFFFFFFFFFFFFF
        z = ((z ^ (z >> 27)) * 0x94D049BB133111EB) & 0xFFFFFFFFFFFFFFFF
        z = z ^ (z >> 31)
        # map to [-1, 1)
        vals.append((z / 2**63) - 1.0)
    return vals


def rhp_signature(vec: Column, dim: int, n_planes: int = 16, seed: int = 42) -> Column:
    """Random-hyperplane (SRP) LSH signature as a long bitmask."""
    sig = F.lit(0).cast("long")
    for p in range(n_planes):
        plane = F.array(*[F.lit(v) for v in _hyperplane(seed + p, dim)])
        bit = F.when(dot(vec.cast("array<double>"), plane) >= 0, 1).otherwise(0)
        sig = sig.bitwiseOR(F.shiftleft(bit.cast("long"), p))
    return sig


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 10,
    n_planes: int = 16,
    band_bits: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
    seed: int = 42,
) -> DataFrame:
    """ANN top-k: SRP-LSH banded candidate generation, then exact cosine
    rank within candidates. Recall < 1 by construction; the scale path
    when the query set itself is large (both sides bucket on band key →
    an equi-join instead of a cross join)."""
    n_bands = n_planes // band_bits
    mask = (1 << band_bits) - 1

    def with_bands(df: DataFrame, idc: str, vc: str, out_vec: str) -> DataFrame:
        sig = rhp_signature(F.col(vc), dim, n_planes, seed)
        bands = F.array(
            *[
                F.shiftright(sig, b * band_bits).bitwiseAND(F.lit(mask)).cast("long")
                for b in range(n_bands)
            ]
        )
        return df.select(
            F.col(idc),
            F.col(vc).cast("array<double>").alias(out_vec),
            F.posexplode(bands).alias("band_idx", "band_key"),
        )

    cb = with_bands(fan_out(corpus), id_col, vec_col, "__cv").withColumnRenamed(
        id_col, "neighbor_id"
    )
    qb = with_bands(queries, query_id_col, query_vec_col, "__qv")
    cand = cb.join(qb, on=["band_idx", "band_key"]).select(
        query_id_col, "neighbor_id", "__qv", "__cv"
    ).distinct()
    scored = cand.select(
        query_id_col,
        "neighbor_id",
        cosine(F.col("__qv"), F.col("__cv")).alias("__cos"),
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("__cos").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            query_id_col, "rank", "neighbor_id", F.round("__cos", 6).alias("cosine_sim")
        )
    )


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_centroids: int = 16,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
    seed: int = 42,
) -> DataFrame:
    """IVF ANN: coarse-quantize the corpus with k-means, search only the
    n_probe nearest cells per query. Centroids are tiny → broadcast;
    the corpus is partitioned by cell, so per-query work is
    |corpus| * n_probe / n_centroids.

    Quantizer training only needs enough points to place coarse cells,
    so Lloyd's runs driver-side (numpy) on a bounded deterministic
    sample — O(sample_cap) regardless of corpus size, no per-iteration
    cluster scans. Cell assignment is one Arrow-batched pandas-UDF pass
    (BLAS matmul per batch) over the distributed corpus.
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    c = fan_out(corpus).select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).cast("array<double>").alias("__cv"),
    )

    sample_cap = max(256 * n_centroids, 4096)
    n_corpus = c.count()
    frac = min(1.0, sample_cap / max(n_corpus, 1))
    sample = c.sample(fraction=frac, seed=seed) if frac < 1.0 else c
    X = np.array(sample.select("__cv").toPandas()["__cv"].tolist(), dtype=np.float64)
    rng = np.random.RandomState(seed)
    kk = min(n_centroids, len(X))
    cent = X[rng.choice(len(X), size=kk, replace=False)]
    for _ in range(10):
        d2 = (X * X).sum(1, keepdims=True) - 2 * X @ cent.T + (cent * cent).sum(1)
        lab = d2.argmin(1)
        new = np.array(
            [X[lab == j].mean(0) if (lab == j).any() else cent[j] for j in range(kk)]
        )
        if np.allclose(new, cent):
            break
        cent = new

    cm = cent  # captured by the assignment UDF (k x dim, tiny)

    def _cell_fn(v):
        M = np.array(v.tolist(), dtype=np.float64)
        d2 = (M * M).sum(1, keepdims=True) - 2 * M @ cm.T + (cm * cm).sum(1)
        return pd.Series(d2.argmin(1))

    # concrete annotations: the module-wide `from __future__ import
    # annotations` would stringify inline hints, which pandas_udf's
    # signature inference rejects
    _cell_fn.__annotations__ = {"v": pd.Series, "return": pd.Series}
    _cell = pandas_udf(_cell_fn, "int")

    assigned = c.withColumn("cell", _cell(F.col("__cv")))

    centroids = [(i, [float(x) for x in ctr]) for i, ctr in enumerate(cent)]
    spark = corpus.sparkSession
    cent_df = spark.createDataFrame(centroids, ["cell", "centroid"])

    q = queries.select(
        F.col(query_id_col), F.col(query_vec_col).cast("array<double>").alias("__qv")
    )
    # rank cells per query, keep n_probe
    qc = q.crossJoin(F.broadcast(cent_df)).select(
        query_id_col,
        "__qv",
        "cell",
        cosine(F.col("__qv"), F.col("centroid").cast("array<double>")).alias("__csim"),
    )
    wq = Window.partitionBy(query_id_col).orderBy(F.col("__csim").desc(), F.col("cell"))
    probes = (
        qc.withColumn("__r", F.row_number().over(wq))
        .filter(F.col("__r") <= n_probe)
        .select(query_id_col, "__qv", "cell")
    )
    scored = assigned.join(F.broadcast(probes), on="cell").select(
        query_id_col,
        "neighbor_id",
        cosine(F.col("__qv"), F.col("__cv")).alias("__cos"),
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("__cos").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            query_id_col, "rank", "neighbor_id", F.round("__cos", 6).alias("cosine_sim")
        )
    )


def embedding_near_dup_pairs(
    df: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Near-duplicate vector pairs (id_a < id_b, cosine ≥ threshold).

    Plan: the (id, unit-vector) matrix is broadcast to every executor;
    ``mapInPandas`` streams the corpus partitions and scores each Arrow
    batch against the broadcast matrix with one BLAS matmul — no
    pairwise row explosion ever materializes, and the corpus side stays
    fully partition-parallel.

    Scale bound: the broadcast side must fit in executor memory
    (~300 MB per million 64-dim float64 vectors). Beyond that, generate
    candidates with ``rhp_signature`` buckets or ``ivf_topk`` cells and
    verify only bucket-mates — same output contract.
    """
    import numpy as np
    import pandas as pd

    spark = df.sparkSession
    mat_pd = df.select(id_col, vec_col).toPandas()
    ids = mat_pd[id_col].to_numpy()
    mat = np.stack(mat_pd[vec_col].to_numpy()).astype("float64")
    mat = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    b_ids = spark.sparkContext.broadcast(ids)
    b_mat = spark.sparkContext.broadcast(mat)

    def score(batches):
        all_ids, all_mat = b_ids.value, b_mat.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            a_ids = pdf[id_col].to_numpy()
            a = np.stack(pdf[vec_col].to_numpy()).astype("float64")
            a = a / np.linalg.norm(a, axis=1, keepdims=True)
            sims = a @ all_mat.T  # (batch, n)
            rows_i, cols_j = np.where(sims >= threshold)
            keep = a_ids[rows_i] < all_ids[cols_j]
            yield pd.DataFrame(
                {
                    "id_a": a_ids[rows_i[keep]],
                    "id_b": all_ids[cols_j[keep]],
                    "cosine_sim": np.round(sims[rows_i[keep], cols_j[keep]], 6),
                }
            )

    return fan_out(df.select(id_col, vec_col)).mapInPandas(
        score, schema="id_a long, id_b long, cosine_sim double"
    )
