"""Product quantization (PQ) — compressed ANN storage + ADC search.

Jégou, Douze & Schmid 2011: split each d-dim vector into ``m``
subvectors, k-means each subspace into ``n_codes`` centroids, store
the vector as m small integer codes (d floats → m bytes at
n_codes ≤ 256 — a 16-128× footprint cut, the difference between an
embedding index that fits executor memory at 100 TB and one that
doesn't). Search is ADC (asymmetric distance computation): the query
stays exact; per (query, subspace) a table of n_codes squared
distances is precomputed once, and a corpus vector's distance is just
m table lookups — no float math per pair.

Division of labor (the established similarity-tier contract):

- **train** — driver-side numpy Lloyd's per subspace over the
  md5-hash-ordered bounded sample (`similarity.ivf_train_from_corpus`
  pattern: deterministic function of the corpus, replayable by an
  external oracle; maximin seeding, no RNG). Plain L2, NOT spherical —
  PQ approximates raw subvector geometry, magnitude included.
- **encode** — ONE Arrow pass (mapInPandas): reshape (B, m, sub),
  vectorized argmin per subspace, ties → lowest code (numpy argmin).
  No shuffle; codes ride as ``array<int>``.
- **search** — 100% JVM-side: the request-sized query batch is
  collected (bounded by contract, as with the IVF probe ranking), ADC
  tables computed in numpy, broadcast as an (m × n_codes) array
  column, and the score is ``aggregate(zip_with(tables, codes,
  (t, c) → t[c]))`` inside whole-stage codegen over a
  broadcast-nested-loop of (corpus_codes × Q) — the same shape as
  ``brute_force_topk`` but over byte codes instead of float vectors.
  Per-query top-k via the standard rank window on the candidate set.

Vectors whose length ≠ d are excluded at encode by contract (mirrors
the ANN tiers' ragged-vector policy).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from data_export_tool_spark.operators.clustering import maximin_init

__all__ = [
    "PQModel",
    "pq_train",
    "pq_encode",
    "pq_topk",
    "pq_topk_rerank",
    "pq_save",
    "pq_load",
]


@dataclass(frozen=True)
class PQModel:
    """codebooks[j] is the (n_codes, d/m) centroid matrix of subspace
    j, stored as nested lists so the model is plain-JSON portable."""

    codebooks: tuple  # m × n_codes × sub nested tuples
    dim: int
    m: int
    n_codes: int

    def as_numpy(self):
        import numpy as np

        return np.asarray(self.codebooks, dtype=np.float64)


def _lloyd_l2(X, k: int, iters: int = 15):
    """Deterministic plain-L2 Lloyd's: maximin seeding, empty clusters
    keep their centroid, ties to the lowest code."""
    import numpy as np

    X = np.asarray(X, dtype=np.float64)
    cent = maximin_init(X, k, spherical=False)
    kk = len(cent)
    for _ in range(iters):
        d2 = (X * X).sum(1, keepdims=True) - 2 * X @ cent.T + (cent * cent).sum(1)
        lab = d2.argmin(1)
        new = np.array(
            [X[lab == j].mean(0) if (lab == j).any() else cent[j] for j in range(kk)]
        )
        if np.allclose(new, cent):
            break
        cent = new
    return cent


def pq_sample_cap(m: int, n_codes: int) -> int:
    return max(256 * n_codes, 4096)


def pq_train(
    corpus: DataFrame,
    dim: int,
    m: int = 4,
    n_codes: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    iters: int = 15,
) -> PQModel:
    """Train m per-subspace codebooks on the deterministic
    md5-ordered sample. ``dim % m == 0`` required (standard PQ)."""
    import numpy as np

    if dim % m != 0:
        raise ValueError(f"dim {dim} not divisible by m {m}")
    sub = dim // m
    sample_pd = (
        corpus.where(F.size(F.col(vec_col)) == dim)
        .select(F.col(id_col), F.col(vec_col).cast("array<double>").alias("__cv"))
        .orderBy(F.md5(F.col(id_col).cast("string")), F.col(id_col))
        .limit(pq_sample_cap(m, n_codes))
        .toPandas()
        .sort_values(id_col)
    )
    if sample_pd.empty:
        raise ValueError("pq_train: no vectors of the declared dim")
    X = np.array(sample_pd["__cv"].tolist(), dtype=np.float64)
    books = [
        _lloyd_l2(X[:, j * sub : (j + 1) * sub], n_codes, iters) for j in range(m)
    ]
    return PQModel(
        codebooks=tuple(tuple(tuple(float(x) for x in row) for row in b) for b in books),
        dim=dim,
        m=m,
        n_codes=min(n_codes, len(X)),
    )


def pq_encode(
    corpus: DataFrame,
    model: PQModel,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, codes array<int>) — one vectorized Arrow pass, no shuffle.
    The output id field reuses the INPUT id column's type (ADVICE r6:
    a hardcoded ``long`` broke string/UUID-keyed corpora while every
    other ANN tier is id-type agnostic)."""
    from pyspark.sql import types as T

    books = model.as_numpy()  # (m, n_codes, sub)
    dim, m = model.dim, model.m
    sub = dim // m
    id_type = corpus.schema[id_col].dataType
    out_schema = T.StructType(
        [
            T.StructField("__id", id_type),
            T.StructField("codes", T.ArrayType(T.IntegerType())),
        ]
    )

    def encode(batches):
        import numpy as np
        import pandas as pd

        cn2 = (books * books).sum(2)  # (m, n_codes)
        for pdf in batches:
            if pdf.empty:
                continue
            X = np.stack(pdf["__cv"].to_numpy()).astype("float64")
            B = X.reshape(len(X), m, sub)
            codes = np.empty((len(X), m), dtype="int32")
            for j in range(m):
                d2 = cn2[j] - 2.0 * B[:, j, :] @ books[j].T
                codes[:, j] = d2.argmin(1)
            yield pd.DataFrame({"__id": pdf["__id"], "codes": list(codes)})

    base = corpus.where(F.size(F.col(vec_col)) == dim).select(
        F.col(id_col).alias("__id"), F.col(vec_col).cast("array<double>").alias("__cv")
    )
    out = base.mapInPandas(encode, schema=out_schema)
    return out.select(F.col("__id").alias(id_col), "codes")


def pq_topk(
    corpus_codes: DataFrame,
    queries: DataFrame,
    model: PQModel,
    k: int = 10,
    id_col: str = "vec_id",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
) -> DataFrame:
    """ADC top-k: (query_id, rank, neighbor_id, adc_dist) — smallest
    approximate squared L2 first, ties to the lower neighbor id.

    The query batch is collected driver-side (request-sized by the ANN
    contract) to build the lookup tables; corpus scoring is pure
    codegen — table lookups summed with ``zip_with``/``aggregate``.
    """
    import numpy as np

    books = model.as_numpy()
    m, sub = model.m, model.dim // model.m
    qrows = queries.select(query_id_col, query_vec_col).collect()
    if not qrows:
        raise ValueError("pq_topk: empty query batch")
    tables = []
    for r in qrows:
        qv = np.asarray(r[query_vec_col], dtype=np.float64)
        if qv.shape != (model.dim,):
            raise ValueError(f"query {r[query_id_col]}: dim != {model.dim}")
        Qm = qv.reshape(m, sub)
        t = ((books - Qm[:, None, :]) ** 2).sum(2)  # (m, n_codes)
        tables.append((r[query_id_col], [[float(x) for x in row] for row in t]))
    from pyspark.sql import types as T

    spark = corpus_codes.sparkSession
    # query-id field reuses the input column's type (ADVICE r6)
    t_schema = T.StructType(
        [
            T.StructField(query_id_col, queries.schema[query_id_col].dataType),
            T.StructField(
                "__tabs", T.ArrayType(T.ArrayType(T.DoubleType()))
            ),
        ]
    )
    tdf = F.broadcast(spark.createDataFrame(tables, t_schema))
    scored = corpus_codes.crossJoin(tdf).select(
        query_id_col,
        F.col(id_col).alias("neighbor_id"),
        F.aggregate(
            F.zip_with(
                "__tabs", "codes", lambda t, c: F.element_at(t, c + F.lit(1))
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        ).alias("adc_dist"),
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("adc_dist").asc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, "rank", "neighbor_id", F.round("adc_dist", 6).alias("adc_dist"))
    )


def pq_topk_rerank(
    corpus_codes: DataFrame,
    corpus: DataFrame,
    queries: DataFrame,
    model: PQModel,
    k: int = 10,
    shortlist: int = 100,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
) -> DataFrame:
    """ADC shortlist + exact re-rank (the production PQ recipe —
    Jégou et al.'s IVFADC+R): take the top-``shortlist`` candidates by
    compressed distance, fetch ONLY those originals (a candidate-sized
    semi-join against the float corpus — Q·shortlist rows, never the
    corpus), compute exact squared L2, return the top-k.

    The quality/cost dial is ``shortlist/N``: ADC does the 100 TB
    scan on m-byte codes; float vectors are touched for Q·shortlist
    rows only. Output: (query_id, rank, neighbor_id, l2_dist).
    """
    cand = pq_topk(
        corpus_codes, queries, model, k=shortlist,
        id_col=id_col, query_id_col=query_id_col, query_vec_col=query_vec_col,
    ).select(query_id_col, "neighbor_id")
    vecs = corpus.where(F.size(F.col(vec_col)) == model.dim).select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).cast("array<double>").alias("__cv"),
    )
    q = F.broadcast(
        queries.select(
            query_id_col, F.col(query_vec_col).cast("array<double>").alias("__qv")
        )
    )
    exact = (
        cand.join(vecs, "neighbor_id")
        .join(q, query_id_col)
        .select(
            query_id_col,
            "neighbor_id",
            F.aggregate(
                F.zip_with("__qv", "__cv", lambda a, b: (a - b) * (a - b)),
                F.lit(0.0),
                lambda acc, v: acc + v,
            ).alias("l2_dist"),
        )
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("l2_dist").asc(), F.col("neighbor_id").asc()
    )
    return (
        exact.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, "rank", "neighbor_id", F.round("l2_dist", 6).alias("l2_dist"))
    )


def pq_save(
    codes: DataFrame, model: PQModel, path: str, id_col: str = "vec_id"
) -> None:
    """Persist a PQ index: codes as parquet (they are already a plain
    (id, codes) frame) + the codebooks/dims as a JSON sidecar — the
    stored-index twin of the IVF index layout. Everything is
    plain-format portable; no engine-private serialization."""
    import json
    import os

    codes.select(id_col, "codes").write.mode("overwrite").parquet(
        os.path.join(path, "codes")
    )
    doc = {
        "codebooks": [[list(r) for r in b] for b in model.codebooks],
        "dim": model.dim,
        "m": model.m,
        "n_codes": model.n_codes,
    }
    with open(os.path.join(path, "pq_model.json"), "w") as fh:
        json.dump(doc, fh)


def pq_load(spark, path: str) -> tuple[DataFrame, PQModel]:
    """Reload a :func:`pq_save` index — (codes frame, model)."""
    import json
    import os

    with open(os.path.join(path, "pq_model.json")) as fh:
        doc = json.load(fh)
    model = PQModel(
        codebooks=tuple(
            tuple(tuple(float(x) for x in row) for row in b)
            for b in doc["codebooks"]
        ),
        dim=int(doc["dim"]),
        m=int(doc["m"]),
        n_codes=int(doc["n_codes"]),
    )
    codes = spark.read.parquet(os.path.join(path, "codes"))
    return codes, model
