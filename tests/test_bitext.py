"""Margin-based bitext mining vs a full numpy replay, plus the
hub-suppression law the margin exists for."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from tests.conftest import record_opcheck
from data_export_tool_spark.operators.bitext import bitext_margin_pairs


def _vec(angle, dim=8, scale=1.0):
    v = [0.0] * dim
    v[0] = math.cos(angle) * scale
    v[1] = math.sin(angle) * scale
    return v


def test_bitext_margin_matches_numpy_replay(spark, sf_dir):
    import numpy as np

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    src = emb.where(F.col("vec_id") % 2 == 0).limit(0).unionByName(
        emb.where(F.col("vec_id") < 120).where(F.col("vec_id") % 2 == 0)
    )
    tgt = emb.where(F.col("vec_id") < 120).where(F.col("vec_id") % 2 == 1)
    K, T = 4, 1.0
    got = {
        (r["src_id"], r["tgt_id"]): (r["cosine_sim"], r["margin"])
        for r in bitext_margin_pairs(src, tgt, k=K, threshold=T).collect()
    }
    s_rows = sorted(
        (r["vec_id"], r["embedding"]) for r in src.collect()
    )
    t_rows = sorted(
        (r["vec_id"], r["embedding"]) for r in tgt.collect()
    )
    S = np.array([v for _, v in s_rows], dtype=np.float64)
    Tm = np.array([v for _, v in t_rows], dtype=np.float64)
    sid = [i for i, _ in s_rows]
    tid = [i for i, _ in t_rows]
    Sn = S / np.linalg.norm(S, axis=1, keepdims=True)
    Tn = Tm / np.linalg.norm(Tm, axis=1, keepdims=True)
    # brute_force_topk emits cosine rounded to 6 dp; the margin math
    # downstream consumes those emitted values
    C = np.round(Sn @ Tn.T, 6)
    want = {}
    # ties break by neighbor id (the operator's documented rule):
    # sort by (-cos, id)
    def topk_idx(row, ids, k):
        order = sorted(range(len(row)), key=lambda j: (-row[j], ids[j]))
        return order[:k]

    avg_s = {
        sid[i]: float(np.mean([C[i, j] for j in topk_idx(C[i], tid, K)]))
        for i in range(len(sid))
    }
    avg_t = {
        tid[j]: float(np.mean([C[i, j] for i in topk_idx(C[:, j], sid, K)]))
        for j in range(len(tid))
    }
    for i in range(len(sid)):
        j = topk_idx(C[i], tid, 1)[0]
        cos = float(C[i, j])
        margin = cos / ((avg_s[sid[i]] + avg_t[tid[j]]) / 2)
        if margin >= T:
            want[(sid[i], tid[j])] = (round(cos, 9), round(margin, 9))
    assert set(got) == set(want)
    for kk in want:
        assert got[kk][0] == pytest.approx(want[kk][0], abs=1e-9)
        assert got[kk][1] == pytest.approx(want[kk][1], abs=1e-9)
    assert len(want) > 0
    record_opcheck(
        "bitext_margin_pairs", len(want), True, oracle="numpy-replay"
    )


def test_bitext_margin_suppresses_hubs(spark):
    """A hub target close to EVERY source must lose to a specific
    aligned target on margin even when it wins on raw cosine scale —
    and mutual mode keeps only reciprocal bests."""
    # sources at distinct angles; each has one aligned target slightly
    # rotated; one hub target sits in the middle of everything
    src = [(i, _vec(0.5 * i)) for i in range(4)]
    tgt = [(100 + i, _vec(0.5 * i + 0.02)) for i in range(4)]
    hub = [(999, _vec(0.75))]  # between the cluster directions
    sdf = spark.createDataFrame(src, "vec_id long, embedding array<double>")
    tdf = spark.createDataFrame(
        tgt + hub, "vec_id long, embedding array<double>"
    )
    out = {
        r["src_id"]: (r["tgt_id"], r["margin"])
        for r in bitext_margin_pairs(
            sdf, tdf, k=3, threshold=1.0, mutual=True
        ).collect()
    }
    # every source aligns to ITS rotated twin, never the hub
    for i in range(4):
        assert out[i][0] == 100 + i, out
        assert out[i][1] >= 1.0
    with pytest.raises(ValueError):
        bitext_margin_pairs(sdf, tdf, k=0)
    with pytest.raises(ValueError):
        bitext_margin_pairs(sdf, tdf, threshold=0.0)
