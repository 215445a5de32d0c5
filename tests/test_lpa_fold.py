"""Label propagation (operators/graph.py) vs an exact python replay of
the deterministic sync rule, community ground truths; NFKC fold
(functions/text.py) vs the unicodedata reference on adversarial
unicode."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.conftest import record_opcheck
from data_export_tool_spark.functions.text import nfkc_fold
from data_export_tool_spark.operators.graph import label_propagation


def _lpa_python(edges, max_iter):
    """Exact replay: sync rounds, most-frequent neighbor label, ties
    to smallest."""
    und = {tuple(sorted(e)) for e in edges if e[0] != e[1]}
    adj: dict = {}
    for a, b in und:
        adj.setdefault(a, []).append(b)
        adj.setdefault(b, []).append(a)
    lab = {n: n for n in adj}
    for _ in range(max_iter):
        new = {}
        for n, nbrs in adj.items():
            counts: dict = {}
            for m in nbrs:
                counts[lab[m]] = counts.get(lab[m], 0) + 1
            new[n] = min(counts, key=lambda c: (-counts[c], c))
        lab = new
    return lab


def test_lpa_two_cliques_one_bridge(spark):
    k1 = [(a, b) for a in range(5) for b in range(5) if a < b]
    k2 = [(a, b) for a in range(10, 15) for b in range(10, 15) if a < b]
    edges = k1 + k2 + [(4, 10)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r["node"]: r["community"] for r in label_propagation(df, max_iter=5).collect()}
    # each clique converges to its min id; the bridge doesn't merge them
    assert {got[n] for n in range(5)} == {0}
    assert {got[n] for n in range(10, 15)} == {10}


def test_lpa_matches_python_replay(spark, sf_dir):
    """Random-ish co-purchase projection at sf0.001 — exact equality
    with the python replay at fixed iterations, including edge
    hygiene (dup/reversed/self edges)."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    edges_df = (
        li.alias("l")
        .join(li.alias("r"), "l_orderkey")
        .where("l.l_partkey < r.l_partkey")
        .selectExpr("l.l_partkey AS src", "r.l_partkey AS dst")
    )
    for it in (1, 4):
        got = {
            r["node"]: r["community"]
            for r in label_propagation(edges_df, max_iter=it).collect()
        }
        want = _lpa_python(
            [(r["src"], r["dst"]) for r in edges_df.collect()], max_iter=it
        )
        ok = got == want
        if it == 4:
            record_opcheck("label_propagation", len(want), ok, oracle="python-reference")
        assert ok and len(want) > 0


def test_lpa_hygiene_and_validation(spark):
    df = spark.createDataFrame(
        [(1, 2), (2, 1), (1, 1), (None, 2), (2, None), (1, 2)],
        "src long, dst long",
    )
    got = {r["node"]: r["community"] for r in label_propagation(df, max_iter=3).collect()}
    assert got == {1: 1, 2: 2} or got == {1: 2, 2: 1}  # 2-cycle on a single edge
    # deterministic: re-run is identical
    again = {r["node"]: r["community"] for r in label_propagation(df, max_iter=3).collect()}
    assert got == again
    with pytest.raises(ValueError):
        label_propagation(df, max_iter=0)


FOLD_CASES = [
    "Ｆｕｌｌｗｉｄｔｈ ＡＢＣ",
    "ﬁligree ﬂoor",          # ligatures
    "café CAFÉ café",   # precomposed + combining accents
    "①②③ Ⅻ",                  # compatibility digits/numerals
    "Straße GROSS",          # eszett casefold
    "ｶﾀｶﾅ",                  # halfwidth katakana
    None,
    "",
]


def test_nfkc_fold_matches_unicodedata(spark):
    import unicodedata

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(FOLD_CASES)], "i long, t string"
    )
    for strip in (True, False):
        got = {
            r["i"]: r["f"]
            for r in df.select("i", nfkc_fold(F.col("t"), strip).alias("f")).collect()
        }

        def ref(x):
            if x is None:
                return None
            y = unicodedata.normalize("NFKC", x).casefold()
            if strip:
                y = unicodedata.normalize(
                    "NFC",
                    "".join(
                        c
                        for c in unicodedata.normalize("NFD", y)
                        if unicodedata.category(c) != "Mn"
                    ),
                )
            return y

        want = {i: ref(t) for i, t in enumerate(FOLD_CASES)}
        assert got == want
    record_opcheck("nfkc_fold", len(FOLD_CASES) * 2, True, oracle="python-reference")
    # the dedup-canonicalization law: the three cafés collapse
    folded = ref("café CAFÉ café") if False else None
    out = df.where("i = 2").select(nfkc_fold(F.col("t")).alias("f")).collect()[0]["f"]
    assert out == "cafe cafe cafe"


# ---------------------------------------------------------------------------
# k-core
# ---------------------------------------------------------------------------


def _k_core_python(edges, k):
    und = {tuple(sorted(e)) for e in edges if e[0] != e[1]}
    adj: dict = {}
    for a, b in und:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    changed = True
    while changed:
        changed = False
        for n in list(adj):
            if len(adj[n]) < k:
                for m in adj[n]:
                    adj[m].discard(n)
                del adj[n]
                changed = True
    return {n: len(v) for n, v in adj.items()}


def test_k_core_cascade_and_truths(spark):
    from data_export_tool_spark.operators.graph import k_core

    # a 4-clique with a pendant CHAIN: peeling must cascade down the
    # chain (each removal exposes the next) — the multi-round case
    clique = [(a, b) for a in range(4) for b in range(4) if a < b]
    chain = [(3, 10), (10, 11), (11, 12)]
    df = spark.createDataFrame(clique + chain, "src long, dst long")
    got = {r["node"]: r["degree"] for r in k_core(df, k=2).collect()}
    assert got == {0: 3, 1: 3, 2: 3, 3: 3}
    # k=4: no 4-core exists -> empty
    assert k_core(df, k=4).count() == 0
    # k=1 keeps everything with an edge
    assert k_core(df, k=1).count() == 7


def test_k_core_matches_python_replay(spark, sf_dir):
    from data_export_tool_spark.operators.graph import k_core

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    edges_df = (
        li.alias("l")
        .join(li.alias("r"), "l_orderkey")
        .where("l.l_partkey < r.l_partkey")
        .selectExpr("l.l_partkey AS src", "r.l_partkey AS dst")
    )
    edges = [(r["src"], r["dst"]) for r in edges_df.collect()]
    for k in (2, 4):
        got = {r["node"]: r["degree"] for r in k_core(edges_df, k=k).collect()}
        want = _k_core_python(edges, k)
        if k == 2:
            record_opcheck("k_core", len(want), got == want, oracle="python-reference")
        assert got == want


def test_k_core_validation(spark):
    from data_export_tool_spark.operators.graph import k_core

    df = spark.createDataFrame([(1, 2)], "src long, dst long")
    with pytest.raises(ValueError):
        k_core(df, k=0)
