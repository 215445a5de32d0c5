"""Fuzzy edit-distance joins (operators/fuzzy.py) vs the quadratic
DuckDB truth."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from tests.conftest import record_opcheck
from data_export_tool_spark.operators.fuzzy import (
    deletion_neighborhood,
    fuzzy_dedup_pairs,
    fuzzy_pairs,
)

NAMES = [
    (1, "jonathan smith"),
    (2, "jonathon smith"),   # 1 substitution of 1
    (3, "jon smith"),
    (4, "john smith"),       # 1 edit of 3
    (5, "smith jonathan"),   # far from all
    (6, "aquamarine"),
    (7, "aquamarine"),       # exact dup of 6
    (8, "aquamarines"),      # 1 insertion of 6/7
    (9, None),
    (10, ""),                # empty string: matches nothing but itself
]


@pytest.fixture(scope="module")
def names(spark):
    return spark.createDataFrame(NAMES, "id long, name string")


def test_fuzzy_dedup_pairs_matches_quadratic_truth(spark, names):
    for d in (1, 2):
        got = {
            (r["id_a"], r["id_b"]): r["distance"]
            for r in fuzzy_dedup_pairs(
                names, max_distance=d, id_col="id", text_col="name"
            ).collect()
        }
        vals = ", ".join(
            f"({i}, '{n}')" for i, n in NAMES if n is not None
        )
        want = {
            (a, b): int(dist)
            for a, b, dist in duckdb.sql(
                f"""
        WITH t(id, name) AS (VALUES {vals})
        SELECT a.id, b.id, levenshtein(a.name, b.name) AS d
        FROM t a JOIN t b ON a.id < b.id
        WHERE levenshtein(a.name, b.name) <= {d}
        """
            ).fetchall()
        }
        record_opcheck(
            f"fuzzy_dedup_pairs_d{d}", len(want), got == want
        )
        assert got == want, d


def test_fuzzy_pairs_cross_sides(spark):
    left = spark.createDataFrame(
        [(1, "color"), (2, "flavour")], "id long, name string"
    )
    right = spark.createDataFrame(
        [(10, "colour"), (11, "flavor"), (12, "texture")],
        "id long, name string",
    )
    got = {
        (r["left_id"], r["right_id"]): r["distance"]
        for r in fuzzy_pairs(left, right, max_distance=1).collect()
    }
    assert got == {(1, 10): 1, (2, 11): 1}


def test_deletion_neighborhood_contents(spark):
    df = spark.createDataFrame([("abc",), ("",)], "s string")
    rows = df.select(
        F.col("s"), deletion_neighborhood(F.col("s"), 1).alias("n")
    ).collect()
    by_s = {r["s"]: sorted(r["n"]) for r in rows}
    assert by_s["abc"] == ["ab", "abc", "ac", "bc"]
    assert by_s[""] == [""]


def test_fuzzy_no_cartesian_plan(spark, names):
    plan = (
        fuzzy_dedup_pairs(names, 1)._jdf.queryExecution().executedPlan().toString()
    )
    assert "Cartesian" not in plan and "BroadcastNestedLoop" not in plan


def test_fuzzy_entity_clusters_matches_union_find(spark, names):
    """fuzzy→CC composition (round-5 verdict #6): clusters must equal
    a union-find over the quadratic DuckDB pair truth, including a
    transitive chain whose outer pair is beyond max_distance."""
    from data_export_tool_spark.operators.fuzzy import fuzzy_entity_clusters

    extra = spark.createDataFrame(
        [(30, "aaaa"), (31, "aaab"), (32, "aabb")], "id long, name string"
    )
    df = names.unionByName(extra)
    rows = [(i, n) for i, n in NAMES if n is not None] + [
        (30, "aaaa"), (31, "aaab"), (32, "aabb"),
    ]
    vals = ", ".join(f"({i}, '{n}')" for i, n in rows)
    pairs = duckdb.sql(
        f"""
        WITH t(id, name) AS (VALUES {vals})
        SELECT a.id, b.id FROM t a JOIN t b ON a.id < b.id
        WHERE levenshtein(a.name, b.name) <= 1
        """
    ).fetchall()
    parent = {i: i for i, _ in rows}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    by_root: dict[int, list[int]] = {}
    for a, b in pairs:
        for x in (a, b):
            by_root.setdefault(find(x), [])
    for i, _ in rows:
        r = find(i)
        if r in by_root and i not in by_root[r]:
            by_root[r].append(i)
    name_of = dict(rows)
    want = {
        (i, root, name_of[root], len(members))
        for root, members in by_root.items()
        for i in members
    }
    got = {
        (r["id"], r["canonical_id"], r["canonical_val"], r["cluster_size"])
        for r in fuzzy_entity_clusters(df, max_distance=1).collect()
    }
    record_opcheck(
        "fuzzy_entity_clusters", len(want), got == want,
        oracle="duckdb+union-find",
    )
    assert got == want
    # the transitive chain is really in one cluster despite
    # lev(aaaa, aabb) = 2 > max_distance
    assert {(30, 30), (31, 30), (32, 30)} <= {
        (i, c) for i, c, _, _ in got
    }


def test_fuzzy_max_variant_group_guard(spark):
    """The hot-variant cap: single-char strings all collide on the ""
    variant at d=1 — with the cap they are pruned from candidate
    generation (documented recall trade), while pairs reachable
    through cold variants survive."""
    rows = [(i, s) for i, s in enumerate("abcdefgh")] + [
        (100, "aquamarine"),
        (101, "aquamarines"),
    ]
    df = spark.createDataFrame(rows, "id long, name string")
    uncapped = {
        (r["id_a"], r["id_b"])
        for r in fuzzy_dedup_pairs(df, max_distance=1).collect()
    }
    # every single-char pair is within distance 1 (sub via "" is d<=2
    # but a->b is one substitution): C(8,2)=28 pairs + the long pair
    assert (100, 101) in uncapped and len(uncapped) == 29
    capped = {
        (r["id_a"], r["id_b"])
        for r in fuzzy_dedup_pairs(
            df, max_distance=1, max_variant_group=4
        ).collect()
    }
    # "" is shared by all 8 single-char rows (> cap) -> pruned; each
    # single-char string's own variant is shared by 1 row only, so
    # the single-char pairs vanish; the cold long pair survives
    assert capped == {(100, 101)}


def test_phonetic_dedup_pairs_matches_replay(spark):
    """Soundex-blocked JW pairs vs a python replay restricted to the
    SAME blocking (Soundex codes queried from Spark's own builtin —
    the blocking construction under test — scoring from the
    py_jaro_winkler oracle), plus the complement law: a
    first-letter-stable misspelling that prefix-2 blocking misses is
    CAUGHT here."""
    import pytest

    from data_export_tool_spark.operators.fuzzy import (
        jaro_winkler_dedup_pairs,
        phonetic_dedup_pairs,
        py_jaro_winkler,
    )

    names = [
        (1, "jonathan smith"), (2, "jhonathan smith"),  # jo/jh: prefix miss
        (3, "jonathon smith"),
        (4, "martha stewart"), (5, "marhta stewart"),
        (6, "catherine jones"), (7, "kathryn jones"),   # C/K: soundex miss
        (8, "acme corp"), (9, "acme corp."),
        (10, None), (11, ""), (12, "zed"),
    ]
    df = spark.createDataFrame(names, "doc_id long, name string")
    got = {
        (r["id_a"], r["id_b"]): r["jw"]
        for r in phonetic_dedup_pairs(df, threshold=0.9, id_col="doc_id").collect()
    }
    # replay with identical blocking: soundex codes of the first two
    # tokens, queried once from the SAME builtin the operator uses
    keyed = [(i, n.lower().strip()) for i, n in names if n]
    toks = sorted({t for _, n in keyed for t in (n.split() + [""])[:2]} | {""})
    codes = dict(
        zip(
            toks,
            [
                r["s"]
                for r in spark.createDataFrame([(t,) for t in toks], "t string")
                .select(F.soundex("t").alias("s"))
                .collect()
            ],
        )
    )

    def blk(n):
        parts = n.split()
        return (
            codes[parts[0] if parts else ""],
            codes[parts[1] if len(parts) > 1 else ""],
        )

    want = {}
    for i, (ia, ta) in enumerate(keyed):
        for ib, tb in keyed[i + 1:]:
            if blk(ta) != blk(tb):
                continue
            lo, hi = (ia, ib) if ia < ib else (ib, ia)
            s = py_jaro_winkler(ta if lo == ia else tb, tb if lo == ia else ta)
            if s >= 0.9:
                want[(lo, hi)] = round(s, 6)
    assert got == want and len(want) >= 3
    # complement law: (1, 2) caught here, missed by prefix blocking;
    # (6, 7) missed here by construction
    assert (1, 2) in got
    assert (6, 7) not in got
    prefix_got = {
        (r["id_a"], r["id_b"])
        for r in jaro_winkler_dedup_pairs(df, threshold=0.9, id_col="doc_id").collect()
    }
    assert (1, 2) not in prefix_got
    record_opcheck(
        "phonetic_jw_pairs", len(want), True, oracle="python-reference"
    )
    with pytest.raises(ValueError, match="max_block"):
        flood = spark.range(50).select(
            F.col("id").alias("doc_id"), F.lit("robert").alias("name")
        )
        phonetic_dedup_pairs(flood, id_col="doc_id", max_block=10)
    with pytest.raises(ValueError):
        phonetic_dedup_pairs(df, threshold=0.0, id_col="doc_id")


def test_jaro_winkler_literature_values():
    """py_jaro_winkler vs the published record-linkage examples."""
    import pytest

    from data_export_tool_spark.operators.fuzzy import py_jaro_winkler

    assert py_jaro_winkler("MARTHA", "MARHTA") == pytest.approx(0.9611, abs=1e-4)
    assert py_jaro_winkler("DWAYNE", "DUANE") == pytest.approx(0.84, abs=1e-4)
    assert py_jaro_winkler("DIXON", "DICKSONX") == pytest.approx(0.8133, abs=1e-4)
    assert py_jaro_winkler("abc", "abc") == 1.0
    assert py_jaro_winkler("abc", "xyz") == 0.0
    assert py_jaro_winkler("", "abc") == 0.0


def test_np_jaro_winkler_matches_python():
    """Vectorized scorer == python oracle, bit-for-bit after round(6),
    on the literature pairs, edge shapes, and hypothesis-random pairs."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from data_export_tool_spark.operators.fuzzy import (
        np_jaro_winkler_batch,
        py_jaro_winkler,
    )

    fixed = [
        ("MARTHA", "MARHTA"), ("DWAYNE", "DUANE"), ("DIXON", "DICKSONX"),
        ("abc", "abc"), ("abc", "xyz"), ("", "abc"), ("abc", ""), ("", ""),
        ("a", "a"), ("a", "b"), ("ab", "ba"), ("martha stewart", "marhta stewart"),
        ("x\x00y", "x\x00y"), ("x\x00y", "xzy"),  # NUL stays distinct from pad
    ]
    got = np_jaro_winkler_batch([a for a, _ in fixed], [b for _, b in fixed])
    for (a, b), g in zip(fixed, got):
        assert round(g, 6) == round(py_jaro_winkler(a, b), 6), (a, b)

    alpha = st.text(alphabet="abcdefg -.'é", min_size=0, max_size=20)

    @settings(max_examples=200, deadline=None)
    @given(st.lists(st.tuples(alpha, alpha), min_size=1, max_size=30))
    def check(pairs):
        out = np_jaro_winkler_batch(
            [a for a, _ in pairs], [b for _, b in pairs]
        )
        for (a, b), g in zip(pairs, out):
            assert round(g, 6) == round(py_jaro_winkler(a, b), 6), (a, b)

    check()


def test_jw_upper_bound_is_sound(spark):
    """The JVM prefilter bound dominates the true JW on every pair —
    the recall-neutrality law of the b101 prefilter (hypothesis-driven
    corpus evaluated through the actual Spark expression)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from data_export_tool_spark.operators.fuzzy import (
        jw_upper_bound,
        py_jaro_winkler,
    )

    alpha = st.text(alphabet="abcde0123 -", min_size=0, max_size=14)
    pairs: list[tuple[str, str]] = []

    @settings(max_examples=120, deadline=None)
    @given(alpha, alpha)
    def collect(a, b):
        pairs.append((a, b))

    collect()
    pairs += [
        ("MARTHA", "MARHTA"), ("en-doc-0042", "en-doc-0123"),
        ("en-doc-0042", "en-doc-1111"), ("abc", "abc"), ("", ""),
    ]
    from data_export_tool_spark.operators.fuzzy import (
        char_bag_tags,
        jw_prefilter,
    )

    df = spark.createDataFrame(pairs, "a string, b string")
    rows = df.select(
        "a",
        "b",
        jw_upper_bound(F.col("a"), F.col("b")).alias("ub"),
        jw_prefilter(
            F.col("a"), F.col("b"),
            char_bag_tags(F.col("a")), char_bag_tags(F.col("b")),
            0.9,
        ).alias("keep"),
    ).collect()
    assert len(rows) == len(pairs)
    for r in rows:
        true = py_jaro_winkler(r["a"], r["b"])
        assert r["ub"] >= true - 1e-9, (r["a"], r["b"], r["ub"], true)
        # the boolean join-condition form admits every >=0.9 pair
        # (nonempty keys only — the operator filters empties upstream)
        if true >= 0.9 and r["a"] and r["b"]:
            assert r["keep"], (r["a"], r["b"], true)
    # and it is a USEFUL bound: digit-disjoint doc keys fall under 0.92
    lut = {(r["a"], r["b"]): r["ub"] for r in rows}
    assert lut[("en-doc-0042", "en-doc-1111")] < 0.92


def test_jaro_winkler_dedup_pairs_matches_replay(spark):
    """Distributed pairs vs a python replay restricted to the SAME
    blocking (prefix + neighbor band) — exact score equality — plus
    the within-block recall law and the flooded-block guard."""
    import pytest

    from data_export_tool_spark.operators.fuzzy import (
        jaro_winkler_dedup_pairs,
        py_jaro_winkler,
    )

    names = [
        (1, "martha stewart"), (2, "marhta stewart"), (3, "marta stewart"),
        (4, "jonathan smith"), (5, "jonathon smith"), (6, "john smith"),
        (7, "acme corp"), (8, "acme corp."), (9, "zenith ltd"),
        (10, "bob"), (11, "rob"),  # differ in first char: missed by design
        (12, None), (13, ""),
    ]
    df = spark.createDataFrame(names, "doc_id long, name string")
    got = {
        (r["id_a"], r["id_b"]): r["jw"]
        for r in jaro_winkler_dedup_pairs(df, threshold=0.9, id_col="doc_id").collect()
    }
    # replay with identical blocking
    keyed = [
        (i, n.lower().strip()) for i, n in names if n
    ]
    want = {}
    for i, (ia, ta) in enumerate(keyed):
        for ib, tb in keyed[i + 1:]:
            lo, hi = (ia, ib) if ia < ib else (ib, ia)
            if ta[:2] != tb[:2]:
                continue
            if abs(len(ta) // 2 - len(tb) // 2) > 1:
                continue
            s = py_jaro_winkler(ta if lo == ia else tb, tb if lo == ia else ta)
            if s >= 0.9:
                want[(lo, hi)] = round(s, 6)
    assert got == want and len(want) >= 3
    # the first-char-divergent pair is absent BY CONSTRUCTION
    assert (10, 11) not in got
    record_opcheck(
        "jaro_winkler_pairs", len(want), True, oracle="python-reference"
    )
    # flooded-block guard speaks a readable error
    flood = spark.range(50).select(
        F.col("id").alias("doc_id"), F.lit("aa").alias("name")
    )
    with pytest.raises(ValueError, match="max_block"):
        jaro_winkler_dedup_pairs(flood, id_col="doc_id", max_block=10)
    with pytest.raises(ValueError):
        jaro_winkler_dedup_pairs(df, threshold=0.0, id_col="doc_id")
