"""Dedup operator tests: exact, MinHash-LSH, SimHash, n-gram Jaccard —
on planted near/exact duplicates."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_export_tool_spark.operators.dedup import (
    dedup_exact,
    exact_duplicates,
    minhash_lsh_candidates,
    ngram_jaccard_pairs,
    simhash_near_duplicates,
)

BASE = (
    "spark shuffles data between stages when a wide dependency requires "
    "repartitioning by key and the optimizer cannot elide the exchange"
)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, BASE),
        (2, BASE),  # exact dup of 1
        (3, BASE.replace("optimizer", "planner")),  # near dup of 1
        (4, "completely different text about cooking pasta with garlic and olive oil in rome"),
        (5, "Spark   shuffles, data between stages when a wide dependency requires "
            "repartitioning by key and the optimizer cannot elide the exchange!"),  # normalizes to dup of 1
        (6, "yet another unrelated document mentioning satellites orbit geometry and physics"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_exact_duplicates_groups(docs):
    groups = exact_duplicates(docs).collect()
    assert len(groups) == 1
    assert groups[0].dup_count == 3  # 1, 2, 5 normalize identically
    assert groups[0].keep_id == 1


def test_dedup_exact_keeps_one_representative(docs):
    kept = sorted(r.doc_id for r in dedup_exact(docs).collect())
    assert kept == [1, 3, 4, 6]


def test_minhash_lsh_finds_near_dups(docs):
    pairs = {
        (r.id_a, r.id_b)
        for r in minhash_lsh_candidates(docs, num_hashes=16, bands=8).collect()
    }
    # exact dups always collide on every band
    assert (1, 2) in pairs and (1, 5) in pairs and (2, 5) in pairs
    # near-dup should collide on at least one of 8 bands (2-row bands)
    assert (1, 3) in pairs
    # unrelated docs must not pair
    assert (4, 6) not in pairs


def test_ngram_jaccard_values(docs):
    pairs = {
        (r.id_a, r.id_b): r.jaccard
        for r in ngram_jaccard_pairs(docs, threshold=0.2).collect()
    }
    assert pairs[(1, 2)] == 1.0
    assert 0.5 < pairs[(1, 3)] < 1.0
    assert (4, 6) not in pairs


def test_ngram_jaccard_with_candidate_restriction(spark, docs):
    cands = spark.createDataFrame([(1, 3)], "id_a long, id_b long")
    pairs = ngram_jaccard_pairs(docs, threshold=0.2, candidates=cands).collect()
    assert {(r.id_a, r.id_b) for r in pairs} == {(1, 3)}


def test_simhash_separates_near_from_far(spark, docs):
    from data_export_tool_spark.operators.dedup import hamming64, simhash

    sigs = {r.doc_id: r.simhash for r in simhash(docs).collect()}
    df = spark.createDataFrame(
        [(sigs[1], sigs[3]), (sigs[1], sigs[4])], "a long, b long"
    )
    near, far = [
        r.h for r in df.select(hamming64(F.col("a"), F.col("b")).alias("h")).collect()
    ]
    assert near < far
    assert near <= 16  # near-dup keeps most bits


def test_simhash_near_duplicates_pairs(docs):
    pairs = {
        (r.id_a, r.id_b)
        for r in simhash_near_duplicates(docs, max_hamming=16).collect()
    }
    assert (1, 2) in pairs and (1, 5) in pairs
    assert (4, 6) not in pairs


def test_dedup_two_phase_matches_window_semantics(docs):
    """dedup_exact_two_phase (pre-aggregated decision + join-back) must
    keep exactly the min-id row per fingerprint — same answer as the
    semi-join form, different (skew-safe) plan."""
    from data_export_tool_spark.operators.dedup import dedup_exact_two_phase

    kept = sorted(r.doc_id for r in dedup_exact_two_phase(docs).collect())
    assert kept == [1, 3, 4, 6]


def test_dedup_two_phase_hot_cluster(spark):
    """The 100 TB skew scenario in miniature: 10⁵ copies of ONE
    normalized text (a mega-duplicate cluster) plus a sprinkle of
    unique docs. The two-phase shape must (a) return the single keeper
    for the hot fingerprint and every unique doc, and (b) plan the
    decision as a map-side-combined aggregate — no Window over the
    fingerprint, which would serialize the hot cluster onto one task."""
    from data_export_tool_spark.operators.dedup import dedup_exact_two_phase

    n_hot = 100_000
    hot = spark.range(n_hot).select(
        F.col("id").alias("doc_id"),
        F.lit("boilerplate page repeated everywhere").alias("text"),
    )
    uniq = spark.range(n_hot, n_hot + 50).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("unique document number "), F.col("id")).alias("text"),
    )
    df = hot.unionByName(uniq)
    out = dedup_exact_two_phase(df)
    plan = out._jdf.queryExecution().explainString(
        out.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
    assert "Window" not in plan, "dedup decision regressed to a window"
    assert "partial_min" in plan, "decision aggregate lost map-side combine"
    kept = sorted(r.doc_id for r in out.collect())
    assert kept == [0] + list(range(n_hot, n_hot + 50))


def test_incremental_dedup_against_store(spark):
    """Cross-snapshot dedup: docs whose (normalized) content was seen
    in a previous snapshot drop; new content survives; the rolled-
    forward store covers both snapshots."""
    from data_export_tool_spark.operators.dedup import (
        dedup_against,
        fingerprint_store,
    )

    snap1 = spark.createDataFrame(
        [(1, "the cat sat"), (2, "something else entirely")],
        "doc_id long, text string",
    )
    store = fingerprint_store(snap1)
    snap2 = spark.createDataFrame(
        [
            (10, "The cat   sat!"),  # normalizes to snap1 doc 1 → drop
            (11, "completely new text"),
            (12, "something else entirely"),  # exact repeat → drop
        ],
        "doc_id long, text string",
    )
    kept = sorted(r.doc_id for r in dedup_against(snap2, store).collect())
    assert kept == [11]
    # roll the store forward: union of both snapshots' fingerprints
    rolled = store.unionByName(fingerprint_store(snap2)).distinct()
    assert rolled.count() == 3  # cat-sat, something-else, new-text
    none_left = dedup_against(snap2, rolled).count()
    assert none_left == 0


def test_null_text_rows_dedup_as_one_cluster(spark):
    # GROUP BY semantics: NULL texts are one cluster in every SQL
    # engine, but a plain equi-join on the nullable fingerprint never
    # matches NULL — the two-phase join-back form silently kept every
    # NULL-text row until the key became null-safe. All three forms
    # must agree: one survivor (min id) from the NULL cluster.
    from data_export_tool_spark.operators.dedup import (
        dedup_against,
        dedup_exact,
        dedup_exact_two_phase,
        fingerprint_store,
    )

    df = spark.createDataFrame(
        [(1, None), (2, None), (3, "a a"), (4, "a a"), (5, "b")],
        "doc_id long, text string",
    )
    expect = [1, 3, 5]
    assert sorted(r.doc_id for r in dedup_exact(df).collect()) == expect
    assert sorted(r.doc_id for r in dedup_exact_two_phase(df).collect()) == expect
    # incremental: a later snapshot's NULL-text row is a repeat too
    store = fingerprint_store(df)
    snap2 = spark.createDataFrame(
        [(6, None), (7, "a a"), (8, "new")], "doc_id long, text string"
    )
    assert sorted(r.doc_id for r in dedup_against(snap2, store).collect()) == [8]
