"""Skew/scale stress tier (VERDICT r4 #7): the hot-key shapes proven
at 10⁵ in the regular suite, re-run at 10⁶–10⁷ synthetic rows so the
"would survive 100×" claims have an executable check instead of
plan-text assertions alone.

Opt-in: ``SPARK_GRAFT_STRESS=1 python -m pytest -m stress tests/``.
Row counts scale with SPARK_GRAFT_STRESS_ROWS (default 2,000,000).
All inputs are generated executor-side from ``spark.range`` — no
driver-side materialization anywhere, so the tier exercises exactly
the distributed path. Assertions are closed-form invariants (exact
keeper sets, analytic counts, budget laws, cross-implementation
equality), never "it didn't crash".
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

pytestmark = pytest.mark.stress

N = int(os.environ.get("SPARK_GRAFT_STRESS_ROWS", "2000000"))


def test_stress_dedup_hot_cluster(spark):
    """N copies of one normalized text + 1000 unique docs: the
    two-phase dedup must return exactly the min-id keeper for the
    mega-cluster and every unique doc."""
    from data_export_tool_spark.operators.dedup import dedup_exact_two_phase

    hot = spark.range(N).select(
        F.col("id").alias("doc_id"),
        F.lit("boilerplate page repeated everywhere").alias("text"),
    )
    uniq = spark.range(N, N + 1000).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("unique document number "), F.col("id")).alias("text"),
    )
    out = dedup_exact_two_phase(hot.unionByName(uniq))
    assert out.count() == 1001
    got_hot = out.where(F.col("doc_id") < N).select("doc_id").collect()
    assert [r["doc_id"] for r in got_hot] == [0]


def test_stress_funnel_hot_user(spark):
    """One bot user with N step-typed events plus 10k normal users.
    The streamed fold must complete the bot's chain (its click and
    purchase land AFTER all N views) and every normal user's 2-step
    chain, with O(k) state per open user."""
    from data_export_tool_spark.operators.funnel import funnel_steps

    t0 = F.lit("2024-01-01 00:00:00").cast("timestamp")
    hot = spark.range(N).select(
        F.lit(7).cast("long").alias("user_id"),
        (t0 + F.make_interval(secs=F.col("id").cast("double"))).alias("ts"),
        F.lit("view").alias("event_type"),
    )
    hot_tail = spark.range(2).select(
        F.lit(7).cast("long").alias("user_id"),
        (
            t0
            + F.make_interval(secs=(F.lit(N + 10) + F.col("id")).cast("double"))
        ).alias("ts"),
        F.when(F.col("id") == 0, F.lit("click"))
        .otherwise(F.lit("purchase"))
        .alias("event_type"),
    )
    n_users = 10_000
    normal = spark.range(2 * n_users).select(
        (F.lit(100) + F.col("id") % n_users).cast("long").alias("user_id"),
        (t0 + F.make_interval(secs=F.col("id").cast("double"))).alias("ts"),
        F.when(F.col("id") < n_users, F.lit("view"))
        .otherwise(F.lit("click"))
        .alias("event_type"),
    )
    out = funnel_steps(
        hot.unionByName(hot_tail).unionByName(normal),
        ["view", "click", "purchase"],
    )
    counts = {
        r["n_steps"]: r["c"]
        for r in out.groupBy("n_steps").agg(F.count(F.lit(1)).alias("c")).collect()
    }
    # normal user u sees view at t0+(u-100) and click at t0+n_users+(u-100):
    # strictly later -> every normal user completes exactly 2 steps
    assert counts == {3: 1, 2: n_users}
    bot = out.where(F.col("user_id") == 7).first()
    assert bot["n_steps"] == 3
    assert str(bot["ts_1"]).startswith("2024-01-01 00:00:00")


def test_stress_semantic_dedup_mega_cluster(spark):
    """Round-5 verdict #1 executable proof: a 10⁵-member near-identical
    embedding cluster flows through the star-edge candidate stage as
    O(B) rows — the edge stage emits EXACTLY B−1 edges (one hub) where
    pair enumeration would emit B(B−1)/2 ≈ 5·10⁹ — and semantic_dedup
    keeps exactly the min-id representative plus every singleton."""
    from data_export_tool_spark.operators.similarity import (
        embedding_near_dup_edges,
        semantic_dedup,
    )

    B = max(100_000, N // 20)
    cluster = spark.range(B).select(
        F.col("id").alias("vec_id"),
        F.array(F.lit(1.0), F.lit(0.5), F.lit(0.25), F.lit(0.125)).alias(
            "embedding"
        ),
    )
    # singletons: directions in the (e3, e4) plane, 0.2 rad apart
    # (cos 0.99 ⇔ 0.141 rad, so no singleton pair qualifies; max
    # cosine vs the cluster direction is 0.242) — 28 fit in the circle
    # with > 0.141 rad wraparound margin
    n_singles = 28
    singles = spark.range(n_singles).select(
        (F.lit(10_000_000) + F.col("id")).alias("vec_id"),
        F.array(
            F.lit(0.0),
            F.lit(0.0),
            F.cos(F.col("id") * 0.2),
            F.sin(F.col("id") * 0.2),
        ).alias("embedding"),
    )
    df = cluster.unionByName(singles)
    edges = embedding_near_dup_edges(
        df, threshold=0.99, dim=4, star_bucket_threshold=256
    )
    assert edges.count() == B - 1
    kept = sorted(
        r["vec_id"]
        for r in semantic_dedup(
            df, threshold=0.99, dim=4, star_bucket_threshold=256
        ).collect()
    )
    assert kept == [0] + [10_000_000 + i for i in range(n_singles)]


def test_stress_latest_n_hot_entity(spark):
    """One entity with N rows plus 10k normal entities: the salted
    two-phase top-N must return the closed-form latest-3 of the hot
    key and every small key's full ranking — without a single-task
    full-key sort (the shape the operator exists for)."""
    from data_export_tool_spark.operators.window_dedup import latest_n_per_key

    hot = spark.range(N).select(
        F.lit(1).cast("long").alias("k"), F.col("id").alias("seq")
    )
    n_small = 10_000
    small = spark.range(2 * n_small).select(
        (F.lit(100) + F.col("id") % n_small).cast("long").alias("k"),
        (F.lit(3_000_000_000) + F.col("id")).alias("seq"),
    )
    out = latest_n_per_key(hot.unionByName(small), ["k"], ["seq"], n=3)
    hot_rows = {
        (r["row_num"]): r["seq"]
        for r in out.where(F.col("k") == 1).collect()
    }
    assert hot_rows == {1: N - 1, 2: N - 2, 3: N - 3}
    # each small key has exactly 2 rows -> 2 ranked rows apiece
    counts = (
        out.where(F.col("k") >= 100)
        .groupBy("k")
        .agg(F.count(F.lit(1)).alias("c"))
        .agg(F.min("c"), F.max("c"), F.count(F.lit(1)))
        .first()
    )
    assert tuple(counts) == (2, 2, n_small)


def test_stress_grouped_topk_matches_exact(spark):
    """Grouped MG two-pass vs the exact salted form over a skewed
    high-cardinality item column: identical (group, item, count)
    output at scale."""
    from data_export_tool_spark.operators.sketch import (
        exact_topk,
        grouped_topk_two_pass,
    )

    # every group gets 10 hot items (count N/80 each — far above the
    # MG retention bound N/(cap+1)) plus N/8 cold singletons; the MG
    # pass must surface the hitters in EVERY group, the exact recount
    # must make the counts identical to the full-shuffle form
    df = spark.range(N).select(
        (F.col("id") % 4).cast("string").alias("g"),
        F.when(
            (F.col("id") / 4).cast("long") % 2 == 0,
            ((F.col("id") / 4).cast("long") % 10).cast("string"),
        )
        .otherwise(F.concat(F.lit("cold_"), F.col("id")))
        .alias("item"),
    )
    want = sorted(
        (r["g"], r["item"], r["cnt"])
        for r in exact_topk(df, "item", 5, by=["g"]).collect()
    )
    got = sorted(
        (r["g"], r["item"], r["cnt"])
        for r in grouped_topk_two_pass(df, "item", 5, by="g", n_groups_hint=4).collect()
    )
    assert got == want


def test_stress_pack_token_shards_budget_law(spark):
    """Two-phase prefix-sum packing at scale: cum_tokens must equal
    the analytic stratum totals and shard_id must follow the
    floor((cum - tok) / budget) law row-for-row."""
    from data_export_tool_spark.operators.sampling import pack_token_shards

    budget = 1_000_000
    df = spark.range(N).select(
        F.col("id").alias("doc_id"),
        (F.lit(50) + F.col("id") % 100).cast("long").alias("n_tokens"),
        (F.col("id") % 3).cast("string").alias("lang"),
    )
    out = pack_token_shards(
        df, "n_tokens", budget, order_col="doc_id", strata_col="lang"
    )
    # row-for-row law, checked distributively (zero violations)
    bad = out.where(
        F.col("shard_id")
        != F.floor((F.col("cum_tokens") - F.col("n_tokens")) / F.lit(budget))
    ).count()
    assert bad == 0
    # per-stratum final cumulative == analytic token total
    got_tot = {
        r["lang"]: r["mx"]
        for r in out.groupBy("lang").agg(F.max("cum_tokens").alias("mx")).collect()
    }
    want_tot = {
        r["lang"]: r["s"]
        for r in df.groupBy("lang").agg(F.sum("n_tokens").alias("s")).collect()
    }
    assert got_tot == want_tot
    # shards are contiguous: per (lang, shard) the row count implied by
    # the budget law holds — every shard except the last is "full"
    # (its span crosses at least budget tokens)
    # span = last row's END offset minus first row's START offset;
    # start = cum - tok, so the group min/max give both ends exactly
    spans = (
        out.groupBy("lang", "shard_id")
        .agg(
            (
                F.max("cum_tokens")
                - F.min(F.col("cum_tokens") - F.col("n_tokens"))
            ).alias("span")
        )
        .collect()
    )
    last = {
        r["lang"]: r["m"]
        for r in out.groupBy("lang").agg(F.max("shard_id").alias("m")).collect()
    }
    for r in spans:
        if r["shard_id"] != last[r["lang"]]:
            assert r["span"] >= budget - 149  # minus max single-row tokens


def test_stress_transitions_hot_user(spark):
    """One bot user with N alternating a/b events plus 10k two-event
    normal users: the transition fold streams the bot through Arrow
    batches (carry-state, no per-user window) and the global counts
    obey the closed form."""
    from data_export_tool_spark.operators.sequences import transition_counts

    bot = spark.range(N).select(
        F.lit(0).alias("user_id"),
        F.timestamp_seconds(1700000000 + F.col("id")).alias("ts"),
        F.when(F.col("id") % 2 == 0, "a").otherwise("b").alias("event_type"),
        F.col("id").alias("event_id"),
    )
    normals = spark.range(10_000).select(
        (F.col("id") + 1).alias("user_id"),
        F.timestamp_seconds(1700000000 + F.col("id")).alias("ts"),
        F.lit("x").alias("event_type"),
        (N + 2 * F.col("id")).alias("event_id"),
    )
    normals2 = spark.range(10_000).select(
        (F.col("id") + 1).alias("user_id"),
        F.timestamp_seconds(1700000100 + F.col("id")).alias("ts"),
        F.lit("y").alias("event_type"),
        (N + 2 * F.col("id") + 1).alias("event_id"),
    )
    ev = bot.unionByName(normals).unionByName(normals2)
    got = {
        (r["prev_event"], r["next_event"]): r["n_transitions"]
        for r in transition_counts(ev).collect()
    }
    want = {
        ("a", "b"): N // 2,
        ("b", "a"): N // 2 - 1,
        ("x", "y"): 10_000,
    }
    assert got == want, got


def test_stress_agg_store_hot_delta(spark):
    """Partial-aggregate store at N rows / 1000 groups with one group
    holding half the mass; a delta that touches 10 groups plus one
    brand-new group. Law: the incremental fold EXACTLY equals a
    from-scratch recompute over old ∪ delta (count/sum/min/max are
    algebraic, so equality is exact, not approximate)."""
    from data_export_tool_spark.operators.aggstore import (
        agg_store_init,
        agg_store_read,
        agg_store_update,
    )

    old = spark.range(N).select(
        F.when(F.col("id") % 2 == 0, 0)
        .otherwise(F.col("id") % 1000)
        .alias("grp"),
        (F.col("id") % 10007).cast("double").alias("value"),
    )
    delta = spark.range(100_000).select(
        F.when(F.col("id") % 11 == 10, 1000)  # brand-new group
        .otherwise(F.col("id") % 10)
        .alias("grp"),
        (F.col("id") % 997 + 0.5).alias("value"),
    )
    aggs = {"value": ["sum", "min", "max", "avg"]}
    updated = agg_store_read(
        agg_store_update(agg_store_init(old, ["grp"], aggs), delta, ["grp"], aggs),
        aggs,
    )
    full = agg_store_read(
        agg_store_init(old.unionByName(delta), ["grp"], aggs), aggs
    )
    got = {r["grp"]: r for r in updated.collect()}
    want = {r["grp"]: r for r in full.collect()}
    # old contributes {0} ∪ odd residues (501 groups); the delta adds
    # even single-digit groups and the brand-new 1000
    assert set(got) == set(want)
    assert len(got) > 500 and 1000 in got
    for g, w in want.items():
        r = got[g]
        assert r["n_rows"] == w["n_rows"]
        assert r["value_min"] == w["value_min"]
        assert r["value_max"] == w["value_max"]
        assert abs(r["value_sum"] - w["value_sum"]) < 1e-6 * max(1.0, abs(w["value_sum"]))
        assert abs(r["value_avg"] - w["value_avg"]) < 1e-9 * max(1.0, abs(w["value_avg"]))


def test_stress_ridge_exact_target_recovery(spark):
    """Closed-form ridge at N rows, d=8 executor-generated features
    with an exactly linear target: the distributed Gram pass must
    recover the generating weights (closed-form law — tiny reg, zero
    noise ⇒ weights match to high precision and R² ≈ 1)."""
    from data_export_tool_spark.operators.linear import ridge_fit

    feats = [((F.col("id") * (i + 3)) % 1009).cast("double") / 1009.0
             for i in range(8)]
    true_w = [2.0, -1.5, 0.75, 3.0, -0.25, 1.0, -2.0, 0.5]
    target = F.lit(0.3)
    for w_i, f in zip(true_w, feats):
        target = target + F.lit(w_i) * f
    df = spark.range(N).select(
        F.array(*feats).alias("embedding"), target.alias("y")
    )
    model = ridge_fit(df, "y", reg=1e-9)
    assert model["n"] == N
    assert model["r2"] > 1 - 1e-9
    for got, want in zip(model["weights"], true_w):
        assert abs(got - want) < 1e-5
    assert abs(model["intercept"] - 0.3) < 1e-5


def test_stress_span_dedup_hot_passage(spark):
    """N/20 docs all embedding the SAME 12-token boilerplate passage
    (one whash group of N/20 members — the map-side-combine claim)
    plus unique tails. Laws: every doc keeps its unique tail, exactly
    one canonical copy of the passage survives corpus-wide, and
    removal counts add up."""
    from data_export_tool_spark.operators.spans import strip_duplicate_spans

    n_docs = max(N // 20, 1000)
    boiler = "the quick brown fox jumps over the lazy dog again and again"
    # the unique token must DIRECTLY follow the boilerplate: any window
    # of shared tokens is a legitimate corpus-wide duplicate, so a
    # shared tail would (correctly) extend the stripped span past the
    # boilerplate — u<id> right after it bounds the duplicated region
    # to exactly the 12 boilerplate tokens
    docs = spark.range(n_docs).select(
        F.col("id").alias("doc_id"),
        F.concat(
            F.lit(boiler + " u"), F.col("id").cast("string")
        ).alias("text"),
    )
    out = strip_duplicate_spans(docs, n=12).select(
        "doc_id", "text", "span_dedup_removed"
    )
    agg = out.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("span_dedup_removed").alias("removed"),
        F.sum(
            F.when(F.col("text").startswith("the quick"), 1).otherwise(0)
        ).alias("kept_boiler"),
        F.sum(
            F.when(
                F.col("text").contains(
                    F.concat(F.lit("u"), F.col("doc_id").cast("string"))
                ),
                1,
            ).otherwise(0)
        ).alias("kept_unique"),
    ).collect()[0]
    assert agg["n"] == n_docs
    assert agg["kept_boiler"] == 1  # exactly one canonical copy
    assert agg["removed"] == 12 * (n_docs - 1)
    assert agg["kept_unique"] == n_docs  # unique tokens always survive


def test_stress_triangles_star_hub(spark):
    """A star graph with one hub of degree N/4: the naive wedge join
    would enumerate (N/4 choose 2) hub wedges; degree orientation
    points every edge leaf→hub (out-degree ≤ 1 per leaf), so the
    wedge stage is EMPTY. Analytic truth: 0 triangles everywhere,
    hub degree N/4, plus one attached 3-clique to prove counting
    still works beside the hub."""
    from data_export_tool_spark.operators.triangles import triangle_counts

    n_leaves = N // 4
    star = spark.range(1, n_leaves + 1).select(
        F.lit(0).cast("long").alias("s"), F.col("id").alias("d")
    )
    # one triangle far away: nodes -1, -2, -3
    tri = spark.createDataFrame(
        [(-1, -2), (-2, -3), (-1, -3)], "s long, d long"
    )
    out = triangle_counts(star.unionByName(tri), "s", "d")
    agg = {r["node"]: (r["degree"], r["triangles"]) for r in out.where(
        F.col("node").isin(0, -1, -2, -3)
    ).collect()}
    assert agg[0] == (n_leaves, 0)
    assert agg[-1] == (2, 1) and agg[-2] == (2, 1) and agg[-3] == (2, 1)
    assert out.where(F.col("triangles") > 0).count() == 3


def test_stress_frequent_pairs_hot_basket_guard(spark):
    """One degenerate basket with 50k distinct items (a crawler
    session) would alone emit 1.25B pairs; the guard must drop it,
    count it, and leave the analytic truth of the normal baskets:
    N/2 two-item baskets all containing the same pair."""
    from data_export_tool_spark.operators.basket import frequent_pairs

    n_norm = N // 2
    hot = spark.range(50_000).select(
        F.lit(-1).cast("long").alias("basket"),
        F.concat(F.lit("item_"), F.col("id")).alias("item"),
    )
    norm = spark.range(n_norm).select(
        F.col("id").alias("basket"), F.lit("aa").alias("item")
    ).unionByName(
        spark.range(n_norm).select(
            F.col("id").alias("basket"), F.lit("bb").alias("item")
        )
    )
    out = frequent_pairs(
        hot.unionByName(norm), "basket", "item",
        min_support_count=2, max_basket_items=1000,
    ).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["item_a"], r["item_b"]) == ("aa", "bb")
    assert r["n_pair"] == n_norm and r["n_baskets"] == n_norm
    assert r["n_dropped_baskets"] == 1
    assert r["lift"] == pytest.approx(1.0)


def test_stress_nbayes_hot_class(spark):
    """N docs of one class vs 1000 of another, shared + disjoint
    vocab: fit stays one count exchange (no per-class windows), the
    priors/likelihoods match the closed form, and scoring a
    discriminative token classifies correctly."""
    import math

    from data_export_tool_spark.operators.nbayes import nbayes_fit, nbayes_predict

    big = spark.range(N).select(
        F.col("id").alias("doc_id"), F.lit("common spamword").alias("text"),
        F.lit("spam").alias("lang"),
    )
    small = spark.range(N, N + 1000).select(
        F.col("id").alias("doc_id"), F.lit("common hamword").alias("text"),
        F.lit("ham").alias("lang"),
    )
    model = nbayes_fit(big.unionByName(small), "text", "lang")
    assert model.vocab_size == 3
    assert model.log_priors["spam"] == pytest.approx(math.log(N / (N + 1000)))
    probe = spark.createDataFrame(
        [(1, "hamword"), (2, "spamword")], "doc_id long, text string"
    )
    pred = {r["doc_id"]: r["predicted"] for r in nbayes_predict(model, probe).collect()}
    # closed-form posteriors: P(t|c) = (c_t+alpha)/(tot_c + alpha*V)
    p_ham = math.log(1000 / (N + 1000)) + math.log((1000 + 1) / (2000 + 3))
    p_spam = math.log(N / (N + 1000)) + math.log((0 + 1) / (2 * N + 3))
    want_ham = "ham" if p_ham > p_spam else "spam"
    assert pred[1] == want_ham
    p2_ham = math.log(1000 / (N + 1000)) + math.log((0 + 1) / (2000 + 3))
    p2_spam = math.log(N / (N + 1000)) + math.log((N + 1) / (2 * N + 3))
    assert pred[2] == ("spam" if p2_spam > p2_ham else "ham")


def test_stress_random_walks_star_hub(spark):
    """A star with N/8 leaves: every leaf's walk bounces
    leaf→hub→some-leaf→hub…; the composite-key (node, rank) join must
    cost one lookup per visiting walk, never a hub-adjacency fan-out.
    Analytic truths: every walk has exactly walk_length steps (no
    sinks in an undirected star), odd steps are ALWAYS the hub for
    leaf-started walks, and every consecutive pair is an edge by
    construction of the join."""
    from data_export_tool_spark.operators.walks import random_walks

    n_leaves = N // 8
    star = spark.range(1, n_leaves + 1).select(
        F.lit(0).cast("long").alias("s"), F.col("id").alias("d")
    )
    out = random_walks(star, "s", "d", n_walks=1, walk_length=4)
    total = out.count()
    assert total == (n_leaves + 1) * 4  # every node starts 1 walk, no sinks
    # leaf-started walks alternate leaf,0,leaf,0
    leaf_walks = out.where(~F.col("walk_id").startswith("0#"))
    odd = leaf_walks.where(F.col("step") % 2 == 1)
    assert odd.where(F.col("node") != 0).count() == 0
    assert odd.count() == n_leaves * 2
    even_nonhub = leaf_walks.where((F.col("step") % 2 == 0) & (F.col("node") == 0))
    assert even_nonhub.count() == 0


def test_stress_cms_bounded_cells(spark):
    """N rows, one hot item (N/2 copies) + N/2 distinct singletons:
    the sketch's cell count stays <= depth*width NO MATTER the input
    size (the whole point of a sketch), the hot item's estimate is
    >= its true count, and merge(parts) == full cellwise."""
    from data_export_tool_spark.operators.sketch import (
        cms_build,
        cms_estimate,
        cms_merge,
    )

    D, W = 4, 512
    df = spark.range(N).select(
        F.col("id"),
        F.when(F.col("id") % 2 == 0, F.lit("hot"))
        .otherwise(F.concat(F.lit("u"), F.col("id")))
        .alias("item"),
    )
    sk = cms_build(df, "item", depth=D, width=W)
    n_cells = sk.count()
    assert n_cells <= D * W
    items = spark.createDataFrame([("hot",)], "item string")
    est = cms_estimate(sk, items, "item", depth=D, width=W).collect()[0]["est"]
    assert est >= N // 2
    # estimate error bounded by the sketch guarantee at e/W * N' where
    # N' = total increments per row-hash = N; allow 3x slack for the
    # adversarial 50% hot mass
    assert est - N // 2 <= 3 * (2.718 / W) * N
    halves = [
        cms_build(df.where(F.col("id") % 4 < 2 if i == 0 else F.col("id") % 4 >= 2),
                  "item", depth=D, width=W)
        for i in (0, 1)
    ]
    merged = {
        (r["row"], r["bucket"]): r["cnt"]
        for r in cms_merge(halves[0].unionByName(halves[1])).collect()
    }
    full = {(r["row"], r["bucket"]): r["cnt"] for r in sk.collect()}
    assert merged == full


def test_stress_rank_transform_mega_tie(spark):
    """90% of N rows share ONE value (the classic zeros column), the
    rest are distinct: the value-grain collapse must absorb the
    mega-tie map-side (one (value, count) row — a row-grain window
    would serialize 0.9·N rows onto one task). Closed-form truths:
    the tie value's rank is 1 (it is the minimum), every distinct
    tail value's rank = 0.9·N + its index among the tail, and the
    max rank equals N − tail_size + ... — checked exactly on a
    sample."""
    from data_export_tool_spark.operators.features import rank_transform

    n_tail = 100_000
    n_hot = N - n_tail
    hot = spark.range(n_hot).select(
        F.col("id").alias("row_id"), F.lit(0.0).alias("x")
    )
    tail = spark.range(n_tail).select(
        (F.col("id") + n_hot).alias("row_id"),
        (F.col("id") + 1.0).cast("double").alias("x"),
    )
    df = hot.unionByName(tail)
    out = rank_transform(df, "x", method="rank", num_ranges=32)
    # the hot value is the global minimum -> rank 1 everywhere
    hot_ranks = out.where(F.col("x") == 0.0).select("x_rank").distinct().collect()
    assert [r["x_rank"] for r in hot_ranks] == [1]
    # tail value k (= k+1.0) has exactly n_hot + k rows before it
    sample = out.where(F.col("x") > 0).orderBy("x").limit(5).collect()
    for i, r in enumerate(sample):
        assert r["x_rank"] == n_hot + i + 1, r
    top = out.agg(F.max("x_rank")).first()[0]
    assert top == n_hot + n_tail  # max value is unique -> rank N


def test_stress_als_hot_user(spark):
    """One bot user interacting with N/20 items + a normal block: the
    per-user solve holds the bot's nnz x k factor block in one task
    (the documented bound) and must complete with finite factors;
    closed-form truths: factor tables cover exactly the distinct
    users/items, and every factor is finite."""
    from data_export_tool_spark.operators.als import als_implicit_fit

    n_items = N // 20
    bot = spark.range(n_items).select(
        F.lit(0).cast("long").alias("user_id"), F.col("id").alias("item_id")
    )
    # the bot IS the stress; the normal block is structure only
    normal = spark.range(N // 20).select(
        (F.col("id") % 500 + 1).alias("user_id"),
        (F.col("id") % n_items).alias("item_id"),
    )
    inter = bot.unionByName(normal)
    uf, itf = als_implicit_fit(inter, rank=4, iters=1)
    n_u = uf.count()
    assert n_u == 501  # bot + 500 normals
    assert itf.count() == n_items
    bad = uf.where(
        F.exists("factors", lambda v: F.isnan(v) | v.isNull())
    ).count()
    assert bad == 0


def test_stress_geo_radius_join_city_grid(spark):
    """N points on a jittered world grid + one dense city block:
    closed-form truths — every point matches itself at 0 km, the
    dense block's pair count is exactly quadratic in its size (the
    output-bound contract), and far-apart grid points never pair."""
    from data_export_tool_spark.operators.geo import geo_radius_join

    n_grid = N // 4
    grid = spark.range(n_grid).select(
        F.col("id").alias("pid"),
        (((F.col("id") * 37) % 1400) / 10.0 - 70.0).alias("lat"),
        (((F.col("id") * 53) % 3600) / 10.0 - 180.0).alias("lng"),
    )
    # a 3000-point city inside ~1 km
    city = spark.range(n_grid, n_grid + 3000).select(
        F.col("id").alias("pid"),
        (F.lit(40.0) + (F.col("id") % 60) / 10000.0).alias("lat"),
        (F.lit(10.05) + ((F.col("id") * 7) % 60) / 10000.0).alias("lng"),
    )
    pts = grid.unionByName(city)
    out = geo_radius_join(pts, pts, 2.0)
    total = out.count()
    self_pairs = out.where(F.col("pid_l") == F.col("pid_r")).count()
    assert self_pairs == n_grid + 3000  # everyone matches itself
    # city block: all 3000 points within ~0.9 km -> full quadratic
    city_pairs = out.where(
        (F.col("pid_l") >= n_grid) & (F.col("pid_r") >= n_grid)
    ).count()
    assert city_pairs == 3000 * 3000
    # grid lattice positions repeat every lcm(1400, 3600) = 25200 ids
    # (both multipliers are coprime to their moduli), so position p
    # hosts ⌈/⌊ n_grid/25200 points — all at distance 0; DIFFERENT
    # positions are ≥ ~3.8 km apart (0.1° raster at |lat| ≤ 70), so
    # grid pairs are exactly the per-position quadratics
    grid_pairs = out.where(
        (F.col("pid_l") < n_grid) & (F.col("pid_r") < n_grid)
    ).count()
    cycle = 25200
    per, rem = divmod(n_grid, cycle)
    want_grid = rem * (per + 1) ** 2 + (cycle - rem) * per ** 2
    assert grid_pairs == want_grid
