"""Physical-plan contracts (SURVEY.md §4 / the 100 TB design point).

Correctness tests prove the numbers; these prove the PLANS — the
properties that decide whether a query survives a 1000-executor,
100 TB run: filters reach the parquet scan, projections prune the read
schema, small dimensions broadcast, candidate generation never goes
cartesian, and the as-of join carries no retry-unsafe row ids.
Planning only — nothing executes.
"""

from __future__ import annotations

import re

import pytest

from data_export_tool_spark.queries import all_queries

SPECS = all_queries()


def plan_of(spark, sf_dir, name: str) -> str:
    df = SPECS[name].builder(spark, sf_dir)
    return df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )


def op_counts(plan: str) -> dict[str, int]:
    """Unique physical operators by id (the formatted mode prints each
    operator twice: once in the tree, once in the detail section)."""
    ops: dict[int, str] = {}
    for m in re.finditer(r"^\((\d+)\) (\S+)", plan, re.MULTILINE):
        ops[int(m.group(1))] = m.group(2)
    out: dict[str, int] = {}
    for op in ops.values():
        out[op] = out.get(op, 0) + 1
    return out


def test_filter_pushdown_reaches_scan(spark, sf_dir):
    # q09's ship-window predicate must land in PushedFilters, not a
    # post-scan Filter only
    plan = plan_of(spark, sf_dir, "q09_shipments_in_window")
    assert "PushedFilters: [" in plan
    pushed = [
        l for l in plan.splitlines() if "PushedFilters" in l and "[]" not in l
    ]
    assert pushed, "no non-empty PushedFilters in q09's scan"


def test_column_pruning_in_read_schema(spark, sf_dir):
    # q01 touches 7 of lineitem's 16 columns; the scan must not read
    # the full row
    plan = plan_of(spark, sf_dir, "q01_pricing_summary")
    read = [l for l in plan.splitlines() if "ReadSchema" in l]
    assert read
    assert "l_comment" not in read[0], "scan reads unprojected columns"


def test_dimension_joins_broadcast(spark, sf_dir):
    # q16 joins region/nation dims: tiny sides must broadcast, never
    # shuffle the fact on a dim join
    plan = plan_of(spark, sf_dir, "q16_regional_sales")
    assert "BroadcastHashJoin" in plan


def test_minhash_lsh_no_cartesian(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "d04_doc_minhash_lsh")
    assert "CartesianProduct" not in plan
    # the candidate join is an equi-join on the band key
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan or "BroadcastHashJoin" in plan


def test_near_dup_default_no_collect_no_cartesian(spark, sf_dir):
    # v02's default path: banded self-equi-join; the corpus is never
    # broadcast wholesale and no all-pairs product appears
    plan = plan_of(spark, sf_dir, "v02_embedding_near_dups")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_brute_force_broadcasts_queries_not_corpus(spark, sf_dir):
    # v01: the tiny query batch broadcasts; the corpus is scanned once
    plan = plan_of(spark, sf_dir, "v01_embedding_topk")
    counts = op_counts(plan)
    assert counts.get("BroadcastExchange", 0) == 1  # the query batch
    # two scans total: query batch + ONE corpus pass
    assert counts.get("Scan", 0) == 2


def test_asof_join_plan_is_retry_safe(spark, sf_dir):
    # the as-of rewrite must not rely on monotonically_increasing_id
    # (recomputed on task retry) nor a global row_number window
    plan = plan_of(spark, sf_dir, "q08_asof_last_shipment")
    assert "monotonically_increasing_id" not in plan
    assert "CartesianProduct" not in plan


def test_ivf_probe_join_broadcasts(spark, sf_dir):
    # v04: probes (queries x n_probe cells) broadcast to the assigned
    # corpus — the corpus itself never shuffles for the probe join
    plan = plan_of(spark, sf_dir, "v04_embedding_ivf_topk")
    assert "BroadcastHashJoin" in plan


def test_simhash_single_aggregate_shuffle(spark, sf_dir):
    # d07: per self-join side, the signature is explode + ONE
    # map-side-combining groupBy — bounded exchange count: 2 fan_out
    # repartitions + 2 signature aggregates + band join + final distinct
    plan = plan_of(spark, sf_dir, "d07_doc_simhash_pairs")
    counts = op_counts(plan)
    n_exchanges = counts.get("Exchange", 0) + counts.get("BroadcastExchange", 0)
    assert n_exchanges <= 7, counts
    assert "CartesianProduct" not in plan


def test_running_window_single_exchange(spark, sf_dir):
    # q17: cumulative sum + lag + row_number share ONE partitioning and
    # ordering — a single Exchange on o_custkey, a single Sort feeding
    # one Window operator (plus the presentational global sort)
    plan = plan_of(spark, sf_dir, "q17_running_revenue")
    counts = op_counts(plan)
    assert counts.get("Window", 0) <= 2, counts  # frame + frameless group
    # one shuffle for the window, one range-exchange for the output sort
    assert counts.get("Exchange", 0) <= 2, counts


def test_rollup_is_expand_plus_one_aggregate_pass(spark, sf_dir):
    # q18: ROLLUP plans as Expand -> hash aggregate; all grouping levels
    # in one pass over the fact, dims broadcast
    plan = plan_of(spark, sf_dir, "q18_rollup_sales")
    counts = op_counts(plan)
    assert counts.get("Expand", 0) == 1, counts
    assert "BroadcastHashJoin" in plan
    assert counts.get("Exchange", 0) <= 2, counts  # agg shuffle + sort


def test_pinned_pivot_runs_no_distinct_job(spark, sf_dir):
    # q22 pins pivot values: ONE scan of orders and no distinct-values
    # discovery pass (an unpinned pivot runs a separate collect job
    # first — invisible in this plan but it would show as work before
    # planning; the pinned plan is (status,priority) count -> pivotfirst)
    plan = plan_of(spark, sf_dir, "q22_priority_pivot")
    counts = op_counts(plan)
    assert counts.get("Scan", 0) == 1, counts
    assert counts.get("Exchange", 0) <= 3, counts
    assert "pivotfirst" in plan


def test_upsert_single_shuffle_on_merge_key(spark, sf_dir):
    # c01: union + window dedup — the merge costs ONE exchange on the
    # merge key (plus the presentational sort); no join appears at all
    plan = plan_of(spark, sf_dir, "c01_orders_upsert")
    counts = op_counts(plan)
    joins = [k for k in counts if "Join" in k]
    assert not joins, counts
    assert counts.get("Exchange", 0) <= 2, counts


def test_mixture_sample_is_scanside_filter(spark, sf_dir):
    # d09: the sampling predicate is a per-row filter directly over the
    # scan — no shuffle, no join, no window; the one Exchange allowed is
    # the presentational output sort
    plan = plan_of(spark, sf_dir, "d09_doc_mixture_sample")
    counts = op_counts(plan)
    assert counts.get("Filter", 0) >= 1, counts
    joins = [k for k in counts if "Join" in k]
    assert not joins, counts
    assert counts.get("Exchange", 0) <= 2, counts  # fan_out + output sort


def test_decontamination_broadcasts_eval_ngrams(spark, sf_dir):
    # d11: the eval-side n-gram set broadcasts (benchmarks are tiny
    # next to a 100 TB corpus); the match is a broadcast hash join —
    # never a shuffle of the exploded training n-grams against eval,
    # and never a cartesian pairing
    plan = plan_of(spark, sf_dir, "d11_doc_decontamination")
    counts = op_counts(plan)
    assert counts.get("BroadcastExchange", 0) >= 1, counts
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_repetition_stats_one_scan_no_join(spark, sf_dir):
    # d12: the per-doc constants ride through the two aggregations as
    # grouping keys, so the corpus is scanned ONCE and there is no
    # join-back; exchanges = fan_out + 2 agg shuffles + output sort
    plan = plan_of(spark, sf_dir, "d12_doc_repetition")
    counts = op_counts(plan)
    joins = [k for k in counts if "Join" in k]
    assert not joins, counts
    assert counts.get("Scan", 0) == 1, counts
    assert counts.get("Exchange", 0) <= 4, counts


def test_quant_error_is_shuffle_free(spark, sf_dir):
    # v05: quantization error is a pure per-row projection — the only
    # exchange permitted is the presentational output sort
    plan = plan_of(spark, sf_dir, "v05_embedding_quant_error")
    counts = op_counts(plan)
    joins = [k for k in counts if "Join" in k]
    assert not joins, counts
    assert counts.get("Exchange", 0) <= 1, counts  # output sort only


def test_quantized_topk_broadcasts_queries_not_corpus(spark, sf_dir):
    # v06 composes quantize + brute-force search: same contract as v01
    # (query batch broadcasts, corpus scanned once, no cartesian)
    plan = plan_of(spark, sf_dir, "v06_embedding_quantized_topk")
    counts = op_counts(plan)
    assert counts.get("BroadcastExchange", 0) == 1, counts
    assert counts.get("Scan", 0) == 2, counts
    assert "CartesianProduct" not in plan


def test_curation_pipeline_two_scans_linear(spark, sf_dir):
    # d13 composes five curation stages into one plan: the corpus is
    # scanned ONCE (plus one holdout scan), the eval n-grams broadcast,
    # and the only shuffles are fan_out, the dedup-fingerprint window,
    # the contamination count, the eval distinct, the shard window, and
    # the output sort — no joins other than the broadcast, no cartesian
    plan = plan_of(spark, sf_dir, "d13_curation_pipeline")
    counts = op_counts(plan)
    assert counts.get("Scan", 0) == 2, counts
    assert counts.get("Window", 0) == 2, counts
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    joins = [k for k in counts if "Join" in k]
    assert joins == ["BroadcastHashJoin"], counts
    assert counts.get("Exchange", 0) <= 6, counts


def test_token_shards_single_window_pass(spark, sf_dir):
    # d10: running sum + shard id come out of ONE window (one exchange
    # on the stratum key + one sort), never a self-join or second pass
    plan = plan_of(spark, sf_dir, "d10_doc_token_shards")
    counts = op_counts(plan)
    assert counts.get("Window", 0) == 1, counts
    joins = [k for k in counts if "Join" in k]
    assert not joins, counts
    assert counts.get("Exchange", 0) <= 3, counts  # fan_out + window + sort
