"""Benchmark harness: runs the engine's query catalog end-to-end.

Prints ONE COMPACT JSON line (the driver captures only the final ~2000
characters of stdout, so the line carries just the headline fields):
    {"metric":"catalog_total_wall","value":<total_sec>,"unit":"sec",
     "queries":{"q01_...":sec,...},"sf":0.1,"loadavg_1m":...,
     "global_shift":...,"regressions":[...],"subset_total_r03":...}
Everything bulky (per-query spreads, prev-round deltas, protocol
notes) goes to BENCH_DETAIL.json in the repo root instead.

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
     SPARK_GRAFT_CPUS (default 32),
     SPARK_GRAFT_BENCH_RUNS (timed runs per query, default 3).

Protocol (BASELINE.md "Measurement protocol"): warm the JVM, then per
query discard the first run and report the MEDIAN of the next
SPARK_GRAFT_BENCH_RUNS runs — single-run numbers at this scale carry
±40% JVM/page-cache noise (BENCH_r01: 52.55s vs a 38.3s clean run of
the same commit). Execution is measured with a `noop` sink (full
pipeline runs, nothing is collected to the driver) — the number is the
engine, not pandas conversion.

Run set = the 50-entry driver catalog minus the m* reference-report
replicas (fixed-seed fixtures that don't scale with sf) plus the
bench-only b* specs (queries/bench_extra.py) guarding operators that
landed after the catalog freeze.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    from data_export_tool_spark.session import get_spark
    from data_export_tool_spark.queries import all_queries
    from data_export_tool_spark.queries import bench_extra

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or 0.1)
    n_runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3"))

    spark = get_spark("bench")
    spark.sparkContext.setLogLevel("ERROR")

    specs = all_queries()

    # warm-up: JVM JIT + parquet footer caches (discarded per BASELINE.md)
    specs["q03_customer_order_profile"].builder(spark, sf_dir).write.format(
        "noop"
    ).mode("overwrite").save()

    def run_once(spec) -> float:
        t0 = time.perf_counter()
        spec.builder(spark, sf_dir).write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    # the m* entries are reference-report replicas over FIXED seeded
    # fixtures — they don't scale with sf, so they'd distort the
    # catalog-vs-sf metric; their correctness runs in the driver gate
    # and their runtime in the pytest parity suite. The b* bench-only
    # specs join the run set so post-freeze operators stay guarded.
    specs = {n: s for n, s in specs.items() if not n.startswith("m")}
    for spec in bench_extra.QUERIES:
        if spec.name in specs:
            raise ValueError(f"bench-extra name collides: {spec.name}")
        specs[spec.name] = spec
    # reference-report replicas at SF-SCALED patient counts (the fixed
    # 200-patient m* gate entries stay excluded; these mb_* twins run
    # the same line-list builders over a 100_000×sf-patient fixture so
    # the heaviest real reports have a wall-time guard — VERDICT r6
    # missing-#1). Their names start with "m" on purpose: they ride in
    # the compact line's "queries" dict, not the b_total aggregate.
    from data_export_tool_spark.queries import bench_mamba

    for spec in bench_mamba.QUERIES:
        if spec.name in specs:
            raise ValueError(f"bench-mamba name collides: {spec.name}")
        specs[spec.name] = spec

    def gc_barrier() -> None:
        # A long catalog session accumulates shuffle/broadcast garbage,
        # and a collection landing INSIDE a timed run shows up as a
        # sporadic multi-second spike on an unchanged plan (observed:
        # v02 1.6→4.2 s run-to-run; stable 2.0-2.3 s with this
        # barrier). Collecting BETWEEN runs moves the pause out of the
        # measurement — standard JVM bench hygiene.
        spark.sparkContext._jvm.System.gc()

    timings: dict[str, float] = {}
    spreads: dict[str, float] = {}
    for name, spec in sorted(specs.items()):
        run_once(spec)  # per-query warm run, discarded
        runs = sorted(
            (gc_barrier() or run_once(spec)) for _ in range(n_runs)
        )
        timings[name] = round(statistics.median(runs), 3)
        # max-min of the timed runs: how much same-commit same-process
        # noise this query carries, so a cross-round delta smaller than
        # the spread can be read as noise rather than regression
        spreads[name] = round(runs[-1] - runs[0], 3)

    total = round(sum(timings.values()), 3)

    def loadavg() -> float | None:
        try:
            with open("/proc/loadavg") as fh:
                return float(fh.read().split()[0])
        except (OSError, ValueError):
            return None

    # capture-window budget: the driver parses the LAST ~2000 stdout
    # chars, and the b-set grows every round — per-b-entry numbers ride
    # in BENCH_DETAIL.json ("queries_full", committed, diffable round
    # over round) while the compact line carries the stable driver
    # catalog plus the b-set aggregate
    b_names = sorted(n for n in timings if n.startswith("b"))
    out = {
        "metric": "catalog_total_wall",
        "value": total,
        "unit": "sec",
        "queries": {n: t for n, t in timings.items() if n not in b_names},
        "b_total": round(sum(timings[n] for n in b_names), 3),
        "n_b": len(b_names),
        "sf": sf,
        # host contention marker: this VM shares hardware, and a noisy
        # neighbor inflates EVERY query uniformly (observed 41.6s vs
        # 64.0s for the identical commit an hour apart at 1-min load
        # 4 vs 12) — read cross-round deltas against this figure
        "loadavg_1m": loadavg(),
    }
    detail = {
        "protocol": f"median_of_{n_runs}_after_warmup",
        "sf": sf,
        "n_queries": len(timings),
        "queries_full": timings,
        # one-time costs memoizing builders paid outside the timed
        # runs (model fits, graph projections, scaled fixture
        # generation) — makes the memoized entries' medians auditable
        "cold_costs": dict(bench_extra.COLD_COSTS),
    }
    # the catalog GROWS round over round, so the headline total is not
    # comparable across rounds; also publish the total over exactly the
    # query set of each earlier round's recorded bench
    import glob

    here = os.path.dirname(os.path.abspath(__file__))
    latest_prev: dict[str, float] = {}
    for prior in sorted(glob.glob(os.path.join(here, "BENCH_r*.json"))):
        try:
            with open(prior) as fh:
                prev = json.load(fh)
            # driver-recorded files wrap the bench line under "parsed"
            prev = prev.get("parsed", prev) or {}
            if prev.get("sf") != sf:  # deltas only make sense at equal scale
                continue
            shared = [q for q in prev.get("queries", {}) if q in timings]
            if shared:
                tag = os.path.basename(prior)[len("BENCH_") : -len(".json")]
                # only the LATEST comparable subset rides in the compact
                # stdout line (capture-window budget); every round's
                # subset lands in the detail file
                detail[f"subset_total_{tag}"] = round(
                    sum(timings[q] for q in shared), 3
                )
                out[f"subset_total_{tag}"] = detail[f"subset_total_{tag}"]
                for k in [k for k in out if k.startswith("subset_total_") and k != f"subset_total_{tag}"]:
                    del out[k]
                latest_prev = prev["queries"]
        except (OSError, ValueError):
            continue

    # per-query regression guard vs the latest committed round: flag a
    # slip when, after normalizing out the whole-run shift, the delta
    # exceeds ALL of (a) 35% of the prior time, (b) this run's own
    # observed noise spread, and (c) a 0.35 s absolute floor.
    # Deltas are NORMALIZED by the global shift first: this VM's
    # contention inflates every query uniformly (observed whole-run
    # swings of ±15% with loadavg 1.4→12), and an un-normalized guard
    # flags a different set of innocent small queries each run. A real
    # regression is a query that got slower RELATIVE to the rest of
    # the catalog.
    # calibration: two same-code runs an hour apart showed sub-second
    # queries drifting +0.15..0.40 s with loadavg 1.4→12 and the
    # flagged set DIFFERENT each run — so the guard needs (a) the
    # median per-query ratio as the global-shift estimate (robust to a
    # few genuinely-optimized big movers) and (b) the 0.35 s absolute
    # floor under which this host simply cannot testify. A real
    # regression (r3's d13 +2.06 s / +54%) clears all three
    # comfortably.
    # b-set baselines live in the committed previous-round
    # BENCH_DETAIL.json (they left the compact line for the capture
    # budget); merge them in UNDER the driver-recorded values
    try:
        with open(os.path.join(here, "BENCH_DETAIL.json")) as fh:
            prev_detail = json.load(fh)
        if prev_detail.get("sf") == sf:
            for q, t in prev_detail.get("queries_full", {}).items():
                latest_prev.setdefault(q, t)
    except (OSError, ValueError):
        pass
    shared = [q for q in timings if q in latest_prev]
    if shared:  # median() raises on empty (disjoint query sets)
        shift = statistics.median(
            timings[q] / max(latest_prev[q], 1e-9) for q in shared
        )
        out["global_shift"] = round(shift, 3)
        detail["prev_deltas"] = {
            q: round(timings[q] - latest_prev[q], 3) for q in sorted(shared)
        }
        out["regressions"] = sorted(
            q
            for q in shared
            if timings[q] / shift - latest_prev[q]
            > max(0.35 * latest_prev[q], spreads[q], 0.35)
        )
    detail["spreads"] = spreads
    detail["loadavg_1m"] = out["loadavg_1m"]
    try:
        # carry the one-shot sf1 scale section (tools/bench_sf1.py)
        # across sf0.1 refreshes — it is measured out-of-band
        if isinstance(prev_detail, dict) and "sf1" in prev_detail:
            detail.setdefault("sf1", prev_detail["sf1"])
    except NameError:
        pass
    try:
        with open(os.path.join(here, "BENCH_DETAIL.json"), "w") as fh:
            json.dump(detail, fh, indent=1, sort_keys=True)
    except OSError:
        pass  # detail is best-effort; the stdout line is the contract
    # compact separators: the driver parses the LAST ~2000 stdout
    # chars, so the line must stay short — r4's padded line overflowed
    # that window and the round's perf number went unrecorded
    print(json.dumps(out, separators=(",", ":")))


if __name__ == "__main__":
    main()
