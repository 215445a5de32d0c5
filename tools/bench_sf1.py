"""One order-of-magnitude scale point (VERDICT r7 missing-#2).

Runs the heavy bench subset once at sf1.0 — the mamba reference
reports at 100 000 patients (their fixtures scale by sf natively) and
the heaviest data-pipeline entries over the derived sf1 dataset
(``tools/make_sf1.py``: 10 disjoint id-offset replicas of the driver's
sf0.1 parquet) — and records per-entry medians under
``BENCH_DETAIL.json["sf1"]`` together with the sf0.1 medians they are
compared against and a scaling note for anything super-linear.

Usage: ``python tools/make_sf1.py && python tools/bench_sf1.py``
(~10-20 min; run on a quiet machine).
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

SF1_DIR = os.environ.get("SPARK_GRAFT_SF1_DIR", "/tmp/sf1")
# timed runs per entry (first_run_sec is recorded separately anyway);
# the sf1 tier is a SCALE point — scale_x tolerates single-run noise,
# so 2 runs is the wall-clock-sane default for the 24-entry set
RUNS = int(os.environ.get("SPARK_GRAFT_SF1_RUNS", "2"))

#: entry name -> module providing it
HEAVY = [
    "mb_wide_view",
    "mb_ahd_linelist",
    "mb_hvl_linelist",
    "mb_vl_eligible_new",
    "mb_outcome",
    "mb_pmtct_hei",
    # the remaining 7 reference reports (VERDICT r8 missing-#3): all
    # 12 reports get an sf1 wall-time row
    "mb_tx_curr",
    "mb_vl_received",
    "mb_cca",
    "mb_cca_new",
    "mb_tpt",
    "mb_vl_eligible",
    "mb_pmtct_maternal",
    "b101_jaro_winkler",
    "b45_span_dedup",
    "b81_update_components",
    "d08_doc_dup_clusters",
    "v03_embedding_ann_topk",
    # round-8 heavy six (VERDICT r8 missing-#2): the top of the sf0.1
    # cost table gets measured scale points
    "b135_hits",
    "b142_interpolate",
    "b128_skyline",
    "b132_spearman",
    "b130_dbscan",
    "b138_betweenness",
]


def main() -> None:
    from pyspark.sql import SparkSession

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        # 24g, not more: the JVM heap competes with 32 Python workers
        # for the box; a 48g heap pushed the b101 run's workers into
        # OOM-kill territory at the 195M-row shuffle
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_MEM", "24g"))
        # diagnosable Python-worker deaths (the b101 quadratic override
        # crashed a worker at sf1) + an env override for Arrow batch
        # size when chasing worker-side memory
        .config("spark.sql.execution.pyspark.udf.faulthandler.enabled", "true")
        .config(
            "spark.sql.execution.arrow.maxRecordsPerBatch",
            os.environ.get("SPARK_GRAFT_ARROW_BATCH", "10000"),
        )
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    only = [
        s for s in os.environ.get("SPARK_GRAFT_SF1_ONLY", "").split(",") if s
    ]
    heavy = [n for n in HEAVY if not only or n in only]

    from data_export_tool_spark.queries import all_queries, bench_extra, bench_mamba

    builders = {n: s.builder for n, s in all_queries().items()}
    builders.update({s.name: s.builder for s in bench_extra.QUERIES})
    builders.update({s.name: s.builder for s in bench_mamba.QUERIES})

    results: dict[str, dict] = {}

    # the PRODUCTION shape of b101 at sf1 (VERDICT r9 #4): the default
    # max_block=10k guard REFUSES the fixture's quadratic flood (the
    # 'en' block holds ~20k rows) with a readable ValueError. What a
    # user pays at this scale is the guard's detection pre-pass — one
    # block-size groupBy — so the entry times the refusal itself; the
    # quadratic-override entry (b101_jaro_winkler, max_block=50k)
    # measures the grind.
    if not only or "b101_guarded_refusal" in only:
        from data_export_tool_spark.operators.fuzzy import (
            jaro_winkler_dedup_pairs,
        )
        from data_export_tool_spark.queries.bench_extra import _entity_keys

        ts = []
        refused = None
        for _ in range(max(RUNS, 2)):
            t0 = time.perf_counter()
            try:
                jaro_winkler_dedup_pairs(
                    _entity_keys(spark, SF1_DIR),
                    threshold=0.92,
                    id_col="doc_id",
                    text_col="name",
                )
                refused = False
            except ValueError:
                refused = True
            ts.append(time.perf_counter() - t0)
        results["b101_guarded_refusal"] = {
            "median_sec": round(statistics.median(ts), 3),
            "runs": [round(t, 3) for t in ts],
            "refused": refused,
            "note": "time-to-refusal of the default max_block guard",
        }
        print("b101_guarded_refusal", results["b101_guarded_refusal"], flush=True)

    for name in heavy:
        fn = builders.get(name)
        if fn is None:
            results[name] = {"error": "no such entry"}
            print(name, results[name], flush=True)
            continue
        try:
            def run_once() -> float:
                # the SAME noop sink as bench.py: materializes every
                # output column. A .count() here lets Catalyst prune
                # aggregate/projection columns and published absurd
                # sub-linear scale_x values (b142 "0.1x" at 10x data)
                t0 = time.perf_counter()
                fn(spark, SF1_DIR).write.format("noop").mode(
                    "overwrite"
                ).save()
                return time.perf_counter() - t0

            warm = run_once()  # warm (fixture gen / caches)
            n = fn(spark, SF1_DIR).count()
            ts = [run_once() for _ in range(RUNS)]
            results[name] = {
                "median_sec": round(statistics.median(ts), 3),
                "runs": [round(t, 3) for t in ts],
                "first_run_sec": round(warm, 3),
                "rows": n,
            }
        except Exception as e:  # record, keep measuring the rest
            results[name] = {"error": f"{type(e).__name__}: {e}"[:400]}
        print(name, results[name], flush=True)

    detail_path = os.path.join(HERE, "BENCH_DETAIL.json")
    with open(detail_path) as fh:
        detail = json.load(fh)
    sf01 = detail.get("queries_full", {})
    for name, r in results.items():
        base = sf01.get(name)
        if base and "median_sec" in r:
            r["sf0.1_sec"] = base
            r["scale_x"] = round(r["median_sec"] / max(base, 1e-9), 1)
    prev = detail.get("sf1", {}).get("entries", {})
    prev.update(results)
    results = prev
    detail["sf1"] = {
        "dataset": "tools/make_sf1.py (10 id-offset disjoint replicas of sf0.1; mamba fixtures natively at 100k patients)",
        "cpus": cpus,
        "entries": results,
        "cold_costs": {
            k: v for k, v in bench_extra.COLD_COSTS.items()
        },
        "loadavg_1m": round(os.getloadavg()[0], 2),
        "notes": {
            "b101_jaro_winkler": (
                "fixture keyspace is FIXED (997 name mods per lang), so"
                " blocks grow ~linearly with sf and candidate pairs"
                " quadratically (~212M at sf1); the operator's default"
                " max_block=10k guard refuses this shape by design — the"
                " bench entry overrides it to measure the quadratic"
            ),
        },
    }
    with open(detail_path, "w") as fh:
        json.dump(detail, fh, indent=1, sort_keys=True)
    print(json.dumps({k: v.get("median_sec", v.get("error", "?")) for k, v in results.items()}))
    spark.stop()


if __name__ == "__main__":
    main()
