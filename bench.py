"""Benchmark harness: runs the engine's query catalog end-to-end.

Prints ONE JSON line:
    {"metric": "...", "value": <total_sec>, "unit": "sec",
     "queries": {"q01_...": sec, ...}, "sf": 0.1}

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
     SPARK_GRAFT_CPUS (default 32).

Protocol (BASELINE.md): warm the JVM with one throwaway run of the
flagship query, then time each catalog query once. Execution is
measured with a `noop` sink (full pipeline runs, nothing is collected
to the driver) — the number is the engine, not pandas conversion.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    from data_export_tool_spark.session import get_spark
    from data_export_tool_spark.queries import all_queries

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or 0.1)

    spark = get_spark("bench")
    spark.sparkContext.setLogLevel("ERROR")

    specs = all_queries()

    # warm-up: JVM JIT + parquet footer caches (discarded per BASELINE.md)
    specs["q03_latest_order_per_customer"].builder(spark, sf_dir).write.format(
        "noop"
    ).mode("overwrite").save()

    timings: dict[str, float] = {}
    for name, spec in sorted(specs.items()):
        t0 = time.perf_counter()
        spec.builder(spark, sf_dir).write.format("noop").mode("overwrite").save()
        timings[name] = round(time.perf_counter() - t0, 3)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "catalog_total_wall",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
