"""End-to-end export-CLI wall time at sf1 (VERDICT r8 next-#9).

Per-query plans are already scale-benched (tools/bench_sf1.py); this
measures the ORCHESTRATION layer — `python -m data_export_tool_spark`
against the reference's own export_config.json over a 100 000-patient
parquet warehouse: 12 reports through the dialect shim, facility
lookup, CSV writes, checksummed zip, cleanup. Records one
``e2e_export_sf1`` entry in ``BENCH_DETAIL.json``.

Usage: ``python tools/bench_e2e_sf1.py`` (quiet machine; the fixture
build is one-time and recorded separately as fixture_sec).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

N_PATIENTS = 100_000
CONFIG = "/root/reference/export_config.json"


def main() -> None:
    # runs at the CLI's stock 8g since round 10: the FollowUp-CTE
    # wide-view rewrite (mamba/reports.py rewrite_follow_up_assembly)
    # replaced the ~130 per-plan broadcast build maps that used to
    # GCLocker-kill the 8g heap and force a 24g override here
    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "8g")
    from data_export_tool_spark.__main__ import main as cli_main
    from data_export_tool_spark.mamba.fixture_store import (
        ensure_fixture_parquet,
        fixture_dir,
    )

    if not os.path.exists(CONFIG):
        raise SystemExit(f"reference config not available: {CONFIG}")

    t0 = time.perf_counter()
    ensure_fixture_parquet(seed=42, n_patients=N_PATIENTS)
    fixture_sec = round(time.perf_counter() - t0, 3)
    load_pre = os.getloadavg()[0]

    out_dir = tempfile.mkdtemp(prefix="e2e_sf1_")
    try:
        t0 = time.perf_counter()
        rc = cli_main(
            [
                "--config", CONFIG,
                "--month", "Sene",
                "--year", "2015",
                "--out", out_dir,
                "--parquet-warehouse", fixture_dir(42, N_PATIENTS),
            ]
        )
        wall = round(time.perf_counter() - t0, 3)
        zips = [f for f in os.listdir(out_dir) if f.endswith(".zip")]
        entry = {
            "wall_sec": wall,
            "rc": rc,
            "zips": zips,
            "n_patients": N_PATIENTS,
            "fixture_sec": fixture_sec,
            "loadavg_pre": round(load_pre, 2),
            "loadavg_post": round(os.getloadavg()[0], 2),
        }
    finally:
        shutil.rmtree(out_dir, ignore_errors=True)

    detail_path = os.path.join(HERE, "BENCH_DETAIL.json")
    with open(detail_path) as fh:
        detail = json.load(fh)
    detail["e2e_export_sf1"] = entry
    with open(detail_path, "w") as fh:
        json.dump(detail, fh, indent=1, sort_keys=True)
    print(json.dumps(entry))


if __name__ == "__main__":
    main()
