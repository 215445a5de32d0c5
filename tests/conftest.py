from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    from data_export_tool_spark.session import get_spark

    spark = get_spark(
        "tests",
        master="local[4]",
        shuffle_partitions=4,
        extra_conf={"spark.sql.legacy.parquet.nanosAsLong": "true"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    yield spark


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR


def _current_round() -> int | None:
    """Latest round number from the driver's PROGRESS.jsonl, if any."""
    import json

    path = os.path.join(os.path.dirname(os.path.dirname(__file__)), "PROGRESS.jsonl")
    try:
        with open(path) as fh:
            rounds = [json.loads(ln).get("round") for ln in fh if ln.strip()]
        return max(r for r in rounds if isinstance(r, int))
    except (OSError, ValueError):
        return None


def record_stream_parity(twin: str, rows_compared: int, match: bool) -> None:
    """Append a stream-vs-batch twin parity result to the repo-root
    STREAMPARITY artifact (VERDICT r3 #8: X21–X25 need machine-readable
    evidence round-over-round, and the 50-entry driver catalog has no
    slot for streaming). Merged read-modify-write — the suite runs in
    one process, so no locking needed."""
    import json

    n = _current_round()
    name = f"STREAMPARITY_r{n:02d}.json" if n else "STREAMPARITY.json"
    path = os.path.join(os.path.dirname(os.path.dirname(__file__)), name)
    try:
        with open(path) as fh:
            doc = json.load(fh)
    except (OSError, ValueError):
        doc = {"twins": {}}
    # deterministic content (no timestamps): re-running the suite with
    # unchanged results rewrites an IDENTICAL file, keeping the
    # committed artifact clean in git
    doc["twins"][twin] = {
        "rows_compared": int(rows_compared),
        "match": bool(match),
    }
    doc["all_match"] = all(t["match"] for t in doc["twins"].values())
    with open(path, "w") as fh:
        json.dump(doc, fh, indent=1, sort_keys=True)
        fh.write("\n")
