"""Versioned snapshot store (sources/versioned.py): round-trip,
as-of selection, and the diff-chain law with snapshot_diff/apply_diff."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from tests.conftest import record_opcheck
from data_export_tool_spark.sources.versioned import (
    list_versions,
    read_version,
    write_version,
)


def _snap(spark, vals):
    return spark.createDataFrame(
        [(k, v) for k, v in vals.items()], "id long, val string"
    )


def test_versioned_store_round_trip_and_as_of(spark, tmp_path):
    base = str(tmp_path / "store")
    t = [dt.datetime(2024, 1, d, tzinfo=dt.timezone.utc) for d in (1, 2, 3)]
    snaps = [
        {1: "a", 2: "b"},
        {1: "a2", 2: "b", 3: "c"},
        {2: "b", 3: "c3"},
    ]
    for s, ts in zip(snaps, t):
        write_version(_snap(spark, s), base, committed_at=ts)

    ok = [e["version"] for e in list_versions(spark, base)] == [1, 2, 3]
    ok = ok and [e["n_rows"] for e in list_versions(spark, base)] == [2, 3, 2]

    def load(**kw):
        return {
            r["id"]: r["val"] for r in read_version(spark, base, **kw).collect()
        }

    ok = ok and load() == snaps[2]                       # latest
    ok = ok and load(version=2) == snaps[1]              # explicit
    # as-of: exactly at commit 2, between 2 and 3, after all
    ok = ok and load(as_of=t[1]) == snaps[1]
    ok = ok and load(as_of=t[1] + dt.timedelta(hours=5)) == snaps[1]
    ok = ok and load(as_of=t[2] + dt.timedelta(days=9)) == snaps[2]
    record_opcheck("versioned_store", 3, ok, oracle="python-reference")
    assert ok

    with pytest.raises(ValueError):
        read_version(spark, base, as_of=t[0] - dt.timedelta(days=1))
    with pytest.raises(ValueError):
        read_version(spark, base, version=9)
    with pytest.raises(ValueError):
        read_version(spark, base, version=1, as_of=t[0])
    with pytest.raises(ValueError):
        read_version(spark, str(tmp_path / "empty"))


def test_versioned_store_diff_chain(spark, tmp_path):
    """Snapshot N ∘ snapshot_diff == snapshot N+1: the store composes
    with the CDC operators as designed."""
    from data_export_tool_spark.operators.upsert import (
        apply_diff,
        snapshot_diff,
    )

    base = str(tmp_path / "chain")
    old = _snap(spark, {1: "a", 2: "b", 3: "c"})
    new = _snap(spark, {1: "a9", 3: "c", 4: "d"})
    write_version(old, base, committed_at="2024-01-01T00:00:00+00:00")
    write_version(new, base, committed_at="2024-01-02T00:00:00+00:00")

    diff = snapshot_diff(
        read_version(spark, base, version=1),
        read_version(spark, base, version=2),
        keys=["id"],
    )
    rebuilt = apply_diff(read_version(spark, base, version=1), diff, keys=["id"])
    got = {r["id"]: r["val"] for r in rebuilt.collect()}
    want = {r["id"]: r["val"] for r in read_version(spark, base).collect()}
    assert got == want
