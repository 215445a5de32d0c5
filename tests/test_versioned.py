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


def test_expire_versions_retention(spark, tmp_path):
    """Retention conjunction (outside keep_last AND older than),
    dry-run untouched state, manifest-first deletion, time travel
    within the retained window, and validation."""
    import datetime as dt

    import pytest
    from pyspark.sql import functions as F

    from data_export_tool_spark.sources.versioned import (
        expire_versions,
        list_versions,
        read_version,
        write_version,
    )

    base = str(tmp_path / "store")
    for i in range(5):
        df = spark.range(10).select(
            F.col("id"), F.lit(i).alias("ver_tag")
        )
        write_version(df, base, dt.datetime(2024, 1, 1 + i))
    # dry run: reports v1..v2 (keep_last=2 protects v4,v5; older_than
    # protects v3) and changes nothing
    rep = expire_versions(
        spark, base, keep_last=2, older_than=dt.datetime(2024, 1, 3),
        dry_run=True,
    )
    assert [e["version"] for e in rep] == [1, 2]
    assert len(list_versions(spark, base)) == 5
    # real run: v1..v2 gone, the rest readable, time travel works
    gone = expire_versions(
        spark, base, keep_last=2, older_than=dt.datetime(2024, 1, 3)
    )
    assert [e["version"] for e in gone] == [1, 2]
    left = [e["version"] for e in list_versions(spark, base)]
    assert left == [3, 4, 5]
    assert read_version(spark, base, version=3).agg(
        F.max("ver_tag")
    ).first()[0] == 2
    assert read_version(spark, base).agg(F.max("ver_tag")).first()[0] == 4
    with pytest.raises(ValueError):
        read_version(spark, base, version=1)
    # keep_last floor: latest never expires even with a future cutoff
    gone2 = expire_versions(
        spark, base, keep_last=1, older_than=dt.datetime(2030, 1, 1)
    )
    assert [e["version"] for e in gone2] == [3, 4]
    assert [e["version"] for e in list_versions(spark, base)] == [5]
    with pytest.raises(ValueError):
        expire_versions(spark, base, keep_last=0)
    from tests.conftest import record_opcheck

    record_opcheck(
        "expire_versions", 8, True, oracle="filesystem-state"
    )
