"""Versioned parquet snapshot store with as-of (time-travel) reads.

The minimal lake-format contract the SCD-2 / snapshot-diff operators
want underneath them: every ``write_version`` lands a complete
snapshot under ``base/v=NNNNNN`` and appends one line to a JSON
manifest recording (version, committed_at, row_count); readers pick
the latest version, an explicit version, or the newest version
committed at-or-before a timestamp — reproducible backfills against
yesterday's table without a real table format.

Deliberately simple-but-honest about what it is:

- snapshots are FULL copies (pair with ``operators.upsert.apply_diff``
  / ``snapshot_diff`` to build the next snapshot incrementally, and
  ``operators.layout.compact_parquet`` to maintain file sizes);
- the manifest append is last-writer-wins — single-writer semantics,
  the usual batch-ETL ownership model, NOT a concurrent-commit
  protocol;
- all filesystem access goes through the Hadoop FS API, so the store
  works on any Spark-supported filesystem, and readers load exactly
  one version directory (a path filter, not a full-table scan).

Reference parity note: none — the reference exports point-in-time CSV
packages; this extends SURVEY §2k with the storage-side counterpart.
"""

from __future__ import annotations

import datetime as _dt
import json

from pyspark.sql import DataFrame, SparkSession

__all__ = ["write_version", "list_versions", "read_version", "expire_versions"]

_MANIFEST = "_versions.json"


def _fs(spark: SparkSession, base: str):
    jvm = spark.sparkContext._jvm
    conf = spark.sparkContext._jsc.hadoopConfiguration()
    path = jvm.org.apache.hadoop.fs.Path(base)
    return jvm, path.getFileSystem(conf)


def _read_manifest(spark: SparkSession, base: str) -> list[dict]:
    jvm, fs = _fs(spark, base)
    mpath = jvm.org.apache.hadoop.fs.Path(base, _MANIFEST)
    if not fs.exists(mpath):
        return []
    stream = fs.open(mpath)
    try:
        # commons-io ships with Hadoop; avoids the ByteBuffer read
        # path some FS implementations (local ChecksumFileSystem)
        # don't support
        data = bytes(
            jvm.org.apache.commons.io.IOUtils.toByteArray(stream)
        )
    finally:
        stream.close()
    return json.loads(data.decode("utf-8"))


def _write_manifest(spark: SparkSession, base: str, entries: list[dict]):
    jvm, fs = _fs(spark, base)
    mpath = jvm.org.apache.hadoop.fs.Path(base, _MANIFEST)
    out = fs.create(mpath, True)
    try:
        out.write(json.dumps(entries, sort_keys=True).encode("utf-8"))
    finally:
        out.close()


def write_version(
    df: DataFrame,
    base: str,
    committed_at: _dt.datetime | str | None = None,
) -> int:
    """Write ``df`` as the store's next full snapshot and record it in
    the manifest. Returns the new version number (1-based).
    ``committed_at`` defaults to the current UTC time; pass an
    explicit timestamp for reproducible pipelines/backfills."""
    spark = df.sparkSession
    entries = _read_manifest(spark, base)
    version = (max((e["version"] for e in entries), default=0)) + 1
    if committed_at is None:
        committed_at = _dt.datetime.now(_dt.timezone.utc)
    if isinstance(committed_at, _dt.datetime):
        committed_at = committed_at.isoformat()
    vdir = f"{base}/v={version:06d}"
    df.write.mode("errorifexists").parquet(vdir)
    n_rows = spark.read.parquet(vdir).count()
    entries.append(
        {"version": version, "committed_at": committed_at, "n_rows": n_rows}
    )
    _write_manifest(spark, base, entries)
    return version


def list_versions(spark: SparkSession, base: str) -> list[dict]:
    """Manifest entries, version-ascending."""
    return sorted(_read_manifest(spark, base), key=lambda e: e["version"])


def read_version(
    spark: SparkSession,
    base: str,
    version: int | None = None,
    as_of: _dt.datetime | str | None = None,
) -> DataFrame:
    """Load one snapshot: the explicit ``version``, else the newest
    version with ``committed_at <= as_of``, else the latest. Reads
    exactly that version's directory. Raises ``ValueError`` for an
    unknown version, an ``as_of`` before the first commit, or an
    empty store."""
    entries = list_versions(spark, base)
    if not entries:
        raise ValueError(f"no versions at {base!r}")
    if version is not None and as_of is not None:
        raise ValueError("pass version OR as_of, not both")
    if version is not None:
        if version not in {e["version"] for e in entries}:
            raise ValueError(
                f"version {version} not in store (have "
                f"{[e['version'] for e in entries]})"
            )
        pick = version
    elif as_of is not None:
        if isinstance(as_of, _dt.datetime):
            as_of = as_of.isoformat()
        eligible = [e for e in entries if e["committed_at"] <= as_of]
        if not eligible:
            raise ValueError(
                f"no version committed at or before {as_of!r}"
            )
        pick = eligible[-1]["version"]
    else:
        pick = entries[-1]["version"]
    return spark.read.parquet(f"{base}/v={pick:06d}")


def expire_versions(
    spark: SparkSession,
    base: str,
    keep_last: int = 1,
    older_than: _dt.datetime | str | None = None,
    dry_run: bool = False,
) -> list[dict]:
    """Retention/vacuum for the snapshot store: expire versions that
    are BOTH outside the newest ``keep_last`` AND (when given) older
    than ``older_than`` — the standard lake retention conjunction, so
    a keep_last floor always survives an aggressive age policy and
    time travel within the retained window keeps working.

    Returns the expired manifest entries (each with an added
    ``expired_dir`` field). ``dry_run=True`` reports without touching
    anything — run it first; deletion is not undoable. Real runs
    rewrite the manifest FIRST, then delete directories (a crash
    between the two leaves orphan directories — harmless garbage a
    re-run removes — never a manifest pointing at deleted data).
    The latest version is never expirable (``keep_last`` ≥ 1).

    Scale: pure manifest/filesystem metadata work — no data is read;
    deletes are per-version directory removals.
    """
    if keep_last < 1:
        raise ValueError(f"keep_last must be >= 1: {keep_last}")
    entries = list_versions(spark, base)
    if not entries:
        return []
    if isinstance(older_than, _dt.datetime):
        older_than = older_than.isoformat()
    protected = {e["version"] for e in entries[-keep_last:]}
    expired = [
        e
        for e in entries
        if e["version"] not in protected
        and (older_than is None or e["committed_at"] < older_than)
    ]
    if not expired or dry_run:
        return [
            {**e, "expired_dir": f"{base}/v={e['version']:06d}"}
            for e in expired
        ]
    survivors = [e for e in entries if e["version"] not in
                 {x["version"] for x in expired}]
    _write_manifest(spark, base, survivors)
    jvm, fs = _fs(spark, base)
    out = []
    for e in expired:
        vdir = f"{base}/v={e['version']:06d}"
        fs.delete(jvm.org.apache.hadoop.fs.Path(vdir), True)
        out.append({**e, "expired_dir": vdir})
    return out
