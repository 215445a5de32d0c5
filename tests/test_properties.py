"""Property-based invariants (hypothesis) for the operators whose
contracts are algebraic laws rather than fixed examples. Example
counts are kept small — each example is a Spark job — but the
generators cover the edges (empties, NULLs, duplicates, unicode)
that fixed fixtures miss."""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

SLOW = settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


# --- URL canonicalization is idempotent -------------------------------------

_url = st.builds(
    lambda scheme, host, port, path, q, frag: (
        f"{scheme}://{host}{port}{path}{q}{frag}"
    ),
    st.sampled_from(["http", "HTTP", "https", "HTTPS"]),
    st.sampled_from(
        ["Example.com", "a.b.co.uk", "x.io", "WWW.Site.ORG", "127.0.0.1"]
    ),
    st.sampled_from(["", ":80", ":443", ":0080", ":8080"]),
    st.sampled_from(["", "/", "/Path/X", "/a/b/c"]),
    st.sampled_from(
        ["", "?q=1", "?utm_source=x", "?UTM_CAMPAIGN=y&q=2", "?a=1&b=2"]
    ),
    st.sampled_from(["", "#frag", "#x=1"]),
)


@SLOW
@given(st.lists(_url, min_size=1, max_size=8))
def test_normalize_url_idempotent(spark, urls):
    from data_export_tool_spark.functions.web import normalize_url

    df = spark.createDataFrame([(u,) for u in urls], "url string")
    once = df.select(normalize_url(F.col("url")).alias("c"))
    twice = once.select(normalize_url(F.col("c")).alias("c"))
    assert [r["c"] for r in once.collect()] == [r["c"] for r in twice.collect()]


# --- snapshot_diff / apply_diff round-trip ----------------------------------

_table = st.lists(
    st.tuples(
        st.one_of(st.none(), st.integers(0, 6)),
        st.one_of(st.none(), st.sampled_from(["a", "b", "ü", ""])),
    ),
    max_size=10,
)


@SLOW
@given(_table, _table)
def test_snapshot_diff_roundtrip_property(spark, old_rows, new_rows):
    from data_export_tool_spark.operators.upsert import apply_diff, snapshot_diff

    # snapshots must be key-unique on non-null keys (the operator's
    # documented precondition, like any MERGE target)
    def uniq(rows):
        seen, out = set(), []
        for k, v in rows:
            if k is None or k not in seen:
                out.append((k, v))
                seen.add(k)
        return out

    old = spark.createDataFrame(uniq(old_rows), "k long, v string")
    new = spark.createDataFrame(uniq(new_rows), "k long, v string")
    diff = snapshot_diff(old, new, ["k"])
    got = sorted(
        map(tuple, apply_diff(old, diff, ["k"]).collect()),
        key=lambda t: (t[0] is None, t[0] or 0, t[1] or ""),
    )
    want = sorted(
        map(tuple, new.collect()),
        key=lambda t: (t[0] is None, t[0] or 0, t[1] or ""),
    )
    assert got == want


# --- dedup_lines: the ban invariant -----------------------------------------


@SLOW
@given(
    st.lists(
        st.lists(
            st.sampled_from(
                [
                    "the repeated boilerplate line",
                    "another frequently repeated line",
                    "unique prose {} goes here",
                    "short",
                    "",
                ]
            ),
            max_size=6,
        ),
        min_size=1,
        max_size=6,
    ),
    st.integers(1, 3),
)
def test_dedup_lines_ban_invariant(spark, docs, max_count):
    from data_export_tool_spark.operators.dedup import dedup_lines

    rows = [
        (i, "\n".join(line.format(i * 10 + j) for j, line in enumerate(doc)))
        for i, doc in enumerate(docs)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = dedup_lines(df, max_count=max_count, min_chars=10)

    # invariant 1: no eligible line survives anywhere if its corpus
    # count exceeded max_count
    surviving = [
        ln
        for r in out.collect()
        if r["text"]
        for ln in r["text"].split("\n")
    ]
    from collections import Counter

    original = Counter(
        ln.strip()
        for _, text in rows
        for ln in text.split("\n")
        if len(ln.strip()) >= 10
    )
    for ln in surviving:
        if len(ln.strip()) >= 10:
            assert original[ln.strip()] <= max_count, ln
    # invariant 2: surviving lines are a per-doc subsequence (order kept)
    out_by_id = {r["doc_id"]: r["text"] for r in out.collect()}
    for i, (_, text) in enumerate(rows):
        kept = out_by_id[i].split("\n") if out_by_id[i] else []
        it = iter(text.split("\n"))
        assert all(any(ln == cand for cand in it) for ln in kept), i


# --- stratified_sample_k size law -------------------------------------------


@SLOW
@given(
    st.dictionaries(
        st.sampled_from(["a", "b", "c", None]),
        st.integers(1, 40),
        min_size=1,
        max_size=4,
    ),
    st.integers(1, 12),
)
def test_stratified_sample_k_size_law(spark, strata, k):
    from data_export_tool_spark.operators.sampling import stratified_sample_k

    rows, nid = [], 0
    for s, n in strata.items():
        for _ in range(n):
            rows.append((nid, s))
            nid += 1
    df = spark.createDataFrame(rows, "id long, s string")
    out = stratified_sample_k(df, "id", "s", k)
    sizes = {
        r["s"]: r["n"]
        for r in out.groupBy("s").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert sizes == {s: min(k, n) for s, n in strata.items()}
