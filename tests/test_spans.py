"""Exact substring (duplicated n-gram span) dedup — Spark result vs a
hash-free python structural truth (window tuples as dict keys), so the
oracle shares NO code path with the xxhash64 pipeline."""

from __future__ import annotations

import re

import pytest

from tests.conftest import record_opcheck

from data_export_tool_spark.operators.spans import (
    duplicate_spans,
    strip_duplicate_spans,
)

BOILER = "this content is licensed under the creative commons attribution share alike four point zero license"
NAV = "home products about contact privacy terms sitemap search login register"


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        # boilerplate header shared by 1/2/3, distinct bodies
        (1, BOILER + " quantum tunnelling lets particles cross classically forbidden barriers in semiconductor junctions"),
        (2, BOILER + " medieval trade routes moved silk spices and silver across the eurasian steppe for centuries"),
        (3, "volcanic soils retain phosphorus unusually well " + BOILER),
        # nav bar repeated INSIDE one document (self-duplication)
        (4, NAV + " unique middle passage about tidal energy turbines " + NAV),
        # clean documents — no shared 6-gram anywhere
        (5, "the referee whistled twice before the penalty kick was finally taken in stoppage time"),
        (6, "compilers allocate registers by coloring an interference graph built from liveness analysis"),
        # short doc (< n tokens) and empty/NULL edges
        (7, "too short"),
        (8, ""),
        (9, None),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def _py_spans(rows, n, keep_canonical):
    """Structural truth: windows keyed by their token TUPLES."""
    toks = {
        i: [t for t in re.split(r"\s+", txt) if t] if txt else []
        for i, txt in rows
    }
    occ = {}
    for i, ts in toks.items():
        for p in range(len(ts) - n + 1):
            occ.setdefault(tuple(ts[p : p + n]), []).append((i, p))
    flagged = {}
    for places in occ.values():
        if len(places) < 2:
            continue
        skip = min(places) if keep_canonical else None
        for place in places:
            if place != skip:
                flagged.setdefault(place[0], set()).add(place[1])
    out = set()
    for i, ps in flagged.items():
        ps = sorted(ps)
        s = e = ps[0]
        for p in ps[1:]:
            if p - e <= n:
                e = p
            else:
                out.add((i, s, e + n))
                s = e = p
        out.add((i, s, e + n))
    return out


def test_duplicate_spans_vs_python_truth(spark, corpus):
    rows = [(r["doc_id"], r["text"]) for r in corpus.collect()]
    for keep in (False, True):
        got = {
            (r["doc_id"], r["span_start"], r["span_end"])
            for r in duplicate_spans(corpus, n=6, keep_canonical=keep).collect()
        }
        want = _py_spans(rows, 6, keep)
        assert got == want, (keep, got ^ want)
    # the audit view flags the boilerplate in ALL of 1/2/3 and both
    # nav copies in 4; clean/short/null docs never appear
    audit = duplicate_spans(corpus, n=6).collect()
    assert {r["doc_id"] for r in audit} == {1, 2, 3, 4}
    assert all(r["n_tokens"] == r["span_end"] - r["span_start"] for r in audit)
    record_opcheck(
        "duplicate_spans", len(_py_spans(rows, 6, False)), True,
        oracle="python-reference",
    )


def test_strip_keeps_one_canonical_copy(spark, corpus):
    out = {r["doc_id"]: r for r in strip_duplicate_spans(corpus, n=6).collect()}
    boiler_holders = [i for i in (1, 2, 3) if BOILER in out[i]["text"]]
    # exactly one canonical copy survives, and it is the min-(id,pos) one
    assert boiler_holders == [1]
    assert out[2]["span_dedup_removed"] == len(BOILER.split())
    # intra-doc repeat: first NAV copy kept, second removed
    assert out[4]["text"].count(NAV) == 1
    assert out[4]["text"].startswith(NAV)
    assert "tidal energy turbines" in out[4]["text"]
    # untouched docs keep text byte-for-byte (and short/empty/null pass)
    for i in (5, 6, 7, 8, 9):
        src = {r["doc_id"]: r["text"] for r in corpus.collect()}[i]
        assert out[i]["text"] == src
        assert out[i]["span_dedup_removed"] == 0
    # column passthrough + schema
    assert set(out[1].asDict()) == {"doc_id", "text", "span_dedup_removed"}


def test_strip_removal_count_law(spark, corpus):
    """Σ span_dedup_removed == Σ n_tokens of the keep_canonical spans —
    the two public views agree with each other."""
    from pyspark.sql import functions as F

    removed = strip_duplicate_spans(corpus, n=6).agg(
        F.sum("span_dedup_removed")
    ).first()[0]
    spans = duplicate_spans(corpus, n=6, keep_canonical=True).agg(
        F.sum("n_tokens")
    ).first()[0]
    assert removed == spans > 0


def test_duplicate_spans_validation(spark, corpus):
    with pytest.raises(ValueError):
        duplicate_spans(corpus, n=0)
