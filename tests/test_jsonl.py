"""JSONL ingestion with quarantine (sources/jsonl.py)."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from data_export_tool_spark.sources.jsonl import load_jsonl, write_jsonl


@pytest.fixture()
def corpus_path(tmp_path):
    lines = [
        json.dumps({"doc_id": 1, "text": "alpha", "n": 10}),
        json.dumps({"doc_id": 2, "text": "beta", "n": 20, "extra": "ignored"}),
        '{"doc_id": 3, "text": "gamma"',  # truncated JSON
        json.dumps({"doc_id": "not-a-number", "text": "delta", "n": 1}),
        "plain text garbage",
        json.dumps({"doc_id": 5, "text": None, "n": None}),  # nulls are fine
        json.dumps({"doc_id": 6}),  # missing fields -> NULL, not corrupt
    ]
    p = tmp_path / "corpus.jsonl"
    p.write_text("\n".join(lines) + "\n")
    return str(p)


def test_load_jsonl_splits_good_and_quarantine(spark, corpus_path):
    good, quarantine = load_jsonl(
        spark, corpus_path, "doc_id long, text string, n long"
    )
    rows = {r["doc_id"]: (r["text"], r["n"]) for r in good.collect()}
    assert rows == {
        1: ("alpha", 10),
        2: ("beta", 20),
        5: (None, None),
        6: (None, None),
    }
    assert good.columns == ["doc_id", "text", "n"]
    bad = sorted(r["raw"] for r in quarantine.collect())
    assert len(bad) == 3
    assert any("gamma" in b for b in bad)
    assert any("not-a-number" in b for b in bad)
    assert any("plain text garbage" in b for b in bad)


def test_load_jsonl_single_scan_plan(spark, corpus_path):
    good, quarantine = load_jsonl(
        spark, corpus_path, "doc_id long, text string, n long"
    )
    for df in (good, quarantine):
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert plan.count("FileScan text") == 1
        assert "Exchange" not in plan  # a filter + projection, nothing more


def test_load_jsonl_rejects_reserved_column(spark, corpus_path):
    with pytest.raises(ValueError):
        load_jsonl(spark, corpus_path, "_corrupt_record string, x long")


def test_jsonl_round_trip(spark, tmp_path, corpus_path):
    good, _ = load_jsonl(
        spark, corpus_path, "doc_id long, text string, n long"
    )
    out = str(tmp_path / "rewritten")
    write_jsonl(good, out, compression=None)
    back = spark.read.schema("doc_id long, text string, n long").json(out)
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, good.collect()))


def test_load_csv_splits_good_and_quarantine(spark, tmp_path):
    from data_export_tool_spark.sources.jsonl import load_csv

    lines = [
        "1,alpha,10",
        "2,beta,20",
        "3,gamma,not-a-number",  # type coercion failure -> quarantine
        "4,delta",  # short row -> quarantined (arity is part of the contract)
        "x,epsilon,5",  # bad id -> quarantine
    ]
    p = tmp_path / "corpus.csv"
    p.write_text("\n".join(lines) + "\n")
    good, quarantine = load_csv(
        spark, str(p), "doc_id long, text string, n long"
    )
    rows = {r["doc_id"]: (r["text"], r["n"]) for r in good.collect()}
    assert rows == {1: ("alpha", 10), 2: ("beta", 20)}
    bad = sorted(r["raw"] for r in quarantine.collect())
    assert bad == ["3,gamma,not-a-number", "4,delta", "x,epsilon,5"]
    plan = good._jdf.queryExecution().executedPlan().toString()
    assert plan.count("FileScan text") == 1


@pytest.fixture()
def evolved_path(tmp_path):
    """A producer that evolved: renamed n -> n_tokens (one removed +
    one added), added a new 'lang' column, and started sending doc_id
    as a string (retyped)."""
    lines = [
        json.dumps({"doc_id": "a1", "text": "alpha", "n_tokens": 10, "lang": "en"}),
        json.dumps({"doc_id": "a2", "text": "beta", "n_tokens": 20, "lang": "am"}),
        json.dumps({"doc_id": "a3", "text": "gamma", "n_tokens": 5, "lang": "en"}),
        "corrupt {not json",
    ]
    p = tmp_path / "evolved.jsonl"
    p.write_text("\n".join(lines) + "\n")
    return str(p)


def test_jsonl_schema_drift_report(spark, evolved_path):
    from data_export_tool_spark.sources.jsonl import load_jsonl_evolving
    from tests.conftest import record_opcheck

    declared = "doc_id long, text string, n long"
    good, quarantine, drift = load_jsonl_evolving(
        spark, evolved_path, declared
    )
    report = {
        r["column"]: (r["change"], r["before"], r["after"])
        for r in drift.collect()
    }
    want = {
        "lang": ("added", None, "string"),
        "n_tokens": ("added", None, "bigint"),
        "n": ("removed", "bigint", None),
        "doc_id": ("retyped", "bigint", "string"),
    }
    record_opcheck(
        "jsonl_schema_drift", len(want), report == want,
        oracle="python-reference",
    )
    assert report == want
    # ingestion SURVIVES the drift: good rows still contract on the
    # declared schema; the retyped doc_id values can't coerce to long
    # so those records land in quarantine, not as silent NULL rows
    assert good.columns == ["doc_id", "text", "n"]
    assert good.count() == 0
    assert quarantine.count() == 4


def test_jsonl_schema_drift_full_scan_exact_keys(spark, tmp_path):
    from data_export_tool_spark.sources.jsonl import jsonl_schema_drift

    # the drifted key appears BEYOND the typed sample window: the
    # bounded sample misses it, the exact key scan reports it
    lines = [json.dumps({"doc_id": i, "text": "x"}) for i in range(50)]
    lines.append(json.dumps({"doc_id": 50, "text": "y", "late_col": 1}))
    p = tmp_path / "late.jsonl"
    p.write_text("\n".join(lines) + "\n")
    declared = "doc_id long, text string"

    sampled = {
        r["column"]
        for r in jsonl_schema_drift(
            spark, str(p), declared, sample_lines=10
        ).collect()
    }
    assert "late_col" not in sampled
    exact = {
        r["column"]: r["change"]
        for r in jsonl_schema_drift(
            spark, str(p), declared, sample_lines=10, full_scan=True
        ).collect()
    }
    assert exact == {"late_col": "added"}


def test_jsonl_no_drift_is_empty_report(spark, corpus_path):
    from data_export_tool_spark.sources.jsonl import jsonl_schema_drift

    # the original corpus: extra/missing fields per-LINE are parsing
    # business; 'extra' appears in one record -> added, everything
    # declared is observed and compatible
    drift = jsonl_schema_drift(
        spark, corpus_path, "doc_id long, text string, n long"
    ).collect()
    assert {r["column"]: r["change"] for r in drift} == {"extra": "added"}
