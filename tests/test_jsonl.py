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
