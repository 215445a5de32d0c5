"""JSON path profiler (operators/jsonprof.py): exact python replay on
nested docs, conventions (arrays, depth, malformed), real props."""

from __future__ import annotations

import json

import pytest

from data_export_tool_spark.operators.jsonprof import (
    infer_json_schema,
    py_json_paths,
)

DOCS = [
    '{"a": 1, "b": {"c": "x", "d": [1, 2.5, "s"]}, "e": null}',
    '{"a": "mixed", "b": {"c": "y"}}',
    '{"a": 2, "f": true}',
    "not json at all",
    '[1, {"g": 3}]',
]


def _replay(docs, max_depth):
    counts = {}
    total = 0
    for d in docs:
        if d is None:
            continue
        total += 1
        for p, t, ex in py_json_paths(d, max_depth):
            cur = counts.setdefault((p, t), [0, ex])
            cur[0] += 1
            if ex < cur[1]:
                cur[1] = ex
    return {
        k: (v[0], v[0] / total, v[1]) for k, v in counts.items()
    }


def test_jsonprof_matches_replay(spark):
    df = spark.createDataFrame([(d,) for d in DOCS], "props string")
    got = {
        (r["path"], r["json_type"]): (
            r["n"], pytest.approx(r["coverage"]), r["example"]
        )
        for r in infer_json_schema(df, "props", max_depth=3).collect()
    }
    want = _replay(DOCS, 3)
    assert set(got) == set(want)
    for k, (n, cov, ex) in want.items():
        assert got[k][0] == n
        assert got[k][1] == pytest.approx(cov)
        assert got[k][2] == ex
    # convention spot checks
    assert got[("$.a", "integer")][0] == 2  # docs 1 and 3
    assert got[("$.a", "string")][0] == 1  # mixed types split
    assert got[("$.b.d[]", "number")][0] == 1  # index-free arrays
    assert got[("$", "malformed")][0] == 1
    assert got[("$.e", "null")][0] == 1
    from tests.conftest import record_opcheck

    record_opcheck(
        "infer_json_schema", len(want), True, oracle="python-reference",
    )


def test_jsonprof_depth_and_guard(spark):
    deep = json.dumps({"a": {"b": {"c": {"d": 1}}}})
    df = spark.createDataFrame([(deep,)], "props string")
    got = {r["path"] for r in
           infer_json_schema(df, "props", max_depth=2).collect()}
    # depth 2: $.a.b recorded as object, $.a.b.c NOT walked
    assert "$.a.b" in got and "$.a.b.c" not in got
    wide = json.dumps({f"id_{i}": i for i in range(50)})
    dfw = spark.createDataFrame([(wide,)], "props string")
    with pytest.raises(Exception, match="max_paths"):
        infer_json_schema(dfw, "props", max_paths=10).collect()
    with pytest.raises(ValueError, match="max_depth"):
        infer_json_schema(df, "props", max_depth=-1)


def test_jsonprof_real_props(spark, sf_dir):
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    got = {
        (r["path"], r["json_type"]): r["coverage"]
        for r in infer_json_schema(ev, "props").collect()
    }
    # the synthetic props column is {"k": int} on every row
    assert got[("$.k", "integer")] == pytest.approx(1.0)
    assert got[("$", "object")] == pytest.approx(1.0)
