"""JSON path/schema profiler for semi-structured string columns.

Event `props`, API payload dumps, scraped metadata — the first
question on any semi-structured column is "what's actually IN here":
which paths occur, with which types, how often, and what does a value
look like. This operator walks every JSON document to a bounded depth
and aggregates a (path, type) profile — the schema-inference /
drift-detection primitive that decides whether `from_json` with a
fixed schema is safe.

Why a pandas UDF: Spark's JSON builtins (`json_object_keys`,
`get_json_object`, `schema_of_json`) each need the paths *a priori*
or merge to a single inferred struct — none enumerates the observed
(path, type, count) distribution. Walking arbitrary nested JSON is a
recursive traversal with no codegen expression, so this is an honest
Arrow-batched python stage (the `unicode_fold` precedent) that
PARTIAL-AGGREGATES inside each batch: the shuffle carries (path,
type, n, example) partials — path-grain metadata, never documents.

Conventions: array elements aggregate under ``path[]`` (index-free —
a 10⁶-element array is one path); objects recurse to ``max_depth``
then summarize as type ``object``; JSON null is type ``null``;
unparseable strings count under path ``$`` type ``malformed``;
``example`` is the lexicographically smallest truncated rendering
(deterministic under retries/partitioning). ``coverage`` = share of
non-NULL input rows containing the path. ``max_paths`` RAISES on
key-explosion documents (ids used as keys) instead of shuffling a
runaway profile.

Oracle: exact python replay (tests/test_jsonprof.py → OPCHECK
``infer_json_schema``).
"""

from __future__ import annotations

import json
from typing import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["infer_json_schema", "py_json_paths"]

_TRUNC = 80


def _jtype(v) -> str:
    if v is None:
        return "null"
    if isinstance(v, bool):
        return "boolean"
    if isinstance(v, int):
        return "integer"
    if isinstance(v, float):
        return "number"
    if isinstance(v, str):
        return "string"
    if isinstance(v, list):
        return "array"
    return "object"


def _walk(v, path: str, depth: int, out: list) -> None:
    t = _jtype(v)
    out.append((path, t, v))
    if depth <= 0:
        return
    if t == "object":
        for k, sub in v.items():
            _walk(sub, f"{path}.{k}", depth - 1, out)
    elif t == "array":
        for sub in v:
            _walk(sub, f"{path}[]", depth - 1, out)


def py_json_paths(doc: str, max_depth: int) -> list[tuple]:
    """Reference walker: ``(path, type, example_str)`` triples for one
    document (the exact convention the operator distributes); a parse
    failure yields ``[('$', 'malformed', <trunc doc>)]``."""
    try:
        v = json.loads(doc)
    except (ValueError, TypeError):
        return [("$", "malformed", str(doc)[:_TRUNC])]
    out: list = []
    _walk(v, "$", max_depth, out)
    seen = set()
    dedup = []
    for p, t, val in out:
        if (p, t) in seen:
            continue  # one count per (path, type) per document
        seen.add((p, t))
        ex = json.dumps(val, sort_keys=True, default=str)[:_TRUNC]
        dedup.append((p, t, ex))
    return dedup


def infer_json_schema(
    df: DataFrame,
    col: str,
    max_depth: int = 4,
    max_paths: int = 10_000,
) -> DataFrame:
    """Profile the JSON string column. Output: ``path, json_type, n,
    coverage, example`` — ``n`` counts documents containing the
    (path, type); ``coverage`` divides by non-NULL input rows."""
    if max_depth < 0:
        raise ValueError(f"max_depth must be >= 0, got {max_depth}")
    import pandas as pd

    base = df.where(F.col(col).isNotNull()).select(
        F.col(col).cast("string").alias("__j")
    )

    def partials(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counts: dict = {}
        for pdf in batches:
            for doc in pdf["__j"]:
                for p, t, ex in py_json_paths(doc, max_depth):
                    cur = counts.get((p, t))
                    if cur is None:
                        counts[(p, t)] = [1, ex]
                        if len(counts) > max_paths:
                            raise ValueError(
                                f"more than {max_paths} distinct "
                                "(path, type) pairs in one partition — "
                                "document keys look like ids; lower "
                                "max_depth or raise max_paths"
                            )
                    else:
                        cur[0] += 1
                        if ex < cur[1]:
                            cur[1] = ex
        if counts:
            yield pd.DataFrame(
                {
                    "path": [k[0] for k in counts],
                    "json_type": [k[1] for k in counts],
                    "n": [v[0] for v in counts.values()],
                    "example": [v[1] for v in counts.values()],
                }
            )

    prof = base.mapInPandas(
        partials, "path string, json_type string, n long, example string"
    ).groupBy("path", "json_type").agg(
        F.sum("n").alias("n"), F.min("example").alias("example")
    )
    total = base.agg(F.count(F.lit(1)).alias("__total"))
    return prof.crossJoin(F.broadcast(total)).select(
        "path",
        "json_type",
        "n",
        (F.col("n") / F.col("__total")).alias("coverage"),
        "example",
    )
