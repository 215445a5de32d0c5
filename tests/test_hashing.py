"""functions.hashing — the conv-free hex fold (VERDICT r6 #1).

This repo observed Spark 4.1 ``conv()`` intermittently returning the
value of a DIFFERENT key than the one md5'd beside it (NumberConverter
shared-buffer corruption; documented in operators/walks.py). These
tests pin the replacement fold against a pure-python ``int(hex, 16)``
replay — including inside the SAME projection shape that corrupted
``conv``: many fold columns of different keys evaluated side by side
in one wide projection over a shuffled frame.
"""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from data_export_tool_spark.functions.hashing import hex_fold, md5_long


def _py_md5_long(s: str, start: int = 9, length: int = 8) -> int:
    hx = hashlib.md5(s.encode()).hexdigest()
    return int(hx[start - 1 : start - 1 + length], 16)


def test_md5_long_matches_python_replay(spark):
    df = spark.range(5000).select(F.col("id").cast("string").alias("k"))
    got = {
        r["k"]: (r["h8"], r["h15"], r["h1"])
        for r in df.select(
            "k",
            md5_long(F.col("k"), 9, 8).alias("h8"),
            md5_long(F.col("k"), 1, 15).alias("h15"),
            md5_long(F.col("k"), 1, 1).alias("h1"),
        ).collect()
    }
    assert len(got) == 5000
    for k, (h8, h15, h1) in got.items():
        assert h8 == _py_md5_long(k, 9, 8), k
        assert h15 == _py_md5_long(k, 1, 15), k
        assert h1 == _py_md5_long(k, 1, 1), k


def test_hex_fold_corruption_shape_regression(spark):
    """The conv-corruption projection shape: several hash columns of
    DISTINCT keys computed in ONE projection, downstream of a shuffle
    (the walks.py adjacency shape where conv returned a value
    belonging to no substring of the md5 next to it). Every fold value
    must equal the python replay of the md5 hex that Spark itself
    returns in the same row — any shared-buffer cross-talk between the
    per-digit ascii reads would break the equality."""
    df = (
        spark.range(20000)
        .select(
            F.col("id"),
            F.concat_ws("#", F.lit("a"), F.col("id").cast("string")).alias("k1"),
            F.concat_ws("#", F.lit("b"), F.col("id").cast("string")).alias("k2"),
            F.concat_ws("#", F.lit("c"), (F.col("id") * 7).cast("string")).alias("k3"),
        )
        .repartition(8, "id")  # force exchange so the projection runs post-shuffle
        .select(
            "k1",
            "k2",
            "k3",
            F.md5("k1").alias("m1"),
            F.md5("k2").alias("m2"),
            F.md5("k3").alias("m3"),
            md5_long(F.col("k1"), 9, 8).alias("h1"),
            md5_long(F.col("k2"), 9, 8).alias("h2"),
            md5_long(F.col("k3"), 1, 15).alias("h3"),
            hex_fold(F.md5("k1"), 1, 8).alias("g1"),
        )
    )
    rows = df.collect()
    assert len(rows) == 20000
    for r in rows:
        # fold value must agree with the md5 Spark computed IN THE SAME ROW
        assert r["h1"] == int(r["m1"][8:16], 16), r["k1"]
        assert r["h2"] == int(r["m2"][8:16], 16), r["k2"]
        assert r["h3"] == int(r["m3"][:15], 16), r["k3"]
        assert r["g1"] == int(r["m1"][:8], 16), r["k1"]
        # and with a fully-independent python md5
        assert r["h1"] == _py_md5_long(r["k1"], 9, 8)


def test_hex_fold_length_bounds():
    with pytest.raises(ValueError):
        hex_fold(F.lit("ff"), 1, 0)
    with pytest.raises(ValueError):
        hex_fold(F.lit("ff"), 1, 16)


def test_no_conv_call_sites_in_source():
    """Repo-wide guard: the corruption-prone ``F.conv(`` idiom must not
    reappear in any source file (docstring mentions are fine — the
    guard matches call syntax only)."""
    import pathlib
    import re

    root = pathlib.Path(__file__).resolve().parent.parent / "data_export_tool_spark"
    pat = re.compile(r"\bF\.conv\(|\bfunctions\.conv\(")
    offenders = []
    for p in root.rglob("*.py"):
        for i, line in enumerate(p.read_text().splitlines(), 1):
            if pat.search(line) and not line.lstrip().startswith(("#", '"', "``")):
                offenders.append(f"{p.name}:{i}: {line.strip()}")
    assert offenders == [], offenders
