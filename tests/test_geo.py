"""Geo primitives (operators/geo.py): haversine vs known city
distances + python replay, radius-join exactness vs brute force
(including antimeridian and dateline-straddling pairs), and the
no-cartesian plan contract."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from tests.conftest import record_opcheck
from data_export_tool_spark.operators.geo import (
    EARTH_RADIUS_KM,
    geo_radius_join,
    haversine_km,
)

CITIES = [
    ("london", 51.5074, -0.1278),
    ("paris", 48.8566, 2.3522),
    ("nyc", 40.7128, -74.0060),
    ("sydney", -33.8688, 151.2093),
    ("auckland", -36.8485, 174.7633),
    ("suva", -18.1416, 178.4419),       # near the antimeridian, east
    ("apia", -13.8333, -171.7667),      # near the antimeridian, west
    ("reykjavik", 64.1466, -21.9426),
    ("nairobi", -1.2921, 36.8219),
    ("quito", -0.1807, -78.4678),
]


def _hav(lat1, lng1, lat2, lng2):
    rl1, rl2 = math.radians(lat1), math.radians(lat2)
    dlat = math.radians(lat2 - lat1) / 2
    dlng = math.radians(lng2 - lng1) / 2
    a = math.sin(dlat) ** 2 + math.cos(rl1) * math.cos(rl2) * math.sin(dlng) ** 2
    return 2 * EARTH_RADIUS_KM * math.asin(min(math.sqrt(a), 1.0))


def test_haversine_known_distances(spark):
    df = spark.createDataFrame(CITIES, "name string, lat double, lng double")
    pairs = df.alias("a").crossJoin(df.alias("b")).where("a.name < b.name")
    got = {
        (r["an"], r["bn"]): r["d"]
        for r in pairs.select(
            F.col("a.name").alias("an"), F.col("b.name").alias("bn"),
            haversine_km(
                F.col("a.lat"), F.col("a.lng"), F.col("b.lat"), F.col("b.lng")
            ).alias("d"),
        ).collect()
    }
    coords = {n: (la, lo) for n, la, lo in CITIES}
    for (a, b), d in got.items():
        want = _hav(*coords[a], *coords[b])
        assert d == pytest.approx(want, rel=1e-9), (a, b)
    # sanity anchor: London–Paris ≈ 344 km
    assert got[("london", "paris")] == pytest.approx(343.9, abs=1.5)
    record_opcheck("haversine_km", len(got), True, oracle="python-reference")


@pytest.mark.parametrize("radius", [500.0, 3000.0])
def test_radius_join_matches_brute_force(spark, radius):
    # cities + a jittered cloud so cells have multiple members
    rows = list(CITIES)
    for i in range(120):
        base = CITIES[i % len(CITIES)]
        rows.append(
            (
                f"{base[0]}_{i}",
                max(-85.0, min(85.0, base[1] + ((i * 37) % 19 - 9) * 0.7)),
                ((base[2] + 180 + ((i * 53) % 23 - 11) * 0.9) % 360) - 180,
            )
        )
    df = spark.createDataFrame(rows, "name string, lat double, lng double")
    got = {
        (r["name_l"], r["name_r"]): r["distance_km"]
        for r in geo_radius_join(df, df, radius).collect()
    }
    want = {}
    for ln, lla, llo in rows:
        for rn, rla, rlo in rows:
            d = _hav(lla, llo, rla, rlo)
            if d <= radius:
                want[(ln, rn)] = round(d, 6)
    ok = set(got) == set(want) and all(
        abs(got[k] - want[k]) < 1e-5 for k in want
    )
    record_opcheck(
        f"geo_radius_join_{int(radius)}km", len(want), ok,
        oracle="python-brute-force",
    )
    assert ok, (
        f"missing={set(want) - set(got)} extra={set(got) - set(want)}"
    )
    # the antimeridian pair must be present at 3000 km (suva–apia ≈ 1150)
    if radius >= 3000:
        assert ("suva", "apia") in got


def test_radius_join_contracts(spark):
    df = spark.createDataFrame(
        [("a", 0.0, 0.0), ("bad", 91.0, 0.0), ("null", None, 0.0)],
        "name string, lat double, lng double",
    )
    out = geo_radius_join(df, df, 10.0).collect()
    # invalid rows excluded; the valid row matches itself at 0 km
    assert {(r["name_l"], r["name_r"]) for r in out} == {("a", "a")}
    with pytest.raises(ValueError):
        geo_radius_join(df, df, 0.0)
    # plan: grid equi-join, not a cartesian product
    big = spark.range(100).select(
        F.col("id").alias("name"),
        (F.col("id") % 60 - 30.0).cast("double").alias("lat"),
        (F.col("id") % 300 - 150.0).cast("double").alias("lng"),
    )
    plan = geo_radius_join(big, big, 50.0)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan


def test_radius_join_preserves_duplicate_input_rows(spark):
    """Two IDENTICAL left rows each pair with an in-radius right row —
    probe-cell dedup must not collapse input multiplicity (ADVICE r7:
    the old full-row .distinct() silently changed pair cardinality).
    The wrap duplication it replaced is exercised by a wide radius on
    a coarse longitude ring (few cells → modulo wrap collisions):
    pairs stay unique per (left row instance, right row)."""
    left = spark.createDataFrame(
        [("dup", 10.0, 20.0), ("dup", 10.0, 20.0), ("other", 10.1, 20.1)],
        "name string, lat double, lng double",
    )
    right = spark.createDataFrame(
        [("r1", 10.05, 20.05)], "name string, lat double, lng double"
    )
    out = geo_radius_join(left, right, 25.0).collect()
    names = sorted(r["name_l"] for r in out)
    assert names == ["dup", "dup", "other"]
    # wide-radius polar case: wrap-around probes must not double pairs
    pole_l = spark.createDataFrame(
        [("p", 84.0, 0.0), ("p", 84.0, 0.0)], "name string, lat double, lng double"
    )
    pole_r = spark.createDataFrame(
        [("q", 84.0, 179.0)], "name string, lat double, lng double"
    )
    polar = geo_radius_join(pole_l, pole_r, 2500.0).collect()
    assert len(polar) == 2 and {r["name_l"] for r in polar} == {"p"}
