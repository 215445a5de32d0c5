"""Geospatial primitives: haversine distance + grid-bucketed radius
join.

The spatial tier a log/sensor/ops pipeline needs without a GIS
dependency: great-circle distance as pure column math, and the
all-pairs-free radius join — "every (left, right) pair within r km" —
via fixed-degree grid bucketing (the classic spatial-hash join; same
family as the repo's LSH band joins and z-order layout, applied to
the sphere).

Scale shape of :func:`geo_radius_join`:

- both sides bucket into a (lat_cell, lng_cell) grid with cell height
  ``radius`` in latitude degrees, so a within-radius partner is never
  more than one lat-cell away;
- longitude degrees SHRINK with latitude, so each left row probes
  ``±ceil(Δlng(lat)/cell)`` lng cells at its own latitude (a per-row
  bounded ``sequence`` explode — wider near the poles, 3 cells near
  the equator), with lng cells wrapping modulo the cell count so the
  antimeridian joins correctly;
- the join is a plain equi-join on (lat_cell, lng_cell) followed by
  the exact haversine filter ≤ r — candidates are the ~9-cell
  neighborhood's points, never the corpus².

Cost is OUTPUT-BOUND in dense areas: a cell holding k mutually
within-radius points genuinely has ~k² qualifying pairs — that is
the answer's size, not an avoidable blow-up (cap the left side or
shrink the radius when the pair set itself is the problem).

Contract: coordinates in degrees, lat ∈ [−90, 90], lng ∈ [−180,
180]; rows with NULL/out-of-range coordinates are excluded (no
position, no join); |lat| > 85° is clamped into the polar cap cell
ring (pairs straddling the caps still verify by exact distance —
candidates there are a full ring, correct but not sparse; polar
workloads want a dedicated cap index). Earth radius 6371.0088 km
(IUGG mean).
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["haversine_km", "geo_radius_join"]

EARTH_RADIUS_KM = 6371.0088
KM_PER_LAT_DEG = math.pi * EARTH_RADIUS_KM / 180.0  # ≈ 111.195


def haversine_km(
    lat1: Column, lng1: Column, lat2: Column, lng2: Column
) -> Column:
    """Great-circle distance in km (haversine form — numerically
    stable at small distances, exact antipodes fine at this radius).
    Pure JVM column math."""
    rl1, rl2 = F.radians(lat1), F.radians(lat2)
    dlat = F.radians(lat2 - lat1) / 2.0
    dlng = F.radians(lng2 - lng1) / 2.0
    a = F.sin(dlat) * F.sin(dlat) + F.cos(rl1) * F.cos(rl2) * F.sin(dlng) * F.sin(dlng)
    # clamp for float wobble at antipodes before asin
    return (
        2.0
        * F.lit(EARTH_RADIUS_KM)
        * F.asin(F.least(F.sqrt(a), F.lit(1.0)))
    )


def _valid(lat: Column, lng: Column) -> Column:
    return (
        lat.isNotNull()
        & lng.isNotNull()
        & (lat >= -90.0)
        & (lat <= 90.0)
        & (lng >= -180.0)
        & (lng <= 180.0)
    )


def geo_radius_join(
    left: DataFrame,
    right: DataFrame,
    radius_km: float,
    lat_col: str = "lat",
    lng_col: str = "lng",
    suffixes: tuple[str, str] = ("_l", "_r"),
) -> DataFrame:
    """All (left, right) pairs within ``radius_km``:
    ``(*left_cols{suffix}, *right_cols{suffix}, distance_km)``.

    See module docstring for the grid shape. ``radius_km`` bounds the
    cell size; very large radii degrade toward more cells probed per
    row (the honest cost of a wide radius), never toward a cross
    join of the corpora.
    """
    if not radius_km > 0:
        raise ValueError(f"radius_km must be > 0: {radius_km}")
    cell_deg = radius_km / KM_PER_LAT_DEG
    n_lng_cells = max(1, int(math.ceil(360.0 / cell_deg)))

    def lat_cell(lat: Column) -> Column:
        # clamp the polar caps into the outermost ring (contract)
        return F.floor(
            (F.greatest(F.least(lat, F.lit(85.0)), F.lit(-85.0)) + 90.0)
            / cell_deg
        ).cast("long")

    def lng_cell(lng: Column) -> Column:
        return F.pmod(
            F.floor((lng + 180.0) / cell_deg).cast("long"),
            F.lit(n_lng_cells),
        )

    lsel = left.where(_valid(F.col(lat_col), F.col(lng_col))).select(
        *[F.col(c).alias(c + suffixes[0]) for c in left.columns]
    )
    rsel = right.where(_valid(F.col(lat_col), F.col(lng_col))).select(
        *[F.col(c).alias(c + suffixes[1]) for c in right.columns]
    )
    llat, llng = F.col(lat_col + suffixes[0]), F.col(lng_col + suffixes[0])
    rlat, rlng = F.col(lat_col + suffixes[1]), F.col(lng_col + suffixes[1])

    # per-row lng probe span at the row's own latitude (±1 cell slack
    # for boundary-straddling partners); cos clamped so the cap ring
    # probes the full circle rather than dividing by ~0
    coslat = F.greatest(
        F.cos(F.radians(F.least(F.abs(llat) + F.lit(cell_deg), F.lit(85.0)))),
        F.lit(1e-3),
    )
    span = F.least(
        F.ceil(F.lit(radius_km) / (F.lit(KM_PER_LAT_DEG) * coslat * F.lit(cell_deg))) + 1,
        F.lit(n_lng_cells // 2 + 1),
    ).cast("int")

    # generate each left row's probe cells as ONE array and
    # array_distinct it BEFORE exploding: a wide span can hit the same
    # (latc, lngc) twice after the modulo wrap on small n_lng_cells,
    # and deduping the probe multiplicity here (rather than a full-row
    # .distinct() on the output) leaves genuinely duplicate input rows
    # intact — two identical left rows in radius emit two pairs
    # (ADVICE r7)
    cells = F.array_distinct(
        F.flatten(
            F.transform(
                F.sequence(F.lit(-1), F.lit(1)),
                lambda dlat: F.transform(
                    F.sequence(-span, span),
                    lambda dlng: F.struct(
                        (lat_cell(llat) + dlat).alias("latc"),
                        F.pmod(
                            lng_cell(llng) + dlng, F.lit(n_lng_cells)
                        ).alias("lngc"),
                    ),
                ),
            )
        )
    )
    probes = lsel.select("*", F.explode(cells).alias("__cell")).select(
        "*",
        F.col("__cell.latc").alias("__latc"),
        F.col("__cell.lngc").alias("__lngc"),
    ).drop("__cell")

    anchors = rsel.select(
        "*",
        lat_cell(rlat).alias("__latc"),
        lng_cell(rlng).alias("__lngc"),
    )
    joined = probes.join(anchors, ["__latc", "__lngc"]).drop("__latc", "__lngc")
    dist = haversine_km(llat, llng, rlat, rlng)
    # no output-side distinct: probe-cell dedup above already removed
    # the only duplication source, so input-row multiplicity survives
    return joined.withColumn("distance_km", F.round(dist, 6)).where(
        F.col("distance_km") <= radius_km
    )
