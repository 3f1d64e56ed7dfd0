"""Grid-bucketed spatial radius join — "find partners within R km" at
corpus scale without the cross join a naive haversine filter plans.

Same family as operators/iprange (1-D buckets): each point maps to an
integer (lat, lon) grid cell sized so the radius spans at most one
neighboring cell; the LEFT side joins each of its 3x3 neighborhood
cells against the RIGHT side's home cell — an ordinary equi-join on
the cell key — and the exact haversine distance refilters. Correct
because two points within R km can differ by at most one cell index
on each axis when the cell edge >= R (longitude cells shrink toward
the poles, so the cell width uses the worst-case |lat| of the data,
and R is capped below one lat-degree ~111 km for the neighborhood
invariant to hold).

Scale shape: the 9-cell explode is a constant fan-out on the (usually
smaller) probe side; the join shuffles by cell key — geographic skew
(everyone in one city) is visible as a hot cell and treatable with
the same salting as any hot join key. Exact distance math stays in
whole-stage codegen (sin/cos/asin column algebra).
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

EARTH_RADIUS_KM = 6371.0


def haversine_km(
    lat1: Column, lon1: Column, lat2: Column, lon2: Column
) -> Column:
    """Great-circle distance in km (double column algebra)."""
    rl1 = F.radians(lat1)
    rl2 = F.radians(lat2)
    dlat = F.radians(lat2 - lat1) / 2
    dlon = F.radians(lon2 - lon1) / 2
    a = F.sin(dlat) * F.sin(dlat) + F.cos(rl1) * F.cos(rl2) * F.sin(
        dlon
    ) * F.sin(dlon)
    return 2 * EARTH_RADIUS_KM * F.asin(F.sqrt(a))


def radius_join(
    left: DataFrame,
    right: DataFrame,
    radius_km: float,
    lat_cols: tuple[str, str] = ("lat", "lat"),
    lon_cols: tuple[str, str] = ("lon", "lon"),
    max_abs_lat: float = 70.0,
) -> DataFrame:
    """Inner-join every left row to every right row within
    ``radius_km`` great-circle km, adding ``dist_km`` (rounded to 6).
    Input columns must not collide (alias before calling). Data must
    satisfy ``|lat| <= max_abs_lat`` (cells degenerate at the poles);
    radius must stay under one latitude degree (~111 km). Longitude
    cell indices wrap modulo the cell count, so neighborhoods that
    straddle the ±180° antimeridian join correctly.
    """
    if radius_km >= 110.0:
        raise ValueError("radius_join supports radius < 110 km")
    lat_deg = radius_km / 111.0  # 1 lat degree ~ 111 km
    # worst-case lon shrink at the highest |lat| the caller vouches for
    lon_deg = radius_km / (
        111.0 * math.cos(math.radians(min(max_abs_lat, 89.0)))
    )
    # Longitude cells tile the full circle and the index WRAPS, so
    # pairs straddling the ±180° antimeridian land in adjacent cells
    # mod n_lon instead of being silently dropped. floor (not ceil)
    # keeps each cell >= lon_deg wide, preserving the same-or-adjacent
    # guarantee; radius < 110 km and |lat| <= 89° bound lon_deg below
    # ~57°, so n_lon >= 6 and the ±1 neighbor offsets stay distinct
    # mod n_lon (no duplicate candidate cells).
    n_lon = max(int(360.0 // lon_deg), 1)
    lon_w = 360.0 / n_lon
    llat, rlat = lat_cols
    llon, rlon = lon_cols

    def cell(lat: Column, lon: Column) -> tuple[Column, Column]:
        return (
            F.floor(lat / F.lit(lat_deg)).cast("long"),
            F.pmod(
                F.floor((lon + F.lit(180.0)) / F.lit(lon_w)), F.lit(n_lon)
            ).cast("long"),
        )

    r_i, r_j = cell(F.col(rlat), F.col(rlon))
    rr = right.withColumn("_ci", r_i).withColumn("_cj", r_j)
    l_i, l_j = cell(F.col(llat), F.col(llon))
    off = F.array(*[F.lit(d) for d in (-1, 0, 1)])
    ll = (
        left.withColumn("_i0", l_i)
        .withColumn("_j0", l_j)
        .withColumn("_di", F.explode(off))
        .withColumn("_dj", F.explode(off))
        .select(
            *left.columns,
            (F.col("_i0") + F.col("_di")).alias("_ci"),
            F.pmod(F.col("_j0") + F.col("_dj"), F.lit(n_lon)).alias("_cj"),
        )
    )
    d = haversine_km(
        F.col(llat), F.col(llon), F.col(rlat), F.col(rlon)
    )
    return (
        ll.join(rr, ["_ci", "_cj"])
        .withColumn("dist_km", F.round(d, 6))
        .where(F.col("dist_km") <= radius_km)
        .drop("_ci", "_cj")
    )
