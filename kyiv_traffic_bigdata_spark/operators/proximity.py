"""Geo-proximity range join — SURVEY §7.3's "range join + haversine
predicate" extension (geo enrichment: all right-side points within
``radius_km`` of each left-side point).

The naive formulation is a cross join with a distance predicate —
O(|L| x |R|) haversine evaluations and, worse, a Cartesian physical plan.
The scale shape is **grid-cell blocking**: bucket both sides into square
lat/lon cells at least as wide (in degrees, at the data's worst-case
latitude) as the radius, expand each left row to its 3x3 cell
neighborhood, and equi-join on the cell id. Any pair within the radius is
guaranteed to land in adjacent cells, so the exact haversine predicate
applied after the equi-join makes the blocking a pure optimization — the
result is IDENTICAL to the cross-join formulation (the oracle states it
as a plain distance join). The equi-join hash-partitions by cell —
co-located, broadcast-able when one side is small, skew-handled by AQE —
and the 9x left-side expansion is far cheaper than an O(n·m) cross
product at any realistic density.

Cell width is a caller decision because it encodes the worst-case
latitude: 1 km is ~0.009° of latitude everywhere but ~0.0142° of
longitude at Kyiv's 50.7°N (degrees-per-km grows with |lat|). Callers
must pick ``cell_deg >= radius_km / (111.19 * cos(max_abs_lat))``.
No antimeridian handling — fine for the reference's Kyiv/Ukraine bboxes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.geo import haversine_km


def proximity_join(
    left: DataFrame,
    right: DataFrame,
    radius_km: float,
    cell_deg: float,
    lat_col: str = "lat",
    lon_col: str = "lon",
    left_prefix: str = "l_",
    right_prefix: str = "r_",
) -> DataFrame:
    """All (left, right) pairs with haversine distance <= ``radius_km``.

    Returns every left column prefixed ``left_prefix``, every right column
    prefixed ``right_prefix``, plus exact ``dist_km``. Self-pairs are the
    caller's concern (filter on ids afterwards).
    """
    if cell_deg < radius_km / 111.0:
        raise ValueError("cell_deg narrower than radius at the equator")

    l_cells = left.select(
        *[F.col(c).alias(f"{left_prefix}{c}") for c in left.columns],
        F.explode(
            F.array(*[F.lit(d) for d in (-1, 0, 1)])
        ).alias("_dlat"),
    ).select(
        "*",
        F.explode(F.array(*[F.lit(d) for d in (-1, 0, 1)])).alias("_dlon"),
    ).select(
        "*",
        (F.floor(F.col(f"{left_prefix}{lat_col}") / F.lit(cell_deg)) + F.col("_dlat")).alias("_clat"),
        (F.floor(F.col(f"{left_prefix}{lon_col}") / F.lit(cell_deg)) + F.col("_dlon")).alias("_clon"),
    ).drop("_dlat", "_dlon")

    r_cells = right.select(
        *[F.col(c).alias(f"{right_prefix}{c}") for c in right.columns],
        F.floor(F.col(f"{right_prefix}{lat_col}") / F.lit(cell_deg)).alias("_clat"),
        F.floor(F.col(f"{right_prefix}{lon_col}") / F.lit(cell_deg)).alias("_clon"),
    )

    dist = haversine_km(
        F.col(f"{left_prefix}{lat_col}"),
        F.col(f"{left_prefix}{lon_col}"),
        F.col(f"{right_prefix}{lat_col}"),
        F.col(f"{right_prefix}{lon_col}"),
    )
    return (
        l_cells.join(r_cells, ["_clat", "_clon"])
        .where(dist <= radius_km)
        .drop("_clat", "_clon")
        .withColumn("dist_km", dist)
    )
