"""Geospatial radius join via grid bucketing — the spatial member of the
candidate-generation family (LSH bands for text, IVF cells for vectors,
first-token blocks for names, grid cells for coordinates).

A naive radius join is |L|·|R| haversine evaluations; the grid form
assigns every point an integer (lat_cell, lon_cell), replicates the LEFT
side over its 3×3 neighbor cells, equi-joins on the cell key, and
verifies the exact haversine distance on candidates only — Σ|cell|²
work, and the join shuffle carries (cell, id, lat, lon) rows. Same
discipline, different geometry.

Correctness precondition (asserted): the radius must fit within one
cell step in BOTH axes, i.e. radius_km ≤ cell_deg·111.0 for latitude and
radius_km ≤ cell_deg·111.0·cos(max|lat|) for longitude — otherwise a
true pair could sit two cells away and the 3×3 neighborhood misses it.
Callers with polar data widen cell_deg or band cells by latitude (the
production refinement; not needed for the ±60° synthetic testdata).

All math is built-in double trig inside codegen; no UDFs.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, functions as F

EARTH_RADIUS_KM = 6371.0
KM_PER_DEG = 111.0


def haversine_km(lat1: Column, lon1: Column, lat2: Column, lon2: Column) -> Column:
    """Great-circle distance in km (double, standard haversine form)."""
    p1, p2 = F.radians(lat1), F.radians(lat2)
    dphi = F.radians(lat2 - lat1) / 2
    dlmb = F.radians(lon2 - lon1) / 2
    a = F.sin(dphi) * F.sin(dphi) + F.cos(p1) * F.cos(p2) * F.sin(dlmb) * F.sin(dlmb)
    return 2 * EARTH_RADIUS_KM * F.asin(F.sqrt(a))


def grid_radius_join(
    left: DataFrame,
    right: DataFrame,
    radius_km: float,
    cell_deg: float,
    max_abs_lat: float = 60.0,
) -> DataFrame:
    """Pairs (l_id, r_id, dist_km) with haversine ≤ radius_km. Frames
    must carry (id, lat, lon); lat bounded by ±max_abs_lat."""
    lat_ok = radius_km <= cell_deg * KM_PER_DEG
    lon_ok = radius_km <= cell_deg * KM_PER_DEG * math.cos(
        math.radians(max_abs_lat)
    )
    if not (lat_ok and lon_ok):
        raise ValueError(
            f"radius {radius_km} km exceeds one {cell_deg}-degree cell step "
            f"at lat ±{max_abs_lat} — widen cell_deg or band by latitude"
        )

    # longitude cells are MODULAR (the ±180 antimeridian is adjacent to
    # itself — haversine is wrap-aware, so the grid must be too; missed
    # wrap pairs were caught by the naive-join oracle at sf0.1)
    n_lon = max(int(round(360.0 / cell_deg)), 1)

    def cells(df: DataFrame, prefix: str, explode_neighbors: bool) -> DataFrame:
        cy = F.floor(F.col("lat") / cell_deg).cast("int")
        cx = F.pmod(
            F.floor((F.col("lon") + 180.0) / cell_deg).cast("int"), F.lit(n_lon)
        )
        out = df.select(
            F.col("id").alias(f"{prefix}_id"),
            F.col("lat").alias(f"{prefix}_lat"),
            F.col("lon").alias(f"{prefix}_lon"),
            cy.alias("_cy"),
            cx.alias("_cx"),
        )
        if explode_neighbors:
            out = (
                out.withColumn("_dy", F.explode(F.array(*[F.lit(d) for d in (-1, 0, 1)])))
                .withColumn("_dx", F.explode(F.array(*[F.lit(d) for d in (-1, 0, 1)])))
                .select(
                    f"{prefix}_id",
                    f"{prefix}_lat",
                    f"{prefix}_lon",
                    (F.col("_cy") + F.col("_dy")).alias("_cy"),
                    F.pmod(F.col("_cx") + F.col("_dx"), F.lit(n_lon)).alias("_cx"),
                )
            )
        return out

    l = cells(left, "l", explode_neighbors=True)
    r = cells(right, "r", explode_neighbors=False)
    dist = haversine_km(
        F.col("l_lat"), F.col("l_lon"), F.col("r_lat"), F.col("r_lon")
    )
    return (
        l.join(r, ["_cy", "_cx"])
        .select("l_id", "r_id", dist.alias("dist_km"))
        .where(F.col("dist_km") <= radius_km)
    )
