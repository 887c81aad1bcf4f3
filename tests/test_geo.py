"""Grid radius join (operators/geo.py): known distances, antimeridian
wrap, cell-size guard, and grid==naive equivalence on random points."""

from __future__ import annotations

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from shifts_etl_spark.operators.geo import grid_radius_join, haversine_km


def _df(spark, rows):
    return spark.createDataFrame(rows, "id long, lat double, lon double")


def test_known_distance(spark):
    # one degree of latitude at the equator ~ 111.19 km
    df = spark.createDataFrame([(1,)], "x int").select(
        haversine_km(F.lit(0.0), F.lit(0.0), F.lit(1.0), F.lit(0.0)).alias("d")
    )
    assert df.collect()[0]["d"] == pytest.approx(111.19, abs=0.05)


def test_antimeridian_pair_found(spark):
    left = _df(spark, [(1, 10.0, 179.9)])
    right = _df(spark, [(2, 10.0, -179.9)])
    got = grid_radius_join(left, right, radius_km=50.0, cell_deg=1.0).collect()
    assert len(got) == 1
    assert got[0]["dist_km"] < 25.0


def test_radius_must_fit_cell_step(spark):
    left = _df(spark, [(1, 0.0, 0.0)])
    with pytest.raises(ValueError, match="cell step"):
        grid_radius_join(left, left, radius_km=500.0, cell_deg=1.0)


def test_grid_matches_naive_on_random_points(spark):
    rng = np.random.RandomState(3)
    pts = [
        (i, float(lat), float(lon))
        for i, (lat, lon) in enumerate(
            zip(rng.uniform(-45, 45, 150), rng.uniform(-180, 180, 150))
        )
    ]
    df = _df(spark, pts)
    grid = grid_radius_join(df, df, radius_km=300.0, cell_deg=4.0, max_abs_lat=45.0)
    got = {(r["l_id"], r["r_id"]) for r in grid.collect()}

    def hav(a, b):
        p1, p2 = math.radians(a[1]), math.radians(b[1])
        dphi = math.radians(b[1] - a[1]) / 2
        dl = math.radians(b[2] - a[2]) / 2
        x = math.sin(dphi) ** 2 + math.cos(p1) * math.cos(p2) * math.sin(dl) ** 2
        return 2 * 6371.0 * math.asin(math.sqrt(x))

    expected = {
        (a[0], b[0]) for a in pts for b in pts if hav(a, b) <= 300.0
    }
    assert got == expected
