"""Point-in-time join (operators/asof.py:point_in_time_join): boundary
and open-interval semantics."""

from __future__ import annotations

import datetime as dt

from shifts_etl_spark.operators.asof import point_in_time_join


def test_pit_boundaries_and_open_interval(spark):
    d = dt.date
    dim = spark.createDataFrame(
        [
            (1, "v1", d(2024, 1, 1), d(2024, 2, 1)),
            (1, "v2", d(2024, 2, 1), None),  # open
        ],
        "k long, state string, valid_from date, valid_to date",
    )
    fact = spark.createDataFrame(
        [
            (1, d(2023, 12, 31)),  # before first version -> dropped
            (1, d(2024, 1, 1)),    # inclusive start -> v1
            (1, d(2024, 1, 31)),   # last day of v1
            (1, d(2024, 2, 1)),    # exclusive end of v1 -> v2
            (1, d(2030, 1, 1)),    # open interval -> v2
            (2, d(2024, 1, 15)),   # unknown key -> dropped
        ],
        "k long, ts date",
    )
    got = sorted(
        (r["ts"], r["state"])
        for r in point_in_time_join(fact, dim, "k", "ts").collect()
    )
    assert got == [
        (d(2024, 1, 1), "v1"),
        (d(2024, 1, 31), "v1"),
        (d(2024, 2, 1), "v2"),
        (d(2030, 1, 1), "v2"),
    ]
