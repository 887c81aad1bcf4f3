"""Incremental rollup maintenance (operators/incremental.py): fold-order
invariance vs the one-shot aggregate, avg partials, absent-key identity."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from shifts_etl_spark.operators import incremental as inc

MEASURES = {
    "n": ("count", "*"),
    "total": ("sum", "v"),
    "lo": ("min", "v"),
    "hi": ("max", "v"),
    "mean": ("avg", "v"),
}


def _rows(df):
    return {
        r["k"]: (r["n"], round(r["total"], 6), r["lo"], r["hi"], round(r["mean"], 6))
        for r in df.collect()
    }


def test_fold_equals_one_shot_any_order(spark):
    batches = [
        [("a", 1.0), ("a", 3.0), ("b", 10.0)],
        [("b", -2.0), ("c", 5.0)],
        [("a", 7.0)],
    ]
    dfs = [spark.createDataFrame(b, "k string, v double") for b in batches]
    full = dfs[0]
    for d in dfs[1:]:
        full = full.unionByName(d)
    expected = _rows(
        inc.render(inc.aggregate_partials(full, ["k"], MEASURES), MEASURES)
    )

    for order in ([0, 1, 2], [2, 0, 1], [1, 2, 0]):
        state = None
        for i in order:
            partials = inc.aggregate_partials(dfs[i], ["k"], MEASURES)
            state = inc.merge_state(state, partials, ["k"], MEASURES)
        assert _rows(inc.render(state, MEASURES)) == expected, order


def test_absent_key_keeps_prior_extrema(spark):
    d1 = spark.createDataFrame([("a", 5.0)], "k string, v double")
    d2 = spark.createDataFrame([("b", 1.0)], "k string, v double")
    state = inc.merge_state(
        inc.aggregate_partials(d1, ["k"], MEASURES),
        inc.aggregate_partials(d2, ["k"], MEASURES),
        ["k"],
        MEASURES,
    )
    got = _rows(inc.render(state, MEASURES))
    assert got["a"] == (1, 5.0, 5.0, 5.0, 5.0)
    assert got["b"] == (1, 1.0, 1.0, 1.0, 1.0)


def test_non_algebraic_measure_rejected(spark):
    df = spark.createDataFrame([("a", 1.0)], "k string, v double")
    with pytest.raises(ValueError, match="non-algebraic"):
        inc.aggregate_partials(df, ["k"], {"p50": ("median", "v")})
