"""Approximate query processing (operators/aqp.py): estimator
unbiasedness at fraction=1, CI coverage of true totals, input guards."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from shifts_etl_spark.operators.aqp import approx_groupby_sum


@pytest.fixture(scope="module")
def grouped(spark):
    rng = np.random.RandomState(11)
    rows = [
        (f"g{i % 8}", float(v))
        for i, v in enumerate(rng.gamma(2.0, 50.0, 40_000))
    ]
    df = spark.createDataFrame(rows, "k string, v double").repartition(8)
    truth = {}
    for k, v in rows:
        n, t = truth.get(k, (0, 0.0))
        truth[k] = (n + 1, t + v)
    return df, truth


def test_exact_at_fraction_one(spark, grouped):
    df, truth = grouped
    got = {
        r["k"]: r for r in approx_groupby_sum(df, ["k"], "v", fraction=1.0).collect()
    }
    for k, (n, t) in truth.items():
        assert got[k]["est_count"] == n
        assert got[k]["est_total"] == pytest.approx(t, rel=1e-9)
        assert got[k]["se_total"] == 0.0


def test_ci_covers_truth(spark, grouped):
    df, truth = grouped
    got = {
        r["k"]: r for r in approx_groupby_sum(df, ["k"], "v", fraction=0.1).collect()
    }
    # 8 groups x 95% CI: allow one miss, require tight relative error
    misses = 0
    for k, (n, t) in truth.items():
        r = got[k]
        if not (r["ci95_lo"] <= t <= r["ci95_hi"]):
            misses += 1
        assert abs(r["est_total"] - t) / t < 0.15
        assert abs(r["est_count"] - n) / n < 0.15
    assert misses <= 1


def test_fraction_validated(spark, grouped):
    df, _ = grouped
    with pytest.raises(ValueError):
        approx_groupby_sum(df, ["k"], "v", fraction=0.0)
