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


def test_md5_sampler_ci_covers_truth_and_is_relayout_stable(spark, grouped):
    """The x245 md5-Bernoulli sampler keeps the estimator contract (CI
    coverage, tight relative error) AND returns the exact same result
    under a different partitioning — the reproducibility property the
    built-in split sampler lacks."""
    df, truth = grouped
    # layout-independent row key (monotonic ids would differ per layout)
    keyed = df.selectExpr("k", "v", "concat(k, ':', CAST(v AS STRING)) AS rid")
    got = {
        r["k"]: r
        for r in approx_groupby_sum(
            keyed, ["k"], "v", fraction=0.1, method="md5", sample_key="rid"
        ).collect()
    }
    misses = 0
    for k, (n, t) in truth.items():
        r = got[k]
        if not (r["ci95_lo"] <= t <= r["ci95_hi"]):
            misses += 1
        assert abs(r["est_total"] - t) / t < 0.15
        assert abs(r["est_count"] - n) / n < 0.15
    assert misses <= 1
    relaid = {
        r["k"]: (r["n_sampled"], r["est_total"])
        for r in approx_groupby_sum(
            keyed.repartition(13), ["k"], "v", fraction=0.1,
            method="md5", sample_key="rid",
        ).collect()
    }
    for k, r in got.items():
        assert relaid[k][0] == r["n_sampled"]
        assert relaid[k][1] == pytest.approx(r["est_total"], rel=1e-12)


def test_md5_sampler_requires_key_and_rejects_unknown_method(spark, grouped):
    df, _ = grouped
    with pytest.raises(ValueError, match="sample_key"):
        approx_groupby_sum(df, ["k"], "v", method="md5")
    with pytest.raises(ValueError, match="unknown method"):
        approx_groupby_sum(df, ["k"], "v", method="bogus")
