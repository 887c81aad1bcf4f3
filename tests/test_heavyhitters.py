"""Misra-Gries heavy hitters (operators/heavyhitters.py): exact output
above threshold regardless of partitioning, guarantee guard, planted skew."""

import pytest
from pyspark.sql import functions as F

from shifts_etl_spark.operators.heavyhitters import heavy_hitters


def _skewed(spark, n=20_000):
    # value v appears with frequency ~ 1/(v+1): v=0 dominates, long tail
    return spark.range(n).select(
        (F.col("id") % (F.col("id") % 97 + 1)).cast("string").alias("v")
    )


def _exact(df, frac):
    import math

    n = df.count()
    thr = math.ceil(n * frac)
    return {
        (r["v"], r["c"])
        for r in df.groupBy("v").agg(F.count("*").alias("c")).where(
            F.col("c") >= thr
        ).collect()
    }


def test_matches_exact_counts_on_skewed_data(spark):
    df = _skewed(spark)
    got = {
        (r["item"], r["cnt"])
        for r in heavy_hitters(df, "v", k=150, min_frac=0.01).collect()
    }
    assert got == _exact(df, 0.01)
    assert got, "skewed data must yield at least one heavy hitter"


def test_partition_independence(spark):
    df = _skewed(spark, 5_000)
    a = {(r["item"], r["cnt"])
         for r in heavy_hitters(df.repartition(3), "v", k=120, min_frac=0.02).collect()}
    b = {(r["item"], r["cnt"])
         for r in heavy_hitters(df.repartition(29), "v", k=120, min_frac=0.02).collect()}
    assert a == b == _exact(df, 0.02)


def test_planted_majority_item_found(spark):
    rows = [("hot",)] * 500 + [(f"cold{i}",) for i in range(500)]
    df = spark.createDataFrame(rows, "v string").repartition(8)
    got = heavy_hitters(df, "v", k=50, min_frac=0.4).collect()
    assert [(r["item"], r["cnt"]) for r in got] == [("hot", 500)]


def test_threshold_below_guarantee_raises(spark):
    df = _skewed(spark, 100)
    with pytest.raises(ValueError, match="guarantee"):
        heavy_hitters(df, "v", k=10, min_frac=0.05)
