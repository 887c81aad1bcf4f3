"""k-anonymity audit (operators/quality.py:k_anonymity_histogram)."""

from __future__ import annotations

from pyspark.sql import functions as F

from shifts_etl_spark.operators.quality import k_anonymity_histogram


def test_k_anonymity_flags_small_classes(spark):
    # class (US, M): 3 rows -> at risk for k=4; class (US, F): 4 -> safe
    rows = [("US", "M")] * 3 + [("US", "F")] * 4 + [("DE", "M")] * 1
    df = spark.createDataFrame(rows, "country string, gender string")
    got = {
        r["class_size"]: r
        for r in k_anonymity_histogram(
            df, {"country": F.col("country"), "gender": F.col("gender")}, k=4
        ).collect()
    }
    assert got[1]["n_classes"] == 1 and got[1]["at_risk"]
    assert got[3]["n_classes"] == 1 and got[3]["at_risk"]
    assert got[4]["n_classes"] == 1 and not got[4]["at_risk"]
    assert sum(r["n_rows"] for r in got.values()) == len(rows)


def test_generalization_removes_risk(spark):
    # bucketing the numeric QI coarser merges singleton classes
    rows = [(i, 100.0 + i) for i in range(8)]
    df = spark.createDataFrame(rows, "id long, bal double")
    fine = k_anonymity_histogram(df, {"b": F.floor(F.col("bal"))}, k=4)
    coarse = k_anonymity_histogram(df, {"b": F.floor(F.col("bal") / 100)}, k=4)
    assert fine.where("at_risk").count() > 0
    assert coarse.where("at_risk").count() == 0
