"""Arrow UDAF + cogrouped pandas as-of join (functions/udafs.py):
equivalence against the JVM-side formulations."""

import pytest
from pyspark.sql import functions as F

from shifts_etl_spark.functions.udafs import asof_join_pandas, weighted_mean
from shifts_etl_spark.operators.asof import asof_join
from shifts_etl_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


def test_weighted_mean_matches_jvm(spark):
    li = load_table(spark, SF, "lineitem")
    got = {
        r["l_returnflag"]: r["wm"]
        for r in li.groupBy("l_returnflag")
        .agg(weighted_mean("l_extendedprice", "l_quantity").alias("wm"))
        .collect()
    }
    want = {
        r["l_returnflag"]: r["wm"]
        for r in li.groupBy("l_returnflag")
        .agg(
            (
                F.sum(F.col("l_extendedprice") * F.col("l_quantity"))
                / F.sum("l_quantity")
            ).alias("wm")
        )
        .collect()
    }
    assert set(got) == set(want)
    for k in got:
        assert got[k] == pytest.approx(want[k], rel=1e-9)


def test_pandas_asof_matches_jvm_asof(spark):
    ev = load_table(spark, SF, "events")
    purchases = ev.where("event_type = 'purchase'").select(
        "user_id", "event_id", "ts"
    )
    views = ev.where("event_type = 'view'").select("user_id", "ts", "value")

    jvm = asof_join(purchases, views, "user_id").select(
        "event_id", "asof_ts", "value"
    )
    pdj = asof_join_pandas(purchases, views, "user_id").select(
        "event_id", "asof_ts", "value"
    )
    a = sorted(map(tuple, jvm.collect()))
    b = sorted(map(tuple, pdj.collect()))
    assert len(a) > 0 and a == b
