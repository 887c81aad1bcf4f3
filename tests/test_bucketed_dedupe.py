"""Bucketed shuffle-free joins + streaming dedupe."""

import json

from shifts_etl_spark.sinks.bucketed import bucketed_join, write_bucketed
from shifts_etl_spark.sources.tables import load_table
from shifts_etl_spark.streaming.micro_batch import (
    streaming_dedupe,
    streaming_dedupe_within_watermark,
)

SF = "/root/testdata/sf0.001"


def test_bucketed_join_elides_shuffle(spark, tmp_path):
    orders = load_table(spark, SF, "orders").withColumnRenamed("o_orderkey", "k")
    lineitem = load_table(spark, SF, "lineitem").withColumnRenamed("l_orderkey", "k")
    write_bucketed(orders, "orders_b", ["k"], 8)
    write_bucketed(lineitem, "lineitem_b", ["k"], 8)
    try:
        # disable broadcast so the join actually exercises the bucketed path
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = bucketed_join(spark, "lineitem_b", "orders_b", "k")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange hashpartitioning" not in plan, plan[:2000]
        # and it still computes the right thing
        li = load_table(spark, SF, "lineitem")
        o = load_table(spark, SF, "orders")
        expected = li.join(o, li.l_orderkey == o.o_orderkey).count()
        assert joined.count() == expected
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        spark.sql("DROP TABLE IF EXISTS orders_b")
        spark.sql("DROP TABLE IF EXISTS lineitem_b")


def test_streaming_dedupe(spark, tmp_path):
    inp = tmp_path / "ev"
    inp.mkdir()
    rows = [
        {"event_id": i % 3, "ts": "2024-01-01T10:00:00.000Z", "user_id": 1,
         "event_type": "click", "value": 1.0, "props": "{}"}
        for i in range(9)  # ids 0,1,2 each 3 times
    ]
    with open(inp / "dup.json", "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    q = streaming_dedupe(spark, inp, tmp_path / "ck", query_name="dedup_t")
    q.awaitTermination()
    got = spark.sql("SELECT event_id FROM dedup_t").collect()
    assert sorted(r.event_id for r in got) == [0, 1, 2]


def test_streaming_dedupe_within_watermark(spark, tmp_path):
    """Producer retries that RE-STAMP ts still collapse to one row per
    key: the three copies of event 7 land at 10:00/10:10/10:20 (all
    within the 1h watermark) and dropDuplicatesWithinWatermark keys on
    event_id alone, which the (key, ts)-keyed streaming_dedupe cannot
    collapse."""
    inp = tmp_path / "ev"
    inp.mkdir()
    rows = [
        {"event_id": 7, "ts": f"2024-01-01T10:{m:02d}:00.000Z", "user_id": 1,
         "event_type": "click", "value": 1.0, "props": "{}"}
        for m in (0, 10, 20)
    ] + [
        {"event_id": 8, "ts": "2024-01-01T10:05:00.000Z", "user_id": 2,
         "event_type": "view", "value": 2.0, "props": "{}"}
    ]
    with open(inp / "retries.json", "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    q = streaming_dedupe_within_watermark(
        spark, inp, tmp_path / "ck_ww", query_name="dedup_ww_t"
    )
    q.awaitTermination()
    got = spark.sql("SELECT event_id FROM dedup_ww_t").collect()
    assert sorted(r.event_id for r in got) == [7, 8]
