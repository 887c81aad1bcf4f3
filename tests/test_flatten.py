"""Flatten layer vs the reference's golden counts + derived values
(reference etl/tests/test_shift_data_processor.py:320-350)."""

import datetime as dt
from decimal import Decimal

from shifts_etl_spark.operators import flatten
from shifts_etl_spark.schemas import SHIFT_DOC_SCHEMA

from .golden import GOLDEN_DOCS


def _docs(spark):
    return spark.createDataFrame(GOLDEN_DOCS, SHIFT_DOC_SCHEMA)


def test_golden_counts(spark):
    tables = flatten.flatten_all(_docs(spark))
    assert tables["shifts"].count() == 2
    assert tables["breaks"].count() == 2
    assert tables["allowances"].count() == 3
    assert tables["award_interpretations"].count() == 2


def test_shift_cost_fold(spark):
    rows = {
        r["shift_id"]: r
        for r in flatten.shifts_table(_docs(spark)).collect()
    }
    a = rows["b2b9437a-28df-4ec4-8e4a-2bbdc241330b"]
    b = rows["d453dd32-4b0d-4b41-8d52-88f1142c3fe8"]
    assert a["shift_cost"] == Decimal("44.4000")  # 2.5+29.7+12.2
    assert b["shift_cost"] == Decimal("118.7000")  # 62.8+55.9
    assert a["shift_date"] == dt.date(2023, 11, 27)


def test_epoch_ms_floor_to_seconds_utc(spark):
    rows = {r["break_id"]: r for r in flatten.breaks_table(_docs(spark)).collect()}
    b = rows["16419f82-8b9d-4434-a465-e150bd9c66b3"]
    # 1701087005277 ms floors to 1701087005 s == 2023-11-27 12:10:05 UTC
    assert b["break_finish"] == dt.datetime(2023, 11, 27, 12, 10, 5)
    assert b["is_paid"] is False


def test_empty_arrays_vanish_in_children(spark):
    # shift A has no awards; shift B no allowances — inner-explode semantics
    awards = flatten.awards_table(_docs(spark))
    assert awards.where(
        awards.shift_id == "b2b9437a-28df-4ec4-8e4a-2bbdc241330b"
    ).count() == 0
    allow = flatten.allowances_table(_docs(spark))
    assert allow.where(
        allow.shift_id == "d453dd32-4b0d-4b41-8d52-88f1142c3fe8"
    ).count() == 0


def test_explode_row_count_equals_size_sum(spark):
    # property: explode(T1) emits exactly sum(size(arr)) rows
    from pyspark.sql import functions as F

    docs = _docs(spark)
    expected = docs.select(F.sum(F.size("allowances"))).first()[0]
    assert flatten.explode_nested(docs, "allowances", "sid").count() == expected


def test_null_epoch_guard(spark):
    doc = dict(GOLDEN_DOCS[0], start=None, finish=0)
    df = spark.createDataFrame([doc], SHIFT_DOC_SCHEMA)
    row = flatten.shifts_table(df).first()
    assert row["shift_start"] is None  # null in
    assert row["shift_finish"] is None  # 0 is not > 0
