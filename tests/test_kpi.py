"""Six golden KPI values (reference etl/tests/test_shift_data_processor.py:352-392)."""

from decimal import Decimal

import pytest

from shifts_etl_spark.operators import flatten, kpi
from shifts_etl_spark.schemas import SHIFT_DOC_SCHEMA

from .golden import ANCHOR_DATE, GOLDEN_DOCS, GOLDEN_KPIS


@pytest.fixture(scope="module")
def tables(spark):
    docs = spark.createDataFrame(GOLDEN_DOCS, SHIFT_DOC_SCHEMA)
    return flatten.flatten_all(docs)


def test_golden_kpis(spark, tables):
    kpis = kpi.compute_kpis(
        spark,
        tables["shifts"],
        tables["breaks"],
        tables["allowances"],
        anchor_date=ANCHOR_DATE,
    )
    got = {r["kpi_name"]: r["kpi_value"] for r in kpis.collect()}
    assert set(got) == set(GOLDEN_KPIS)
    for name, want in GOLDEN_KPIS.items():
        assert got[name] == Decimal(str(want)).quantize(Decimal("0.01")), name


def test_kpis_invariant_under_row_shuffle(spark, tables):
    # property: KPI values don't depend on input row order/partitioning
    shifts = tables["shifts"].repartition(7)
    breaks = tables["breaks"].repartition(5)
    allows = tables["allowances"].repartition(3)
    kpis = kpi.compute_kpis(spark, shifts, breaks, allows, anchor_date=ANCHOR_DATE)
    got = {r["kpi_name"]: float(r["kpi_value"]) for r in kpis.collect()}
    assert got == {k: pytest.approx(v) for k, v in GOLDEN_KPIS.items()}


def test_islands_recent_window(spark, tables):
    # with anchor inside the 14-day window, max_allowance_cost_14d = 29.7
    kpis = kpi.compute_kpis(
        spark,
        tables["shifts"],
        tables["breaks"],
        tables["allowances"],
        anchor_date="2023-11-29",
    )
    got = {r["kpi_name"]: r["kpi_value"] for r in kpis.collect()}
    assert got["max_allowance_cost_14d"] == Decimal("29.70")


def test_break_free_islands_shape(spark):
    """Gaps-and-islands on a constructed 6-shift sequence:
    dates d1..d6, breaks on d2 and d5 → islands: [d1]=1 (grp0, no adjust),
    then [d2,d3,d4]→grp1 cnt 3-1=2, [d5,d6]→grp2 cnt 2-1=1 → max 2."""
    import datetime as dt

    from pyspark.sql import Row

    shifts = spark.createDataFrame(
        [Row(shift_id=f"s{i}", shift_date=dt.date(2024, 1, i + 1)) for i in range(6)]
    )
    breaks = spark.createDataFrame(
        [Row(break_id="b1", shift_id="s1"), Row(break_id="b2", shift_id="s4")]
    )
    top = kpi.max_break_free_shift_period_in_days(shifts, breaks).first()
    assert float(top["kpi_value"]) == 2.0


def test_rounding_tie_divergence_is_pinned(spark):
    """SURVEY §2.9 accepted divergence, pinned so it never surprises:
    the reference's Python round() is HALF_EVEN (banker's), Spark's
    F.round is HALF_UP. They differ ONLY on exact ties — which float
    KPI sums essentially never hit (the goldens contain none) — and the
    DecimalType(8,2) KPI cast is HALF_UP on both engines' paths.
    0.125 and 0.375 are exactly representable doubles, so the tie is
    real, not a binary-representation artifact."""
    from pyspark.sql import Row, functions as F

    ties = spark.createDataFrame(
        [Row(x=0.125), Row(x=0.375), Row(x=2.5)]
    )
    spark_rounded = [
        r["r"]
        for r in ties.select(
            F.round("x", 2).alias("r")
        ).orderBy("x").collect()
    ]
    # F.round: HALF_UP — ties go away from zero
    assert spark_rounded == [0.13, 0.38, 2.5]  # 2.5 has no 2-dp tie
    # Python round: HALF_EVEN — same inputs land on the even neighbor
    assert [round(x, 2) for x in [0.125, 0.375, 2.5]] == [0.12, 0.38, 2.5]
    # the divergent case, explicitly: 0.125 rounds apart; 0.375 agrees
    # (0.38 is the even neighbor AND the away-from-zero one)
    assert round(0.125, 2) != spark_rounded[0]
    # Decimal KPI cast (the actual sink path) is HALF_UP on ties
    dec = ties.select(
        F.col("x").cast("decimal(8,2)").alias("d")
    ).orderBy("x").collect()
    assert [str(r["d"]) for r in dec] == ["0.13", "0.38", "2.50"]
