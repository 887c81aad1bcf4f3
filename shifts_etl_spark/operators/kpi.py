"""KPI layer — the six KPIs the reference computes in one SQL statement
(reference etl/app/shift_data_processor.py:225-279; golden values
etl/tests/test_shift_data_processor.py:352-392, see FIXTURES.md §3).

Each KPI is a one-row aggregate DataFrame; ``compute_kpis`` unions them into
the kpis frame (kpi_name, kpi_date, kpi_value decimal(8,2)) — the Spark
analog of the reference's 6-way VALUES of scalar subqueries (Q1/Q3).

``anchor_date`` parameterizes the reference's CURRENT_DATE so results are
deterministic in tests (SURVEY.md §7.4 pitfall #4); the live pipeline passes
None → current_date().

Scale notes (100 TB):
  - The five plain aggregates are map-side partial aggregations — one shuffle
    of 1 row per partition each. Trivially scalable.
  - J1 (allowances ⋈ shifts) broadcasts the smaller side; the date filter is
    pushed below the join by Catalyst.
  - W1 (global-order running sum for gaps-and-islands) preserves the
    reference's RANGE tie semantics WITHOUT its single-partition hazard:
    rows collapse to one per shift_date first, then the two-pass
    range-partitioned prefix sum (operators/windows.py) numbers the
    islands — only the per-partition offsets frame is globally ordered.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import DataFrame, SparkSession, functions as F


def _date_anchor(anchor_date: dt.date | str | None):
    if anchor_date is None:
        return F.current_date()
    return F.to_date(F.lit(str(anchor_date)))


def mean_break_length_in_minutes(breaks: DataFrame) -> DataFrame:
    """A1 — AVG(break_finish - break_start) in minutes, 0 on empty.
    EXTRACT(EPOCH FROM AVG(interval))/60 == AVG(epoch-seconds diff)/60."""
    secs = F.unix_timestamp("break_finish") - F.unix_timestamp("break_start")
    return breaks.agg(
        F.coalesce(F.avg(secs) / 60.0, F.lit(0.0)).alias("kpi_value")
    )


def mean_shift_cost(shifts: DataFrame) -> DataFrame:
    """A2 — AVG(shift_cost), 0 on empty."""
    return shifts.agg(
        F.coalesce(F.avg("shift_cost"), F.lit(0.0)).alias("kpi_value")
    )


def max_allowance_cost_14d(
    allowances: DataFrame, shifts: DataFrame, anchor_date=None
) -> DataFrame:
    """A3+J1+F2 — MAX(allowance_cost) over allowances ⋈ shifts restricted to
    the trailing 14 days. Broadcast the shifts side (FK→PK, dim-sized)."""
    cutoff = F.date_sub(_date_anchor(anchor_date), 14)
    joined = allowances.join(
        F.broadcast(shifts.select("shift_id", "shift_date")), "shift_id", "inner"
    ).where(F.col("shift_date") >= cutoff)
    return joined.agg(
        F.coalesce(F.max("allowance_cost").cast("double"), F.lit(0.0)).alias(
            "kpi_value"
        )
    )


def break_free_islands(shifts: DataFrame, breaks: DataFrame) -> DataFrame:
    """W1+W2+A6 — gaps-and-islands: per island of consecutive break-free
    shift days, its length. Exact reference semantics:

      grp  = SUM(CASE WHEN break_id IS NULL THEN 0 ELSE 1 END)
             OVER (ORDER BY shift_date)           -- default RANGE frame:
                                                  -- ties on shift_date share
                                                  -- one running value
      cnt  = COUNT(*) per grp - (0 if grp = 0 else 1)

    Scale shape: the RANGE frame means tie days share one running value,
    so collapse to ONE row per shift_date first (map-side-combinable
    aggregate carrying (date, flag_sum, n_rows)), then run the two-pass
    range-partitioned prefix sum over the distinct dates — rows of the
    fact table never pass through a single-partition window, and the
    only ordered structure is the per-date frame (days, not shifts).
    Distinct dates being unique, ROWS over them == the RANGE-tie
    semantics over the raw rows."""
    from .windows import scalable_running_sum

    j = shifts.join(breaks, "shift_id", "left").select(
        "shift_date", F.col("break_id")
    )
    flag = F.when(F.col("break_id").isNull(), 0).otherwise(1)
    per_date = j.groupBy("shift_date").agg(
        F.sum(flag).alias("_f"), F.count(F.lit(1)).alias("_n")
    )
    with_grp = scalable_running_sum(
        per_date, "shift_date", "_f", out_col="grp"
    )
    return with_grp.groupBy("grp").agg(
        (
            F.sum("_n")
            - F.when(F.col("grp") == 0, F.lit(0)).otherwise(F.lit(1))
        ).alias("cnt")
    )


def max_break_free_shift_period_in_days(
    shifts: DataFrame, breaks: DataFrame
) -> DataFrame:
    """Q2 top-1 over the islands — ORDER BY cnt DESC LIMIT 1 (Spark executes
    TakeOrderedAndProject: top-k without a full sort)."""
    top = (
        break_free_islands(shifts, breaks)
        .orderBy(F.col("cnt").desc())
        .limit(1)
        .select(F.col("cnt").cast("double").alias("kpi_value"))
    )
    # empty shifts ⇒ no islands row; reference would insert NULL — normalize 0
    return top.agg(F.coalesce(F.max("kpi_value"), F.lit(0.0)).alias("kpi_value"))


def min_shift_length_in_hours(shifts: DataFrame) -> DataFrame:
    """A4 — MIN(epoch(shift_finish - shift_start)/3600), 0 on empty."""
    hours = (
        F.unix_timestamp("shift_finish") - F.unix_timestamp("shift_start")
    ) / 3600.0
    return shifts.agg(F.coalesce(F.min(hours), F.lit(0.0)).alias("kpi_value"))


def total_number_of_paid_breaks(breaks: DataFrame) -> DataFrame:
    """A5+F1 — COUNT(*) WHERE is_paid."""
    return breaks.where(F.col("is_paid")).agg(
        F.count(F.lit(1)).cast("double").alias("kpi_value")
    )


def compute_kpis(
    spark: SparkSession,
    shifts: DataFrame,
    breaks: DataFrame,
    allowances: DataFrame,
    anchor_date: dt.date | str | None = None,
) -> DataFrame:
    """Build the 6-row kpis DataFrame (K3/Q1/Q3).

    Callers should persist shifts/breaks first — Catalyst does not share
    scans across the six sub-aggregates otherwise (SURVEY.md §4).
    """
    parts = {
        "mean_break_length_in_minutes": mean_break_length_in_minutes(breaks),
        "mean_shift_cost": mean_shift_cost(shifts),
        "max_allowance_cost_14d": max_allowance_cost_14d(
            allowances, shifts, anchor_date
        ),
        "max_break_free_shift_period_in_days": max_break_free_shift_period_in_days(
            shifts, breaks
        ),
        "min_shift_length_in_hours": min_shift_length_in_hours(shifts),
        "total_number_of_paid_breaks": total_number_of_paid_breaks(breaks),
    }
    frames = []
    for name, df in parts.items():
        frames.append(
            df.select(
                F.lit(name).alias("kpi_name"),
                _date_anchor(anchor_date).alias("kpi_date"),
                F.col("kpi_value").cast("double").cast("decimal(8,2)").alias("kpi_value"),
            )
        )
    out = frames[0]
    for f in frames[1:]:
        out = out.unionByName(f)
    return out
