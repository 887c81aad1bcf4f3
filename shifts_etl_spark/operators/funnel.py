"""Product-analytics operators over the events stream: weekly cohort
retention and ordered funnel conversion — the two rollups every
large-scale event pipeline ships (and classic OLAP benchmarks model).

Extension ops beyond the reference surface (reference has no event
analytics; its query style is the KPI aggregate family,
etl/app/shift_data_processor.py:225-279). Both are pure built-in
expression pipelines: no Python in the hot path, every shuffle keyed and
map-side combinable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def cohort_retention(
    events: DataFrame,
    ts_col: str = "ts",
    user_col: str = "user_id",
) -> DataFrame:
    """Weekly cohort retention matrix: users are cohorted by the calendar
    week (ISO Monday truncation) of their first event; for every
    (cohort_week, week_offset) cell, how many cohort members were active
    that many calendar weeks later, and what fraction of the cohort that
    is. Offset 0 always holds the full cohort (a user's first event is in
    their cohort week), so ``retention`` starts at 1.0 and decays.

    Week offsets are calendar-week differences (datediff of the two
    Monday truncations / 7), not rolling 7-day buckets — exact integer
    date arithmetic that both Spark and DuckDB compute identically, with
    no epoch-precision wobble.

    Scale shape: the first-event time comes from a per-user window min
    (ONE shuffle keyed on user, no self-join); the activity matrix is a
    distinct over (cohort, offset, user) — map-side combinable, carrying
    (date, long, long) rows only; cohort sizes are the offset-0 slice of
    the same counts, broadcast back onto the |weeks|^2-row cell table.
    Nothing row-sized survives past the distinct."""
    w = Window.partitionBy(user_col)
    cohorted = events.select(
        F.col(user_col).alias("user_id"),
        F.date_trunc("week", F.col(ts_col)).cast("date").alias("event_week"),
        F.date_trunc("week", F.min(ts_col).over(w))
        .cast("date")
        .alias("cohort_week"),
    )
    active = cohorted.select(
        "cohort_week",
        (F.datediff("event_week", "cohort_week") / 7)
        .cast("long")
        .alias("week_offset"),
        "user_id",
    ).distinct()
    counts = active.groupBy("cohort_week", "week_offset").agg(
        F.count(F.lit(1)).cast("long").alias("n_active")
    )
    sizes = counts.where(F.col("week_offset") == 0).select(
        "cohort_week", F.col("n_active").alias("cohort_size")
    )
    return counts.join(F.broadcast(sizes), "cohort_week").select(
        "cohort_week",
        "week_offset",
        "n_active",
        "cohort_size",
        F.round(
            F.col("n_active").cast("double") / F.col("cohort_size"), 6
        ).alias("retention"),
    )


def funnel_conversion(
    events: DataFrame,
    steps: tuple[str, ...] = ("view", "click", "purchase"),
    ts_col: str = "ts",
    user_col: str = "user_id",
    type_col: str = "event_type",
) -> DataFrame:
    """Ordered funnel: a user reaches step i+1 only with an event of that
    type STRICTLY AFTER their step-i reach time (earliest valid time is
    kept at every step, which maximizes downstream reach). One row per
    step: users reaching it, conversion from the top of the funnel, and
    conversion from the previous step (step 1 pins both at 1.0 of
    itself).

    Scale shape: step i is one filtered scan of that event type joined
    to the current |users|-row reach frame on user (hash join, keyed
    shuffle) and re-minimized — k-1 bounded passes for a k-step funnel,
    never a per-user sort of full histories. The final conversions run
    on the k-row summary via a k-row window (sanctioned single-partition
    shape)."""
    reach = (
        events.where(F.col(type_col) == steps[0])
        .groupBy(F.col(user_col).alias("user_id"))
        .agg(F.min(ts_col).alias("t"))
    )
    summaries = [
        reach.agg(
            F.lit(1).alias("step_idx"),
            F.lit(steps[0]).alias("step"),
            F.count(F.lit(1)).cast("long").alias("n_users"),
        )
    ]
    for i, s in enumerate(steps[1:], start=2):
        nxt = (
            events.where(F.col(type_col) == s)
            .select(F.col(user_col).alias("user_id"), F.col(ts_col).alias("ts2"))
            .join(reach, "user_id")
            .where(F.col("ts2") > F.col("t"))
            .groupBy("user_id")
            .agg(F.min("ts2").alias("t"))
        )
        summaries.append(
            nxt.agg(
                F.lit(i).alias("step_idx"),
                F.lit(s).alias("step"),
                F.count(F.lit(1)).cast("long").alias("n_users"),
            )
        )
        reach = nxt
    out = summaries[0]
    for s in summaries[1:]:
        out = out.unionByName(s)
    w = Window.orderBy("step_idx")
    top = F.first("n_users").over(
        Window.orderBy("step_idx").rowsBetween(
            Window.unboundedPreceding, Window.unboundedFollowing
        )
    )
    prev = F.lag("n_users").over(w)
    return out.select(
        "step_idx",
        "step",
        "n_users",
        F.round(F.col("n_users").cast("double") / top, 6).alias("conv_from_top"),
        F.round(
            F.col("n_users").cast("double") / F.coalesce(prev, F.col("n_users")),
            6,
        ).alias("conv_from_prev"),
    )
