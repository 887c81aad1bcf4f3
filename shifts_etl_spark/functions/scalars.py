"""Scalar column helpers used by the flatten layer (SURVEY.md §2.9)."""

from __future__ import annotations

from pyspark.sql import Column, functions as F

ColumnOrName = Column | str


def _col(c: ColumnOrName) -> Column:
    return F.col(c) if isinstance(c, str) else c


def epoch_ms_to_ts(c: ColumnOrName) -> Column:
    """Epoch-milliseconds → timestamp with the reference's exact semantics
    (reference etl/app/shift_data_processor.py:117-121):

    - value must be a positive integer, else NULL;
    - milliseconds are floor-truncated to whole seconds (``ts // 1000``) —
      millisecond precision is deliberately dropped;
    - interpreted in the session timezone (pinned UTC by session.get_spark).
    """
    c = _col(c)
    return F.when(
        c.isNotNull() & (c > 0), F.timestamp_seconds(F.floor(c / F.lit(1000)))
    ).otherwise(F.lit(None).cast("timestamp"))


def array_cost_sum(arr: ColumnOrName) -> Column:
    """Fold ``sum(x.cost for x in arr)`` over an array<struct<..., cost:double>>
    without exploding (reference etl/app/shift_data_processor.py:78-82).

    Python's ``sum([]) == 0`` → empty arrays contribute 0.0, not NULL.
    Stays JVM-side (``F.aggregate``), inside whole-stage codegen.
    """
    arr = _col(arr)
    return F.aggregate(arr, F.lit(0.0), lambda acc, x: acc + x["cost"])
