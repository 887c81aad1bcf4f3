"""Skew-mitigation helpers for hot-key joins and aggregations.

AQE's skew-join splitting (on in session.py) handles sort-merge skew at
runtime; salting is the explicit fallback for (a) hot-key aggregations and
(b) joins where one side must be replicated. At 100 TB a single hot user /
null-key burst can hold a stage at 1 running task — these helpers make the
mitigation a one-call pattern instead of ad-hoc plumbing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def salted_aggregate(
    df: DataFrame,
    key_cols: list[str],
    agg_exprs: dict[str, str],
    salt_buckets: int = 16,
) -> DataFrame:
    """Two-phase aggregation for skewed group keys: aggregate on
    (key, salt) first — spreading each hot key over ``salt_buckets``
    reducers — then combine partials per key. Supports algebraic aggregates
    (sum/count/min/max); avg = sum/count downstream.

    agg_exprs: {output_col: "sum(col)" | "count(*)" | "min(col)" | ...}
    """
    salted = df.withColumn(
        "_salt", (F.rand(seed=42) * salt_buckets).cast("int")
    )
    partial_aggs, final_aggs = [], []
    for out, expr in agg_exprs.items():
        fn, _, col = expr.partition("(")
        col = col.rstrip(")")
        fn = fn.lower()
        if fn == "count":
            partial_aggs.append(F.count(F.lit(1) if col == "*" else col).alias(out))
            final_aggs.append(F.sum(out).cast("long").alias(out))
        elif fn == "sum":
            partial_aggs.append(F.sum(col).alias(out))
            final_aggs.append(F.sum(out).alias(out))
        elif fn == "min":
            partial_aggs.append(F.min(col).alias(out))
            final_aggs.append(F.min(out).alias(out))
        elif fn == "max":
            partial_aggs.append(F.max(col).alias(out))
            final_aggs.append(F.max(out).alias(out))
        else:
            raise ValueError(f"non-algebraic aggregate {expr!r}")
    partial = salted.groupBy(*key_cols, "_salt").agg(*partial_aggs)
    return partial.groupBy(*key_cols).agg(*final_aggs)


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    how: str = "inner",
    salt_buckets: int = 16,
) -> DataFrame:
    """Skewed equi join: salt the big side randomly, replicate the small
    side across all salt buckets (explode), join on (key, salt). Shuffle
    spreads each hot key over ``salt_buckets`` tasks at the cost of
    replicating the small side ``salt_buckets``×."""
    big_s = big.withColumn("_salt", (F.rand(seed=42) * salt_buckets).cast("int"))
    small_s = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1)))
    )
    return big_s.join(small_s, [key, "_salt"], how).drop("_salt")
