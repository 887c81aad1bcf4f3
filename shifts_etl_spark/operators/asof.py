"""As-of join — for each left row, the most recent right row with
right.ts <= left.ts, per key. Spark has no native ASOF JOIN (DuckDB/kdb do);
this is the scalable union-and-carry-forward formulation:

  1. union both sides tagged (right rows carry their payload, left rows
     NULL payload);
  2. one window per key ordered by (ts, side) computes last_value(payload,
     ignoreNulls) over UNBOUNDED PRECEDING..CURRENT ROW — i.e. the payload
     carried forward from the latest right row at-or-before each event;
  3. keep the left rows.

Cost: ONE shuffle on the key (same as any equi join) + a per-key sort —
never the range cross-product a naive theta join would build. Right rows at
exactly left.ts are included (sort places side=0 right rows first).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    ts_col: str = "ts",
    payload_cols: list[str] | None = None,
    direction: str = "backward",
) -> DataFrame:
    """Inner as-of join: left rows paired with the nearest right row
    at-or-before (backward) / at-or-after (forward) their timestamp.

    Returns left columns + ``asof_ts`` + the right payload columns.
    Left rows with no matching right row are dropped (inner semantics).
    """
    if payload_cols is None:
        payload_cols = [c for c in right.columns if c not in (key, ts_col)]
    if direction not in ("backward", "forward"):
        raise ValueError("direction must be 'backward' or 'forward'")

    l_tag = left.select(
        F.col(key),
        F.col(ts_col).alias("_ts"),
        F.lit(1).alias("_side"),
        F.struct(*[F.col(c) for c in left.columns]).alias("_l"),
        F.lit(None).cast(
            right.select(
                F.struct(F.col(ts_col).alias("asof_ts"), *payload_cols).alias("s")
            ).schema["s"].dataType
        ).alias("_r"),
    )
    r_tag = right.select(
        F.col(key),
        F.col(ts_col).alias("_ts"),
        F.lit(0).alias("_side"),
        F.lit(None).cast(
            left.select(F.struct(*[F.col(c) for c in left.columns]).alias("s"))
            .schema["s"]
            .dataType
        ).alias("_l"),
        F.struct(F.col(ts_col).alias("asof_ts"), *payload_cols).alias("_r"),
    )
    unioned = l_tag.unionByName(r_tag)

    if direction == "backward":
        w = (
            Window.partitionBy(key)
            .orderBy(F.col("_ts").asc(), F.col("_side").asc())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
    else:
        w = (
            Window.partitionBy(key)
            .orderBy(F.col("_ts").desc(), F.col("_side").asc())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
    carried = unioned.withColumn("_match", F.last("_r", ignorenulls=True).over(w))

    out = carried.where((F.col("_side") == 1) & F.col("_match").isNotNull())
    return out.select("_l.*", "_match.*")


def point_in_time_join(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    ts_col: str,
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
) -> DataFrame:
    """Join each fact row to the dimension VERSION valid at its event
    time: equal key and ``valid_from <= ts < valid_to`` (NULL valid_to =
    open interval). The consumer side of an SCD2 build
    (merge.scd2_from_changelog): reproduce any report as-of the state
    the world was in when each fact happened.

    Scale shape — the j6 discipline: the KEY is the shuffle/join
    criterion, the validity interval is a post-filter, so cost is
    per-key fact×versions, never a global range join; version counts
    per key are bounded by that key's change history. Facts before the
    first version drop out (inner semantics) — the caller left-joins if
    unmatched facts must survive.
    """
    t = F.col(ts_col)
    return fact.join(dim, key).where(
        (t >= F.col(valid_from))
        & (F.col(valid_to).isNull() | (t < F.col(valid_to)))
    )
