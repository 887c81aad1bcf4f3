"""Stream-stream join — attribute purchases to the preceding view of the
same user, both sides unbounded streams.

Structured Streaming requirements baked in: watermarks on BOTH sides plus a
time-bound join condition, so state for each side is dropped once the
watermark passes the bound (state size ∝ arrival rate × window, not
history). This is the streaming twin of the batch banded range join
(operators/joins.py) and the as-of join (operators/asof.py).
"""

from __future__ import annotations

from pathlib import Path

from pyspark.sql import DataFrame, SparkSession, functions as F

EVENT_DDL = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)


def attribute_purchases(
    views: DataFrame,
    purchases: DataFrame,
    window_minutes: int = 10,
    how: str = "inner",
) -> DataFrame:
    """purchases ⋈ views on user within the trailing attribution window.
    Inner join: purchase rows emit once a qualifying view arrives (or are
    dropped when the watermark closes their window). ``how="left_outer"``
    additionally emits NULL-padded purchase rows — but only once the
    view-side watermark proves no qualifying view can still arrive, which
    is why outer results trail the watermark delay (asserted in tests)."""
    v = views.select(
        F.col("user_id").alias("v_user"),
        F.col("ts").alias("view_ts"),
        F.col("value").alias("view_value"),
    ).withWatermark("view_ts", "1 hour")
    p = purchases.select(
        F.col("user_id").alias("p_user"),
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("purchase_ts"),
    ).withWatermark("purchase_ts", "1 hour")
    cond = (
        (F.col("p_user") == F.col("v_user"))
        & (F.col("view_ts") <= F.col("purchase_ts"))
        & (
            F.col("view_ts")
            >= F.col("purchase_ts") - F.make_interval(mins=F.lit(window_minutes))
        )
    )
    return p.join(v, cond, how).select(
        "purchase_id",
        F.col("p_user").alias("user_id"),
        "purchase_ts",
        "view_ts",
        "view_value",
    )


def run_purchase_attribution(
    spark: SparkSession,
    input_dir: str | Path,
    checkpoint_dir: str | Path,
    window_minutes: int = 10,
    query_name: str = "attributed",
    how: str = "inner",
):
    """File-drop → split into two typed streams → stream-stream join →
    memory sink (availableNow drain for tests). One file per micro-batch
    so the watermark advances BETWEEN files — outer-join null emission
    needs a later batch's watermark to close earlier windows."""
    events = (
        spark.readStream.schema(EVENT_DDL)
        .option("maxFilesPerTrigger", 1)
        .json(str(input_dir))
    )
    views = events.where(F.col("event_type") == "view")
    purchases = events.where(F.col("event_type") == "purchase")
    joined = attribute_purchases(views, purchases, window_minutes, how)
    return (
        joined.writeStream.outputMode("append")
        .format("memory")
        .queryName(query_name)
        .option("checkpointLocation", str(checkpoint_dir))
        .trigger(availableNow=True)
        .start()
    )
