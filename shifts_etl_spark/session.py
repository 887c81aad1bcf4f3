"""SparkSession factory.

Pinned UTC session timezone: the reference's ``datetime.fromtimestamp``
(reference etl/app/shift_data_processor.py:120) interprets epoch seconds in
the container's local TZ, which is UTC under docker — pinning UTC makes the
engine deterministic everywhere (SURVEY.md §7.4 pitfall #1).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "shifts_etl_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession tuned for this engine.

    Local mode defaults; on a real cluster the same settings apply except
    master/memory come from the submitter. AQE is on so runtime statistics
    re-plan joins (broadcast conversion, skew splitting, partition coalesce)
    — the scale-out story for 100 TB relies on it.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS") or str(os.cpu_count() or 4)
    master = master or f"local[{cpus}]"
    shuffle = str(shuffle_partitions or max(int(cpus) * 2, 32))
    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", shuffle)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # static conf: keep managed tables (bucketed layouts) out of the cwd
        .config("spark.sql.warehouse.dir", "/tmp/shifts_etl_spark_warehouse")
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
