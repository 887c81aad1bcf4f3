"""Bucketed table layout — the shuffle-free co-located join path.

At 100 TB the dominant cost of a fact-fact equi join is shuffling both
sides. Writing both tables bucketed (and sorted) on the join key moves that
shuffle to write time, once, instead of per query: Spark then plans a
SortMergeJoin with NO Exchange on either side (asserted in tests).

This is the layout the staged sink would adopt for fact tables; kept
separate because bucketing requires the session catalog (saveAsTable), not
plain parquet paths.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    num_buckets: int = 16,
    sort_cols: list[str] | None = None,
) -> None:
    writer = df.write.mode("overwrite").format("parquet").bucketBy(
        num_buckets, *bucket_cols
    )
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, key: str, how: str = "inner"
) -> DataFrame:
    """Join two same-bucketed tables on their bucket key. With matching
    bucket specs Catalyst elides both Exchanges (verify via .explain)."""
    l = spark.table(left_table)
    r = spark.table(right_table)
    return l.join(r, key, how)
