"""Schema evolution across ingestion batches — long-lived pipelines add
columns over time (the reference's API could add a field to shift docs any
day), and a 100 TB corpus is never rewritten to catch up.

Two composable tools:
  - ``read_evolving_parquet``: footer-merged read over batches written
    with different (compatible) schemas; older files surface NULL for
    columns they predate. mergeSchema costs one footer read per file at
    planning time — fine for batch counts, use a table format's schema
    registry beyond that.
  - ``union_evolving``: align already-loaded DataFrames by column NAME
    (position is meaningless across schema versions), filling gaps with
    NULL. This is the in-memory half of the same contract.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, SparkSession


def read_evolving_parquet(spark: SparkSession, *paths: str) -> DataFrame:
    """One DataFrame over parquet batches with evolving schemas: the union
    of all columns, NULL where a file predates a column. Requires
    type-compatible columns (same name ⇒ same type or widening)."""
    return spark.read.option("mergeSchema", "true").parquet(*paths)


def union_evolving(dfs: list[DataFrame]) -> DataFrame:
    """unionByName with allowMissingColumns over every frame — schema =
    union of all columns, rows aligned by name."""
    return reduce(
        lambda a, b: a.unionByName(b, allowMissingColumns=True), dfs
    )
