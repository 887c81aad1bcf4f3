"""Range-clustered data layout — write-time ordering that buys read-time
pruning.

At 100 TB, scan cost is dominated by how much parquet a query touches.
Laying files out so each one covers a narrow slice of the filter column
(repartitionByRange → sortWithinPartitions → write) gives every file a
tight min/max footer range, so a range predicate prunes most files via
row-group statistics without any index. This is the plain-parquet cousin
of Delta/Iceberg OPTIMIZE ZORDER for the single-column case; for
multi-column locality, cluster on an interleaved key instead.

`partition_by` adds directory-level (hive-style) partitioning on top —
coarse pruning by directory before footer-level pruning within.
"""

from __future__ import annotations

from pathlib import Path

from pyspark.sql import DataFrame, SparkSession, functions as F


def write_range_clustered(
    df: DataFrame,
    path: str,
    cluster_col: str,
    num_files: int = 8,
    partition_by: list[str] | None = None,
) -> None:
    """repartitionByRange assigns each output file a contiguous range of
    ``cluster_col`` (sampled range boundaries → balanced files even under
    skew); sortWithinPartitions orders rows inside each file so parquet
    page-level stats are tight too."""
    out = (
        df.repartitionByRange(num_files, F.col(cluster_col))
        .sortWithinPartitions(cluster_col)
        .write.mode("overwrite")
    )
    if partition_by:
        out = out.partitionBy(*partition_by)
    out.parquet(path)


def file_ranges(spark: SparkSession, path: str, col: str) -> list[tuple]:
    """(file, min, max) per data file — the footer stats a range filter
    prunes on. Reads each file's column min/max with a per-file aggregate
    (test/ops helper; at scale you'd read footers, not data)."""
    rows = []
    for f in sorted(Path(path).rglob("*.parquet")):
        r = (
            spark.read.parquet(str(f))
            .agg(F.min(col).alias("lo"), F.max(col).alias("hi"))
            .first()
        )
        rows.append((f.name, r["lo"], r["hi"]))
    return rows
