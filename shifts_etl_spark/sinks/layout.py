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
    prunes on. One distributed job: group by input_file_name() (at scale
    you'd read footers, not data; this is the write-time manifest pass)."""
    rows = (
        spark.read.parquet(path)
        .groupBy(F.input_file_name().alias("f"))
        .agg(F.min(col).alias("lo"), F.max(col).alias("hi"))
        .collect()
    )
    return sorted((Path(r["f"]).name, r["lo"], r["hi"]) for r in rows)


def write_manifest(spark: SparkSession, path: str, col: str) -> None:
    """Persist (file, min, max) for ``col`` as ``_manifest_<col>.json``
    next to the data — computed once at write time, consulted by
    ``read_range_pruned`` forever after (the poor-man's table-format
    file index)."""
    import json

    manifest = [
        {"file": f, "lo": lo, "hi": hi}
        for f, lo, hi in file_ranges(spark, path, col)
    ]
    (Path(path) / f"_manifest_{col}.json").write_text(json.dumps(manifest, default=str))


def read_range_pruned(
    spark: SparkSession,
    path: str,
    col: str,
    lo=None,
    hi=None,
) -> DataFrame:
    """Manifest-driven file-skipping read: open only files whose
    [min, max] intersects [lo, hi], then apply the residual row filter.
    Identical rows to a full scan + filter; the scan just never touches
    pruned files (returns are asserted equivalent in tests). Falls back
    to a full scan when no manifest exists. Bounds must be numeric or
    string (the JSON manifest stores other types — timestamps — as
    strings; pass the ISO string form to prune on those)."""
    import json

    mpath = Path(path) / f"_manifest_{col}.json"
    pred = None
    if lo is not None:
        pred = F.col(col) >= lo
    if hi is not None:
        p2 = F.col(col) <= hi
        pred = p2 if pred is None else pred & p2
    if not mpath.exists():
        full = spark.read.parquet(path)
        return full.where(pred) if pred is not None else full
    manifest = json.loads(mpath.read_text())
    schema = spark.read.parquet(path).schema
    keep = []
    for e in manifest:
        e_lo, e_hi = e["lo"], e["hi"]
        if lo is not None and type(lo)(e_hi) < lo:
            continue
        if hi is not None and type(hi)(e_lo) > hi:
            continue
        keep.append(str(Path(path) / e["file"]))
    if not keep:
        return spark.createDataFrame([], schema)
    out = spark.read.schema(schema).parquet(*keep)
    return out.where(pred) if pred is not None else out


def _quantile_bucket(df: DataFrame, col: str, bits: int) -> "F.Column":
    """Equi-depth bucket id in [0, 2^bits): count of quantile boundaries
    ≤ value, folded JVM-side over a literal boundary array. Quantile (not
    min/max) bins keep buckets balanced under skew, which is what makes
    the z-curve's file bounding boxes tight."""
    n = (1 << bits) - 1
    probs = [(i + 1) / (n + 1) for i in range(n)]
    bounds = df.approxQuantile(col, probs, 0.001)
    bucket = F.aggregate(
        F.lit(bounds),
        F.lit(0),
        lambda acc, b: acc + F.when(F.col(col) >= b, 1).otherwise(0),
    )
    return F.least(bucket, F.lit(n)).cast("long")


def z_value_n(buckets: list, bits: int = 8):
    """Interleave N bucket ids bit-by-bit (N-dimensional Morton code):
    bit ``i`` of column ``j`` lands at position ``i*N + (N-1-j)``, so
    high-order bits of every dimension dominate the curve equally.
    JVM-side shift/mask chain, ~2·N·bits ops per row, write-time only.
    ``N * bits`` must fit a signed long (≤ 63)."""
    n = len(buckets)
    if n * bits > 63:
        raise ValueError(f"{n} cols x {bits} bits exceeds a 63-bit z-value")
    z = F.lit(0).cast("long")
    for i in range(bits):
        for j, b in enumerate(buckets):
            z = z.bitwiseOR(
                F.shiftleft(
                    F.shiftrightunsigned(b, i).bitwiseAND(F.lit(1)),
                    i * n + (n - 1 - j),
                )
            )
    return z


def z_value(b1, b2, bits: int = 8):
    """Two-column Morton code (kept for call-site compatibility)."""
    return z_value_n([b1, b2], bits)


def write_z_ordered(
    df: DataFrame,
    path: str,
    *cols: str,
    num_files: int = 16,
    bits: int = 8,
) -> None:
    """N-column locality layout: range-cluster files along the Morton
    curve of the columns' equi-depth buckets. Each file then covers a
    small bounding box in EVERY dimension, so predicates on any subset of
    the columns prune most files from footer stats — the plain-parquet
    analog of Delta/Iceberg OPTIMIZE ZORDER. Costs one approxQuantile
    pass per column + the clustering shuffle, all at write time.

    Pruning power per dimension dilutes as columns are added (each file's
    per-dimension extent grows as selectivity^(1/N)) — 2-4 columns is the
    useful range, same guidance Delta ships for ZORDER BY."""
    if len(cols) < 1:
        raise ValueError("write_z_ordered needs at least one cluster column")
    z = z_value_n([_quantile_bucket(df, c, bits) for c in cols], bits)
    (
        df.withColumn("_z", z)
        .repartitionByRange(num_files, F.col("_z"))
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode("overwrite")
        .parquet(path)
    )
