"""Data reconciliation — snapshot diff and table checksums.

The cross-system audit primitives a production pipeline runs after every
backfill or migration (the batch analog of Delta's change-data-feed and
the classic warehouse "table checksum" reconciliation):

  - ``snapshot_diff``: per-PK added / removed / changed classification
    between two versions of a table. One hash join on the PK; the change
    test compares an md5 row fingerprint computed map-side, so wide rows
    never shuffle — only (pk, fingerprint) pairs do.
  - ``table_checksum``: one order- and partition-independent checksum per
    table (BIT_XOR of per-row 48-bit md5 folds + exact row count). Two
    tables are equal-content iff counts and checksums agree (up to md5
    collisions and xor's blindness to even-multiplicity rows — moot when
    the fingerprint includes a PK); costs one scan + a 1-row aggregate,
    so comparing a 100 TB table across engines moves 16 bytes. XOR, not
    SUM: a sum of 48-bit folds overflows a bigint past ~2^15 rows per
    2^48, i.e. already at ~10^5 rows, while xor never can.

Both fingerprints use the md5 family (dedup._md5_hash48), so DuckDB
reproduces them bit-for-bit and the driver oracle-checks end to end.
Fingerprint inputs are canonicalized as '\\x1f'-joined string casts —
callers pick columns whose string forms are engine-stable (ints, strings,
dates, decimals; raw doubles belong in rounded form).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .dedup import _md5_hash48


def _fingerprint(cols: list[str]):
    return _md5_hash48(
        F.concat_ws("\x1f", *[F.col(c).cast("string") for c in cols]), "row"
    )


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    pk_cols: list[str],
    compare_cols: list[str],
) -> DataFrame:
    """(pk..., status) for every PK present in either snapshot where the
    snapshots disagree: 'added' (new only), 'removed' (old only), or
    'changed' (both, differing fingerprint over ``compare_cols``).
    Unchanged rows are dropped — the diff is sized by the CHANGE volume,
    not the table."""
    o = old.select(*pk_cols, _fingerprint(compare_cols).alias("_fp_old"))
    n = new.select(*pk_cols, _fingerprint(compare_cols).alias("_fp_new"))
    joined = o.join(n, pk_cols, "full_outer")
    status = (
        F.when(F.col("_fp_old").isNull(), F.lit("added"))
        .when(F.col("_fp_new").isNull(), F.lit("removed"))
        .when(F.col("_fp_old") != F.col("_fp_new"), F.lit("changed"))
    )
    return (
        joined.withColumn("status", status)
        .where(F.col("status").isNotNull())
        .select(*pk_cols, "status")
    )


def table_checksum(df: DataFrame, cols: list[str]) -> DataFrame:
    """One row (n_rows, checksum): exact count + BIT_XOR of per-row
    48-bit md5 folds. Commutative/associative, hence partition- and
    order-independent and map-side combinable, at any row count."""
    return df.select(_fingerprint(cols).alias("_fp")).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.expr("bit_xor(_fp)").alias("checksum"),
    )
