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


def order_total_audit(
    orders: DataFrame,
    lineitem: DataFrame,
    buckets: tuple[float, ...] = (0.0, 0.0001, 0.01, 0.05),
) -> DataFrame:
    """Denormalization-consistency audit: recompute each order's total
    from its line items (sum of extendedprice * (1-discount) * (1+tax),
    rounded to cents) and band the relative error against the stored
    o_totalprice — the referential-integrity check a warehouse runs
    after every load (a drifting band distribution means a broken
    loader, not a broken query). One row per error band: order count,
    share, and the band's min/max relative error.

    Scale shape: the recompute is one map-side-combinable groupBy on
    l_orderkey; the compare joins two orderkey-keyed frames (co-
    partitioned hash join); the band rollup lands on |buckets|+1 cells.
    Line sums round to 2 dp before comparing so partial-sum order cannot
    move an order across a band edge."""
    li = lineitem.groupBy(F.col("l_orderkey").alias("o_orderkey")).agg(
        F.round(
            F.sum(
                F.col("l_extendedprice")
                * (F.lit(1.0) - F.col("l_discount"))
                * (F.lit(1.0) + F.col("l_tax"))
            ),
            2,
        ).alias("li_total")
    )
    joined = orders.select("o_orderkey", "o_totalprice").join(
        li, "o_orderkey"
    )
    rel = F.round(
        F.abs(F.col("li_total") - F.col("o_totalprice"))
        / F.col("o_totalprice"),
        6,
    )
    band = F.when(rel <= buckets[0], 0)
    for i, b in enumerate(buckets[1:], start=1):
        band = band.when(rel <= b, i)
    band = band.otherwise(len(buckets))
    scored = joined.select(rel.alias("rel_err"), band.alias("err_band"))
    out = scored.groupBy("err_band").agg(
        F.count(F.lit(1)).cast("long").alias("n_orders"),
        F.round(F.min("rel_err"), 6).alias("min_rel_err"),
        F.round(F.max("rel_err"), 6).alias("max_rel_err"),
    )
    total = out.agg(F.sum("n_orders").cast("long").alias("n_total"))
    return out.crossJoin(F.broadcast(total)).select(
        "err_band",
        "n_orders",
        F.round(F.col("n_orders").cast("double") / F.col("n_total"), 6).alias(
            "share"
        ),
        "min_rel_err",
        "max_rel_err",
    )
