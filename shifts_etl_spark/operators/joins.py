"""Join strategy helpers beyond Catalyst's defaults.

`banded_range_join` is the bounded-band range join: Spark plans
`a.key = b.key AND b.ts ∈ (a.ts, a.ts + W]` as an equi join on key with a
post-filter, so the intermediate size is Σ per-key-group², regardless of W.
Binning by the band width turns the time bound into part of the join key:

  - left rows are replicated into time bins {bin(ts), bin(ts)+1}
  - right rows carry bin(ts)
  - join on (key, bin) + exact band filter

Any qualifying pair has bin_b − bin_a ∈ {0, 1}, so every pair is produced
EXACTLY once (a given pair joins only at b's bin) — no dedup pass. The
intermediate is Σ per-(key, bin)², bounded by the band width instead of the
whole key group: the difference between an hour-long hot user exploding
quadratically and staying linear.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def banded_range_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    band_seconds: int,
    left_ts: str = "ts",
    right_ts: str = "ts",
) -> DataFrame:
    """Pairs (l, r) with l.key = r.key and r.ts ∈ (l.ts, l.ts + band].
    Returns left columns + right columns (right's ts column suffixed _r if
    names collide)."""
    rename_r = {c: f"{c}_r" for c in right.columns if c in left.columns and c != key}
    r = right.withColumnsRenamed(rename_r)
    r_ts = rename_r.get(right_ts, right_ts)

    bin_l = F.floor(F.col(left_ts).cast("double") / band_seconds)
    bin_r = F.floor(F.col(r_ts).cast("double") / band_seconds)

    l_binned = left.withColumn("_bin", F.explode(F.array(bin_l, bin_l + 1)))
    r_binned = r.withColumn("_bin", bin_r)

    band: Column = (F.col(r_ts) > F.col(left_ts)) & (
        F.col(r_ts) <= F.col(left_ts) + F.make_interval(secs=F.lit(band_seconds))
    )
    return l_binned.join(r_binned, [key, "_bin"]).where(band).drop("_bin")


def interval_overlap_pairs(
    df: DataFrame,
    key: str,
    id_col: str,
    start_col: str,
    end_col: str,
    bucket_seconds: int = 3600,
) -> DataFrame:
    """Self interval-overlap join: all pairs (a, b) with a.key = b.key,
    a.id < b.id and [a.start, a.end] ∩ [b.start, b.end] ≠ ∅ (closed
    intervals, integer seconds).

    The two-sided generalization of `banded_range_join` for VARIABLE-length
    intervals: each interval is replicated into every coarse time bucket it
    spans, the join key becomes (key, bucket), and a pair is emitted ONLY in
    the bucket containing max(a.start, b.start) — the first bucket where
    both are live — so every overlapping pair appears exactly once with no
    dedup shuffle. Intermediate size is Σ per-(key, bucket)² instead of
    Σ per-key² — the property that keeps a long-lived hot key from going
    quadratic at 100 TB. Replication factor per row is
    ceil(length / bucket_seconds) + 1; pick bucket_seconds near the typical
    interval length.

    Returns (key, a_id, b_id, overlap_s).
    """
    spanned = df.select(
        F.col(key).alias("k"),
        F.col(id_col).alias("i"),
        F.col(start_col).cast("long").alias("s"),
        F.greatest(F.col(end_col).cast("long"), F.col(start_col).cast("long")).alias("e"),
    ).withColumn(
        "bkt",
        F.explode(
            F.sequence(
                F.floor(F.col("s") / bucket_seconds),
                F.floor(F.col("e") / bucket_seconds),
            )
        ),
    )
    a = spanned.select(
        F.col("k"), F.col("bkt"),
        F.col("i").alias("a_id"), F.col("s").alias("a_s"), F.col("e").alias("a_e"),
    )
    b = spanned.select(
        F.col("k"), F.col("bkt"),
        F.col("i").alias("b_id"), F.col("s").alias("b_s"), F.col("e").alias("b_e"),
    )
    first_live = F.floor(F.greatest("a_s", "b_s") / bucket_seconds)
    return (
        a.join(b, ["k", "bkt"])
        .where(
            (F.col("a_id") < F.col("b_id"))
            & (F.col("a_s") <= F.col("b_e"))
            & (F.col("b_s") <= F.col("a_e"))
            & (first_live == F.col("bkt"))
        )
        .select(
            F.col("k").alias(key),
            "a_id",
            "b_id",
            (F.least("a_e", "b_e") - F.greatest("a_s", "b_s")).alias("overlap_s"),
        )
    )
