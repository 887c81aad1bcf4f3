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
