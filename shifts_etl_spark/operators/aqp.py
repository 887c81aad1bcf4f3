"""Approximate query processing — sampled aggregates with error bars.

The interactive-analytics shape for 100 TB (BlinkDB lineage: sample-based
approximate aggregation with bounded errors): scan a p-fraction Bernoulli
sample, scale estimates by Horvitz-Thompson inverse-probability weights,
and attach a CLT standard error so the consumer knows how wrong the
number can be. A 1% sample turns a 100 TB scan into 1 TB while keeping
grouped totals within ~1/sqrt(n_sampled_per_group) relative error — the
right first query before paying for the exact run (whose plan is
unchanged: drop the sample, keep the aggregate).

Estimators (Bernoulli sampling with inclusion prob p):
  total:  T̂ = Σ_{i∈S} v_i / p          (unbiased HT estimator)
  count:  N̂ = n_S / p
  var:    Var(T̂) = (1-p)/p² · Σ_S v_i²  (per-unit inclusion independence;
          Σ_S v_i²/p estimates Σ v_i², one extra factor 1/p scales the
          (1-p)/p per-row variance)
  se_total = sqrt of that; 95% CI = ±1.96·se.

All one map-side-combinable aggregate over the sample scan — the sample
predicate is pushed into the scan stage (no materialized sample table),
and the shuffle carries one partial row per (group, task).

Sampling methods:
  "builtin" (default): df.sample — seed-deterministic per partition
  split, stable for a fixed input layout but NOT SQL-reproducible in
  another engine (the x63 catalog entry is rows-only for this reason).
  "md5": hash-Bernoulli on ``sample_key`` — include a row iff
  (md5-fold(key # aqp<seed>) + 1) / 2^48 <= fraction. Every u is a
  dyadic rational, so the inclusion set is bit-identical in ANY engine
  (the x24-split idea at 48-bit granularity) AND stable under
  repartition/relayout — the property that lets a 100 TB pipeline
  re-derive the exact same sample months later. ~2× slower per row than
  the built-in sampler (md5 vs xorshift), which is why it is the
  oracle-checked entry (x245) rather than the default.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

_TWO_48 = float(2**48)


def approx_groupby_sum(
    df: DataFrame,
    keys: list[str],
    value_col: str,
    fraction: float = 0.1,
    seed: int = 42,
    method: str = "builtin",
    sample_key: str | None = None,
) -> DataFrame:
    """Grouped approximate SUM/COUNT with standard errors from one
    p-fraction sample pass. ``method`` picks the sampler (see module
    docstring); "md5" requires ``sample_key``, a column whose distinct
    values identify rows (the hash is over the key, so duplicate keys
    sample together — exactly what consistent sampling wants)."""
    if not 0 < fraction <= 1:
        raise ValueError("fraction must be in (0, 1]")
    p = float(fraction)
    if method == "md5":
        if sample_key is None:
            raise ValueError("method='md5' requires sample_key")
        from .dedup import _md5_hash48

        u = (
            _md5_hash48(F.col(sample_key).cast("string"), f"aqp{seed}").cast(
                "double"
            )
            + 1.0
        ) / _TWO_48
        s = df.where(u <= F.lit(p))
    elif method == "builtin":
        s = df.sample(fraction=p, seed=seed)
    else:
        raise ValueError(f"unknown method: {method}")
    v = F.col(value_col).cast("double")
    agg = s.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("n_sampled"),
        F.sum(v).alias("_sum_v"),
        F.sum(v * v).alias("_sum_v2"),
    )
    se_total = F.sqrt(F.col("_sum_v2") * (1.0 - p) / (p * p))
    return agg.select(
        *keys,
        "n_sampled",
        (F.col("n_sampled") / p).cast("double").alias("est_count"),
        (F.col("_sum_v") / p).alias("est_total"),
        se_total.alias("se_total"),
        (F.col("_sum_v") / p - 1.96 * se_total).alias("ci95_lo"),
        (F.col("_sum_v") / p + 1.96 * se_total).alias("ci95_hi"),
    )
