"""Heavy hitters at corpus scale: Misra-Gries summaries per partition,
merged, then verified with an exact recount of the candidates only.

Why a sketch when groupBy-count is exact: a 100 TB corpus's token/URL/
user-agent domain can be billions of distinct keys — a full groupBy
shuffles the whole key space to find the handful above threshold. The
MG pass bounds per-partition state at k counters and ships ≤ k rows per
partition; the exact pass then counts ONLY the candidates (a semi-join
restricted aggregation), so the wide shuffle never materializes the
long tail.

Guarantee (mergeable summaries, Agarwal et al. PODS'12): an MG(k)
summary underestimates any item by at most n_partition/(k+1); summing
per-partition estimates keeps every item with global count > N/(k+1)
present in the candidate set — no false negatives — and the exact
recount removes all false positives. Output is therefore EXACTLY the
items with count >= threshold, independent of partitioning, which is
what makes the operator oracle-checkable despite the sketch inside.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F

MG_SCHEMA = "item string, est long"


def _mg_partition(batches: Iterator[pd.DataFrame], col: str, k: int):
    """One MG(k) summary for this partition: merge each Arrow batch's
    vectorized value_counts into the running counters, then prune by
    subtracting the (k+1)-th largest count (the batched form of the
    classic decrement step — same invariant, no per-row Python loop)."""
    counters = pd.Series(dtype="int64")
    for pdf in batches:
        vc = pdf[col].dropna().value_counts()
        if vc.empty:
            continue
        counters = counters.add(vc, fill_value=0).astype("int64")
        if len(counters) > k:
            cut = counters.nlargest(k + 1).iloc[-1]
            counters = counters[counters > cut].sub(cut)
    if len(counters):
        yield pd.DataFrame({"item": counters.index.astype(str), "est": counters.values})


def heavy_hitters(
    df: DataFrame,
    col: str,
    k: int = 200,
    min_frac: float = 0.01,
) -> DataFrame:
    """All values of ``col`` whose frequency is >= ceil(min_frac * N),
    with EXACT counts. Requires min_frac > 1/(k+1) so the MG candidate
    set provably contains every qualifying item."""
    if min_frac * (k + 1) <= 1:
        raise ValueError(
            f"min_frac={min_frac} below the MG(k={k}) guarantee 1/(k+1); "
            "raise k or the threshold"
        )
    items = df.select(F.col(col).alias("item"))
    summaries = items.mapInPandas(
        lambda it: _mg_partition(it, "item", k), schema=MG_SCHEMA
    )
    candidates = summaries.groupBy("item").agg(F.sum("est").alias("est")).select("item")
    total = items.agg(F.count("item").alias("n"))
    return (
        items.join(F.broadcast(candidates), "item")
        .groupBy("item")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .crossJoin(F.broadcast(total))
        .where(F.col("cnt") >= F.ceil(F.col("n") * F.lit(min_frac)))
        .select("item", F.col("cnt").cast("bigint").alias("cnt"))
    )
