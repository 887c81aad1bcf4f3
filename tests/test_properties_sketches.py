"""Property-based invariants (hypothesis) over the round-2 mergeable
state: quantile-sketch rank error under arbitrary inputs and partition
splits, and incremental-rollup fold-order invariance. Pure-Python driver
checks on the same _Sketch/partial code the Spark paths execute — fast
enough for many hypothesis examples (the Spark-integration behavior of
both operators is pinned separately in test_quantiles/test_incremental)."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings, strategies as st

from shifts_etl_spark.operators.quantiles import _Sketch

FLOATS = st.floats(
    min_value=-1e6, max_value=1e6, allow_nan=False, allow_subnormal=False
)


def _rank_error(vals, est, prob):
    """Distance from the quantile_disc target rank ceil(p*n) to the rank
    INTERVAL est occupies (duplicates and exact hits count as error 0)."""
    a = np.sort(np.asarray(vals))
    n = len(a)
    lo = np.searchsorted(a, est, side="left") + 1
    hi = np.searchsorted(a, est, side="right")
    target = int(np.ceil(prob * n))
    return max(0, lo - target, target - hi) / n


@given(
    vals=st.lists(FLOATS, min_size=1, max_size=3000),
    prob=st.floats(min_value=0.01, max_value=0.99),
    n_chunks=st.integers(1, 7),
)
@settings(max_examples=60, deadline=None)
def test_sketch_rank_error_any_split(vals, prob, n_chunks):
    """Rank error stays under the 2·log2(n/k)/k analytic envelope no
    matter how the input is split into partial sketches."""
    k = 64
    chunks = np.array_split(np.asarray(vals, dtype="float64"), n_chunks)
    sk = _Sketch(k)
    for c in chunks:
        part = _Sketch(k)
        part.update_batch(c)
        sk.merge(part)
    assert sk.n == len(vals)
    est = sk.quantile(prob)
    n = len(vals)
    eps = 0.5 / n if n <= k else 2 * np.log2(max(n / k, 2)) / k
    assert _rank_error(vals, est, prob) <= eps + 1e-9


@given(
    vals=st.lists(FLOATS, min_size=1, max_size=500),
    prob=st.floats(min_value=0.01, max_value=0.99),
)
@settings(max_examples=60, deadline=None)
def test_sketch_exact_under_capacity(vals, prob):
    """n <= k ⇒ no compaction ⇒ the estimate IS the quantile_disc value
    (lowest v with cumulative count >= ceil(p*n))."""
    k = 500
    sk = _Sketch(k)
    sk.update_batch(np.asarray(vals, dtype="float64"))
    est = sk.quantile(prob)
    s = sorted(vals)
    idx = int(np.ceil(prob * len(s))) - 1
    assert est == s[max(idx, 0)]


@given(
    batches=st.lists(
        st.lists(
            st.tuples(st.sampled_from(["a", "b", "c"]), FLOATS),
            min_size=0,
            max_size=30,
        ),
        min_size=1,
        max_size=5,
    ),
    order_seed=st.integers(0, 1000),
)
@settings(max_examples=40, deadline=None)
def test_rollup_fold_order_invariance(spark, batches, order_seed):
    """Folding batches in any order == one-shot aggregate (algebraic
    merge associativity + commutativity), including empty batches."""
    from shifts_etl_spark.operators import incremental as inc

    measures = {"n": ("count", "*"), "t": ("sum", "v"), "lo": ("min", "v")}
    dfs = [
        spark.createDataFrame(b, "k string, v double") if b else None
        for b in batches
    ]
    flat = [r for b in batches for r in b]
    if not flat:
        return
    full = spark.createDataFrame(flat, "k string, v double")
    expected = {
        r["k"]: (r["n"], round(r["t"], 6), r["lo"])
        for r in inc.render(
            inc.aggregate_partials(full, ["k"], measures), measures
        ).collect()
    }
    order = list(range(len(dfs)))
    rng = np.random.RandomState(order_seed)
    rng.shuffle(order)
    state = None
    for i in order:
        if dfs[i] is None:
            continue
        state = inc.merge_state(
            state, inc.aggregate_partials(dfs[i], ["k"], measures), ["k"], measures
        )
    got = {
        r["k"]: (r["n"], round(r["t"], 6), r["lo"])
        for r in inc.render(state, measures).collect()
    }
    assert got == expected
