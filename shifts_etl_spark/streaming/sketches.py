"""Streaming sketch state: sharded Misra-Gries heavy hitters.

The batch operator (operators/heavyhitters.py) bounds per-partition
state at k counters; this is its streaming twin. Items are grouped by a
hash SHARD (each item lives entirely in one shard), and each shard
keeps ONE MG(k) summary in group state — so state is shards × k
counters regardless of traffic or key-space size, and every item with
shard-local count > n_shard/(k+1) provably survives the summary (same
Misra-Gries guarantee as the batch op, applied per shard).

Each micro-batch the shard emits its current candidates ≥ the frequency
threshold in Update mode — the live "trending items" feed. The sketch
is JSON in the state row: ≤ k (item, count) entries, a few KB, the
bounded-state discipline docs/SCALE.md requires of every streaming op.

Reference parity: the reference has no streaming surface
(/root/reference/etl/app/main.py is a batch HTTP service); this is a
beyond-reference extension.
"""

from __future__ import annotations

import json
from pathlib import Path

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.streaming.state import GroupStateTimeout

HH_OUT_SCHEMA = "shard int, item string, est long, shard_n long"
HH_STATE_SCHEMA = "summary string, n long"


def _mg_update(counters: dict[str, int], items: pd.Series, k: int) -> dict[str, int]:
    """Merge a batch's value_counts into an MG(k) summary (batched
    decrement: subtract the (k+1)-th largest, drop non-positives)."""
    vc = items.value_counts()
    for item, c in vc.items():
        counters[item] = counters.get(item, 0) + int(c)
    if len(counters) > k:
        cut = sorted(counters.values(), reverse=True)[k]
        counters = {i: c - cut for i, c in counters.items() if c - cut > 0}
    return counters


def _hh_shard_fn(
    key, pdf_iter, state, col: str, k: int, min_frac: float, min_count: int
):
    if state.hasTimedOut:  # pragma: no cover - no timeout configured
        state.remove()
        return
    if state.exists:
        summary_json, n = state.get
        counters = json.loads(summary_json)
    else:
        counters, n = {}, 0
    for pdf in pdf_iter:
        vals = pdf[col].dropna().astype(str)
        n += int(len(vals))
        counters = _mg_update(counters, vals, k)
    state.update((json.dumps(counters), n))
    # absolute floor on top of the fraction: a near-empty shard's
    # singletons are not "heavy" just because the shard is small
    thresh = max(min_count, int(min_frac * n))
    out = [
        {"shard": int(key[0]), "item": item, "est": int(c), "shard_n": int(n)}
        for item, c in sorted(counters.items())
        if c >= thresh
    ]
    if out:
        yield pd.DataFrame(out)


def streaming_heavy_hitters(
    events: DataFrame,
    col: str = "event_type",
    n_shards: int = 8,
    k: int = 50,
    min_frac: float = 0.05,
    min_count: int = 5,
) -> DataFrame:
    """Live heavy-hitter candidates of ``col``: per hash shard, an MG(k)
    summary updated each micro-batch, emitting items whose summary count
    is ≥ max(min_count, min_frac · shard rows) — the absolute floor
    keeps a near-empty shard's singletons out. Estimates carry the MG
    underestimate bound (≤ n_shard/(k+1)); exact counts, when needed,
    come from the batch recount (operators/heavyhitters.heavy_hitters)
    over the candidates only."""
    sharded = events.select(
        (F.abs(F.xxhash64(F.col(col))) % n_shards).cast("int").alias("shard"),
        F.col(col),
    )

    def fn(key, pdf_iter, state):
        return _hh_shard_fn(key, pdf_iter, state, col, k, min_frac, min_count)

    return sharded.groupBy("shard").applyInPandasWithState(
        fn,
        outputStructType=HH_OUT_SCHEMA,
        stateStructType=HH_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def run_streaming_heavy_hitters(
    spark: SparkSession,
    input_dir: str | Path,
    checkpoint_dir: str | Path,
    col: str = "event_type",
    n_shards: int = 8,
    k: int = 50,
    min_frac: float = 0.05,
    min_count: int = 5,
    query_name: str = "heavy_hitters",
    max_files_per_trigger: int | None = None,
):
    """Wire streaming_heavy_hitters to a JSON file-drop source and a
    memory sink (availableNow drain) — the testable end-to-end shape.
    ``max_files_per_trigger=1`` forces one micro-batch per input file,
    exercising sketch-state carry-over across batches. (The memory sink
    cannot recover a checkpoint; for restartable production wiring use
    foreachBatch into the staged sink, as stream_etl does.)"""
    reader = spark.readStream.schema(
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string"
    )
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    events = reader.json(str(input_dir))
    hh = streaming_heavy_hitters(events, col, n_shards, k, min_frac, min_count)
    return (
        hh.writeStream.outputMode("update")
        .format("memory")
        .queryName(query_name)
        .option("checkpointLocation", str(checkpoint_dir))
        .trigger(availableNow=True)
        .start()
    )


# ---------------------------------------------------------------------------
# Streaming distinct-count: KMV/theta sketch per key in group state

DC_OUT_SCHEMA = "key string, est_distinct double, n_rows long"
DC_STATE_SCHEMA = "ks string, n long"


def _kmv_estimate(ks: list[float], k: int) -> float:
    """(k-1)/theta when the sketch filled, exact size before that —
    operators/theta.theta_estimate, driver-side form."""
    if len(ks) < k:
        return float(len(ks))
    return (k - 1.0) / ks[k - 1]


def _dc_key_fn(key, pdf_iter, state, k: int):
    if state.hasTimedOut:  # pragma: no cover - no timeout configured
        state.remove()
        return
    if state.exists:
        ks_json, n = state.get
        ks = json.loads(ks_json)
    else:
        ks, n = [], 0
    seen = set(ks)
    for pdf in pdf_iter:
        n += int(len(pdf))
        u = pdf["_u"]
        seen.update(u[u > 0.0].astype(float).tolist())
    ks = sorted(seen)[:k]
    state.update((json.dumps(ks), n))
    yield pd.DataFrame(
        [{"key": str(key[0]), "est_distinct": round(_kmv_estimate(ks, k), 2),
          "n_rows": int(n)}]
    )


def streaming_distinct_count(
    events: DataFrame,
    key_col: str = "event_type",
    value_col: str = "user_id",
    k: int = 256,
) -> DataFrame:
    """Live approximate COUNT(DISTINCT value) per key: each key's group
    state holds the k smallest uniform hashes of the values seen (the
    KMV/theta sketch of operators/theta.py, serialized to state), so
    state is k doubles per key — constant in traffic AND in true
    cardinality — and the estimate is (k-1)/theta with ~1/√k relative
    error. Hashing happens in the JVM (xxhash64 projection) before the
    stateful Python stage; the Python loop only merges ≤ batch-distinct
    values into a k-bounded sorted list."""
    from ..operators.theta import TWO_63

    hashed = events.select(
        F.col(key_col).cast("string").alias("key"),
        (
            (F.xxhash64(F.col(value_col).cast("string"), F.lit(0)).cast("double")
             + TWO_63 + 1.0)
            / (TWO_63 * 2.0 + 2.0)
        ).alias("_u"),
    )

    def fn(key, pdf_iter, state):
        return _dc_key_fn(key, pdf_iter, state, k)

    return hashed.groupBy("key").applyInPandasWithState(
        fn,
        outputStructType=DC_OUT_SCHEMA,
        stateStructType=DC_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def run_streaming_distinct_count(
    spark: SparkSession,
    input_dir: str | Path,
    checkpoint_dir: str | Path,
    key_col: str = "event_type",
    value_col: str = "user_id",
    k: int = 256,
    query_name: str = "distinct_counts",
    max_files_per_trigger: int | None = None,
):
    """File-drop → streaming_distinct_count → memory sink (availableNow
    drain), mirroring run_streaming_heavy_hitters."""
    reader = spark.readStream.schema(
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string"
    )
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    events = reader.json(str(input_dir))
    dc = streaming_distinct_count(events, key_col, value_col, k)
    return (
        dc.writeStream.outputMode("update")
        .format("memory")
        .queryName(query_name)
        .option("checkpointLocation", str(checkpoint_dir))
        .trigger(availableNow=True)
        .start()
    )


# ---------------------------------------------------------------------------
# Streaming quantiles: KLL/MRL compactor sketch per key in group state

QS_OUT_SCHEMA = "key string, p50 double, p95 double, n_rows long"
QS_STATE_SCHEMA = "sk string"


def _qs_key_fn(key, pdf_iter, state, k: int):
    from ..operators.quantiles import _Sketch

    if state.hasTimedOut:  # pragma: no cover - no timeout configured
        state.remove()
        return
    sk = _Sketch(k)
    if state.exists:
        data = json.loads(state.get[0])
        sk.levels = {int(l): list(v) for l, v in data["levels"].items()}
        sk.n = int(data["n"])
    for pdf in pdf_iter:
        sk.update_batch(pdf["_v"].to_numpy(dtype="float64"))
    state.update(
        (
            json.dumps(
                {
                    "levels": {
                        str(l): it for l, it in sk.levels.items() if it
                    },
                    "n": sk.n,
                }
            ),
        )
    )
    yield pd.DataFrame(
        [
            {
                "key": str(key[0]),
                "p50": sk.quantile(0.5),
                "p95": sk.quantile(0.95),
                "n_rows": int(sk.n),
            }
        ]
    )


def streaming_quantiles(
    events: DataFrame,
    key_col: str = "event_type",
    value_col: str = "value",
    k: int = 200,
) -> DataFrame:
    """Live per-key p50/p95: each key's group state holds ONE mergeable
    compactor sketch (operators/quantiles._Sketch serialized to JSON) —
    k·log(n/k) doubles per key regardless of traffic, the same
    bounded-state discipline as the MG/KMV states above, completing the
    streaming sketch family with rank statistics. The cumulative
    estimate carries the batch-sketch error bound because cross-batch
    accumulation IS the sketch's merge path."""
    vals = events.select(
        F.col(key_col).cast("string").alias("key"),
        F.col(value_col).cast("double").alias("_v"),
    )

    def fn(key, pdf_iter, state):
        return _qs_key_fn(key, pdf_iter, state, k)

    return vals.groupBy("key").applyInPandasWithState(
        fn,
        outputStructType=QS_OUT_SCHEMA,
        stateStructType=QS_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def run_streaming_quantiles(
    spark: SparkSession,
    input_dir: str | Path,
    checkpoint_dir: str | Path,
    key_col: str = "event_type",
    value_col: str = "value",
    k: int = 200,
    query_name: str = "quantiles",
    max_files_per_trigger: int | None = None,
):
    """File-drop → streaming_quantiles → memory sink (availableNow
    drain), mirroring run_streaming_distinct_count."""
    reader = spark.readStream.schema(
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string"
    )
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    events = reader.json(str(input_dir))
    qs = streaming_quantiles(events, key_col, value_col, k)
    return (
        qs.writeStream.outputMode("update")
        .format("memory")
        .queryName(query_name)
        .option("checkpointLocation", str(checkpoint_dir))
        .trigger(availableNow=True)
        .start()
    )
