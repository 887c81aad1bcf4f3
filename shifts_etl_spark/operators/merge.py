"""MERGE / upsert — lakehouse-style `MERGE INTO target USING updates ON key`
over the staged-parquet layout (no Delta in this container; same contract).

Semantics (the common subset):
  - matched rows  → replaced by the update row (whole-row upsert)
  - unmatched     → inserted
  - ``delete_col``: updates with that boolean column true delete instead

Plan shape: ONE full-outer join between target and updates on the key —
the update side is usually dim-sized, so it broadcasts; the rewrite cost is
one pass over the target. (Table formats with file-level stats prune the
rewrite to touched files; the staged layout rewrites the table — the join
itself is identical.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..sinks.staged import StagedWriter, clear_outputs


def merge_dataframes(
    target: DataFrame,
    updates: DataFrame,
    key: str,
    delete_col: str | None = None,
) -> DataFrame:
    """Pure-DataFrame MERGE: returns the post-merge table."""
    if delete_col is not None:
        deletes = updates.where(F.col(delete_col)).select(key)
        updates = updates.where(~F.col(delete_col)).drop(delete_col)
        target = target.join(F.broadcast(deletes), key, "left_anti")
    # upsert = updates win on key collision, target rows otherwise
    survivors = target.join(
        F.broadcast(updates.select(key)), key, "left_anti"
    )
    return survivors.unionByName(updates)


def merge_into(
    spark: SparkSession,
    root: str,
    table: str,
    updates: DataFrame,
    key: str,
    delete_col: str | None = None,
) -> int:
    """MERGE into a staged-sink table in place (atomic batch swap):
    read current → merge → write merged batch → drop old batches.
    Returns the post-merge row count."""
    writer = StagedWriter(root)
    current = writer.read_table(spark, table)
    merged = merge_dataframes(current, updates, key, delete_col).persist()
    n = merged.count()  # materialize BEFORE clearing the source batches
    import uuid

    old = sorted((writer.root / table).glob("batch=*"))
    # unique id: a fixed one collides with the previous merge's promoted
    # batch dir on the second merge into the same table
    writer.write_batch({table: merged}, batch_id=f"merge-{uuid.uuid4().hex[:8]}")
    # promote: drop pre-merge batches only after the merged batch landed
    import shutil

    for d in old:
        shutil.rmtree(d, ignore_errors=True)
    merged.unpersist()
    return n


def scd2_from_changelog(
    changes: DataFrame,
    key_col: str,
    order_col: str,
    state_col: str,
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Build a slowly-changing-dimension type-2 history from a change
    log: collapse consecutive equal states per key into validity
    intervals [valid_from, valid_to), valid_to NULL for the current row
    — the dimension-table shape every warehouse join-asof's against.

    Gaps-and-islands via the change-flag running sum, then one LEAD for
    the interval close. Every window is PARTITIONED by the key, so
    parallelism = #keys and no single-partition exchange appears; the
    aggregate is map-side combinable on (key, island). Ties on
    ``order_col`` are split by ``tiebreak_col`` (default: the state) so
    island assignment is deterministic."""
    from pyspark.sql import Window

    tb = tiebreak_col or state_col
    w = Window.partitionBy(key_col).orderBy(order_col, tb)
    chg = F.when(
        F.lag(state_col).over(w).isNull()
        | (F.col(state_col) != F.lag(state_col).over(w)),
        1,
    ).otherwise(0)
    runs = (
        changes.withColumn("_chg", chg)
        .withColumn(
            "_run",
            F.sum("_chg").over(
                w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            ),
        )
        .groupBy(key_col, "_run")
        .agg(
            F.first(state_col).alias("state"),
            F.min(order_col).alias("valid_from"),
            F.count(F.lit(1)).alias("n_changes"),
        )
    )
    wr = Window.partitionBy(key_col).orderBy("_run")
    return runs.select(
        F.col(key_col),
        "state",
        "valid_from",
        F.lead("valid_from").over(wr).alias("valid_to"),
        F.col("n_changes").cast("bigint").alias("n_changes"),
    )


# (delta aggregate fn, partial-state merge fn) per supported measure —
# algebraic states only, so refresh cost is delta-sized, never table-sized.
_PARTIAL_FNS = {
    "sum": (F.sum, F.sum),
    "count": (F.count, F.sum),
    "min": (F.min, F.min),
    "max": (F.max, F.max),
}


def partial_aggregate(
    delta: DataFrame, keys: list[str], measures: dict[str, str]
) -> DataFrame:
    """Collapse a delta batch to per-key partial aggregate states
    (map-side combinable; the shuffle carries one state row per key)."""
    exprs = [
        _PARTIAL_FNS[how][0](col).alias(col) for col, how in measures.items()
    ]
    return delta.groupBy(*keys).agg(*exprs)


def merge_partial_aggregates(
    current: DataFrame | None,
    delta_partial: DataFrame,
    keys: list[str],
    measures: dict[str, str],
) -> DataFrame:
    """Incremental materialized-aggregate maintenance: merge a delta's
    partial states into the stored aggregate table without touching the
    base data — refresh cost is O(|delta| + |touched keys|), the reason
    warehouse rollups stay cheap at 100 TB. Supported measures are
    algebraic (sum/count/min/max); keep AVG as (sum, count) and divide at
    read time. Merging is a union + re-aggregate with each measure's
    MERGE function (count partials merge by SUM), so the plan is one
    combinable aggregate over table-keys + delta-keys rows."""
    if current is None:
        return delta_partial
    exprs = [
        _PARTIAL_FNS[how][1](col).alias(col) for col, how in measures.items()
    ]
    return current.unionByName(delta_partial).groupBy(*keys).agg(*exprs)


def scd2_intervals(
    events: DataFrame,
    attr: "F.Column | None" = None,
    ts_col: str = "ts",
    user_col: str = "user_id",
    id_col: str = "event_id",
) -> DataFrame:
    """Type-2 slowly-changing-dimension history from an event stream:
    collapse each user's consecutive runs of an attribute value (default:
    the ``k`` field of the props JSON) into validity intervals
    [valid_from, valid_to), with valid_to NULL on the current row — the
    change-data modeling step that turns an append-only log into an
    as-of-joinable dimension.

    Determinism: events order by (ts, event_id); a run starts where the
    attribute differs from its lag (or at the user's first event).

    Scale shape: one keyed shuffle on user drives both windows (lag for
    change marks, cumulative sum for run ids, lead for interval close);
    the per-run aggregate carries (user, run, value, ts) rows only."""
    from pyspark.sql import Window

    if attr is None:
        attr = F.get_json_object(F.col("props"), "$.k").cast("int")
    w = Window.partitionBy(user_col).orderBy(ts_col, id_col)
    marked = events.select(
        F.col(user_col).alias("user_id"),
        F.col(ts_col).alias("ts"),
        F.col(id_col).alias("event_id"),
        attr.alias("attr"),
    ).select(
        "*",
        F.when(
            F.lag("attr").over(
                Window.partitionBy("user_id").orderBy("ts", "event_id")
            ).eqNullSafe(F.col("attr")),
            0,
        )
        .otherwise(1)
        .alias("is_change"),
    )
    w2 = Window.partitionBy("user_id").orderBy("ts", "event_id")
    runs = marked.select(
        "user_id",
        "ts",
        "attr",
        F.sum("is_change").over(w2).alias("run_id"),
    )
    intervals = runs.groupBy("user_id", "run_id").agg(
        F.min("ts").alias("valid_from"),
        F.min("attr").alias("attr"),
        F.count(F.lit(1)).cast("long").alias("n_events"),
    )
    w3 = Window.partitionBy("user_id").orderBy("run_id")
    return intervals.select(
        "user_id",
        F.col("attr"),
        "valid_from",
        F.lead("valid_from").over(w3).alias("valid_to"),
        "n_events",
    )
