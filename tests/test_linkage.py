"""Fuzzy entity resolution (operators/linkage.py): pair semantics, the
exact-duplicate exclusion, and the hot-block cap (same planted-degenerate
pattern as the LSH bucket-cap test)."""

from __future__ import annotations

from pyspark.sql import functions as F

from shifts_etl_spark.operators.linkage import blocked_fuzzy_pairs


def _df(spark, rows):
    return spark.createDataFrame(rows, "id long, name string")


def test_finds_near_matches_within_block(spark):
    df = _df(
        spark,
        [
            (1, "acme corp"),
            (2, "acme korp"),   # 1 edit from acme corp
            (3, "acme corporation"),  # 7 edits — outside max_edit
            (4, "zenith inc"),  # different block
        ],
    )
    got = blocked_fuzzy_pairs(
        df, "id", "name", F.split("name", " ").getItem(0)
    ).collect()
    assert {(r["a_id"], r["b_id"], r["edit_distance"]) for r in got} == {(1, 2, 1)}


def test_exact_duplicates_excluded(spark):
    df = _df(spark, [(1, "acme corp"), (2, "acme corp")])
    assert (
        blocked_fuzzy_pairs(
            df, "id", "name", F.split("name", " ").getItem(0)
        ).count()
        == 0
    )


def test_cross_block_pairs_never_compared(spark):
    # 1 edit apart but different first tokens — blocking (deliberately)
    # misses them; pinned so the recall trade-off is explicit
    df = _df(spark, [(1, "acme corp"), (2, "bcme corp")])
    assert (
        blocked_fuzzy_pairs(
            df, "id", "name", F.split("name", " ").getItem(0)
        ).count()
        == 0
    )


def test_hot_block_cap_bounds_pairs(spark):
    # planted degenerate block: 50 members ("hot x0..x49"), all 1-2 edits
    # apart -> ~quadratic pairs without the cap; a normal pair elsewhere
    rows = [(i, f"hot x{i}") for i in range(50)]
    rows += [(100, "cold part"), (101, "cold parts")]
    df = _df(spark, rows)
    blk = F.split("name", " ").getItem(0)
    uncapped = blocked_fuzzy_pairs(df, "id", "name", blk)
    capped = blocked_fuzzy_pairs(df, "id", "name", blk, block_cap=10)
    assert uncapped.count() > 100
    got = capped.collect()
    # the degenerate block is dropped entirely; normal recall unchanged
    assert {(r["a_id"], r["b_id"]) for r in got} == {(100, 101)}
