"""Batch-C operators: interval-overlap self-join (exactly-once emission
across bucket boundaries, closed-interval semantics) and triangle count
(orientation correctness on planted graphs, duplicate/direction/self-loop
hygiene)."""

from pyspark.sql import Row, functions as F

from shifts_etl_spark.operators.graph import triangle_count
from shifts_etl_spark.operators.joins import interval_overlap_pairs


def _iv(spark, rows):
    return spark.createDataFrame(
        [Row(k=k, i=i, s=s, e=e) for (k, i, s, e) in rows],
        "k string, i bigint, s bigint, e bigint",
    )


def _pairs(df):
    return {
        (r["k"], r["a_id"], r["b_id"]): r["overlap_s"]
        for r in interval_overlap_pairs(
            df, "k", "i", "s", "e", bucket_seconds=100
        ).collect()
    }


def test_interval_overlap_semantics(spark):
    rows = [
        ("u", 1, 0, 50),      # overlaps 2 (closed touch at 50) and 3
        ("u", 2, 50, 120),    # crosses bucket boundary at 100
        ("u", 3, 40, 45),     # inside 1
        ("u", 4, 200, 210),   # disjoint from all
        ("v", 5, 0, 50),      # same times, different key → no cross-key pair
    ]
    got = _pairs(_iv(spark, rows))
    assert got == {
        ("u", 1, 2): 0,   # closed intervals: touching counts, overlap 0
        ("u", 1, 3): 5,
    }


def test_interval_overlap_exactly_once_across_many_buckets(spark):
    # both intervals span 5 buckets together; the pair must appear ONCE
    rows = [("u", 1, 0, 450), ("u", 2, 10, 460)]
    out = interval_overlap_pairs(
        _iv(spark, rows), "k", "i", "s", "e", bucket_seconds=100
    ).collect()
    assert len(out) == 1
    assert out[0]["overlap_s"] == 440


def test_interval_overlap_matches_bruteforce(spark):
    import random

    rng = random.Random(7)
    rows = [
        ("u%d" % rng.randrange(3), i, s := rng.randrange(0, 1000), s + rng.randrange(0, 300))
        for i in range(120)
    ]
    got = _pairs(_iv(spark, rows))
    want = {}
    for k, i, s, e in rows:
        for k2, i2, s2, e2 in rows:
            if k == k2 and i < i2 and s <= e2 and s2 <= e:
                want[(k, i, i2)] = min(e, e2) - max(s, s2)
    assert got == want


def _edges(spark, pairs):
    return spark.createDataFrame(
        [Row(src=a, dst=b) for a, b in pairs], "src bigint, dst bigint"
    )


def _tri(df):
    r = triangle_count(df).collect()[0]
    return (r["n_nodes"], r["n_edges"], r["n_triangles"])


def test_triangle_k4(spark):
    k4 = [(a, b) for a in range(4) for b in range(4) if a < b]
    assert _tri(_edges(spark, k4)) == (4, 6, 4)


def test_triangle_path_has_none(spark):
    assert _tri(_edges(spark, [(0, 1), (1, 2), (2, 3)])) == (4, 3, 0)


def test_triangle_dedup_direction_selfloops(spark):
    # one triangle given as mixed directions + duplicates + a self-loop
    noisy = [(0, 1), (1, 0), (1, 2), (2, 0), (2, 2), (0, 1)]
    assert _tri(_edges(spark, noisy)) == (3, 3, 1)


def test_triangle_hub_star_plus_rim(spark):
    # wheel: hub 0 connected to rim 1..5, rim cycle 1-2-3-4-5-1 → 5 triangles
    wheel = [(0, i) for i in range(1, 6)] + [(1, 2), (2, 3), (3, 4), (4, 5), (5, 1)]
    assert _tri(_edges(spark, wheel)) == (6, 10, 5)
