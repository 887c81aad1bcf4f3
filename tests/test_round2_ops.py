"""Round-2 operators: sweep-line concurrency (q32), recursive hierarchy
(q33), substring-level duplicate spans (x43), product-quantization ANN
(x44) — planted-case semantics plus recall/determinism checks."""

import datetime

import pytest
from pyspark.sql import Row, functions as F

from shifts_etl_spark.operators import dedup, pq, simsearch
from shifts_etl_spark.operators.hierarchy import iterate_hierarchy
from shifts_etl_spark.plans.relational import (
    q32_event_concurrency,
    q33_recursive_hierarchy,
)

SF01 = "/root/testdata/sf0.01"


def _ts(minute, second=0):
    return datetime.datetime(2024, 1, 1, 0, minute, second)


def test_q32_sweep_line_planted(spark, tmp_path):
    """Three overlapping 'a' intervals peak at 3; a back-to-back pair
    ('b': one ends exactly when the next starts) peaks at 1 — the -1
    before +1 tie rule means touching intervals never count as
    concurrent."""
    rows = [
        # type a: [0,10), [5,15), [9,12) minutes → all three open at t=9.5
        Row(event_id=1, ts=_ts(0), user_id=1, event_type="a", value=10.0, props="{}"),
        Row(event_id=2, ts=_ts(5), user_id=1, event_type="a", value=10.0, props="{}"),
        Row(event_id=3, ts=_ts(9), user_id=1, event_type="a", value=3.0, props="{}"),
        # type b: [0,5) then [5,10) — touching, never concurrent
        Row(event_id=4, ts=_ts(0), user_id=2, event_type="b", value=5.0, props="{}"),
        Row(event_id=5, ts=_ts(5), user_id=2, event_type="b", value=5.0, props="{}"),
    ]
    spark.createDataFrame(rows).write.parquet(f"{tmp_path}/events.parquet")
    out = {
        r.event_type: r.peak_concurrency
        for r in q32_event_concurrency(spark, str(tmp_path)).collect()
    }
    assert out == {"a": 3, "b": 1}


def test_q33_hierarchy_matches_closed_form(spark, tmp_path):
    """parent = key // 7 forest: depth/root must equal the per-node
    closed form."""
    rows = [
        Row(p_partkey=i, p_name="n", p_brand="b", p_type="t", p_size=1,
            p_retailprice=1.0)
        for i in range(100)
    ]
    spark.createDataFrame(rows).write.parquet(f"{tmp_path}/part.parquet")

    def expect(n):
        d, r = 0, n
        while r >= 7:
            r //= 7
            d += 1
        return d, r

    got = {
        r.node: (r.depth, r.root)
        for r in q33_recursive_hierarchy(spark, str(tmp_path)).collect()
    }
    assert len(got) == 100
    for n in range(100):
        assert got[n] == expect(n), f"node {n}: {got[n]} != {expect(n)}"


def test_hierarchy_depth_guard_raises(spark):
    """A chain deeper than max_levels must raise, not spin."""
    chain = spark.range(30).select(
        F.col("id").alias("node"),
        F.when(F.col("id") > 0, F.col("id") - 1).alias("parent"),
    )
    with pytest.raises(ValueError, match="deeper than"):
        iterate_hierarchy(chain, max_levels=5).count()


def test_substring_dupes_planted(spark):
    """Two docs sharing an exact passage produce exactly the 40-gram
    windows of their (space-extended) common run; a disjoint doc
    contributes none. Expected count computed from first principles."""
    passage = "the quick brown fox jumps over the lazy dog near the river b"
    t1 = "AAAA " + passage + " unique tail one xxxxxxxxxx"
    t2 = "BBBBBB " + passage + " other ending yyyyyyyyyy"
    expected = len(
        {t1[i : i + 40] for i in range(len(t1) - 39)}
        & {t2[i : i + 40] for i in range(len(t2) - 39)}
    )
    assert expected > 0
    docs = spark.createDataFrame(
        [
            Row(doc_id=1, text=t1),
            Row(doc_id=2, text=t2),
            Row(doc_id=3, text="z" * 80),  # long but disjoint
        ]
    )
    out = dedup.substring_duplicate_spans(docs).collect()
    assert all(r.n_docs == 2 for r in out)
    assert all(r.first_doc == 1 for r in out)
    assert len(out) == expected


def test_substring_dupes_short_docs_excluded(spark):
    docs = spark.createDataFrame(
        [Row(doc_id=1, text="short"), Row(doc_id=2, text="short")]
    )
    assert dedup.substring_duplicate_spans(docs).count() == 0


def test_pq_recall_vs_brute_force(spark):
    emb = spark.read.parquet(f"{SF01}/embeddings.parquet")
    q = [0, 1, 2, 3, 4]
    exact = {
        (r.query_id, r.neighbor_id)
        for r in simsearch.brute_force_topk(emb, q, k=5).collect()
    }
    approx = {
        (r.query_id, r.neighbor_id)
        for r in pq.pq_topk(emb, q, k=5).collect()
    }
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.6, f"PQ recall collapsed: {recall}"


def test_pq_deterministic(spark):
    emb = spark.read.parquet(f"{SF01}/embeddings.parquet")
    a = sorted(map(tuple, pq.pq_topk(emb, [0, 1], k=3).collect()))
    b = sorted(map(tuple, pq.pq_topk(emb, [0, 1], k=3).collect()))
    assert a == b


def test_pq_codes_shape(spark):
    """Encoded table carries only (id, m small ints) — the 32× story."""
    emb = spark.read.parquet(f"{SF01}/embeddings.parquet")
    books = pq.train_codebooks(emb, m=16, k=16)
    assert books.shape == (16, 16, 4)
    row = pq.encode_pq(emb, books).first()
    assert len(row.codes) == 16
    assert all(0 <= c < 16 for c in row.codes)


def test_pq_rounded_recall_vs_brute_force(spark):
    """The oracle-checkable round_decimals=6 configuration (x44 catalog
    config) must keep the same recall bar as the unrounded default —
    6-dp quantization is far below the inter-vector distance scale."""
    emb = spark.read.parquet(f"{SF01}/embeddings.parquet")
    q = [0, 1, 2, 3, 4]
    exact = {
        (r.query_id, r.neighbor_id)
        for r in simsearch.brute_force_topk(emb, q, k=5).collect()
    }
    approx = {
        (r.query_id, r.neighbor_id)
        for r in pq.pq_topk(emb, q, k=5, round_decimals=6).collect()
    }
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.6, f"rounded-PQ recall collapsed: {recall}"
