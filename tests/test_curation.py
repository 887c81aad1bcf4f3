"""Curation operators (operators/curation.py): planted-case semantics —
quota caps bite deterministically, contamination flags the planted copy,
semantic dedup keeps exactly one representative per near-dup group."""

import pytest
from pyspark.sql import Row, functions as F

from shifts_etl_spark.operators import curation

SF = "/root/testdata/sf0.001"


def test_cap_per_group_bites_and_is_deterministic(spark):
    docs = spark.createDataFrame(
        [Row(doc_id=i, source=f"s{i % 3}", text=f"doc number {i}") for i in range(60)]
    )
    order = [F.md5("text"), F.col("doc_id")]
    capped = curation.cap_per_group(docs, "source", 7, order_cols=order)
    per = {
        r["source"]: r["n"]
        for r in capped.groupBy("source").agg(F.count("*").alias("n")).collect()
    }
    assert per == {"s0": 7, "s1": 7, "s2": 7}
    # same selection at any partitioning (the two-phase top-k is a pure
    # set property of the order key)
    again = curation.cap_per_group(
        docs.repartition(13), "source", 7, order_cols=order
    )
    assert {tuple(r) for r in capped.select("doc_id", "group_rank").collect()} == {
        tuple(r) for r in again.select("doc_id", "group_rank").collect()
    }
    # groups under the cap pass through untouched
    loose = curation.cap_per_group(docs, "source", 25, order_cols=order)
    assert loose.count() == 60


def test_contamination_flags_planted_copy(spark):
    bench = spark.createDataFrame(
        [Row(doc_id=1, text="the quick brown fox jumps over the lazy dog")]
    )
    docs = spark.createDataFrame(
        [
            # verbatim copy of the benchmark doc → every shingle hits
            Row(doc_id=100, text="the quick brown fox jumps over the lazy dog"),
            # half-overlapping: shares a 4-token prefix
            Row(doc_id=101, text="the quick brown fox went home early today"),
            # disjoint
            Row(doc_id=102, text="completely unrelated words appear in this one"),
        ]
    )
    got = {
        r["doc_id"]: r
        for r in curation.benchmark_contamination(docs, bench).collect()
    }
    assert got[100]["contamination_frac"] == 1.0
    assert 0.0 < got[101]["contamination_frac"] < 1.0
    assert got[101]["n_contaminated"] == 2  # 2 of its 6 trigram shingles
    assert got[102]["contamination_frac"] == 0.0
    assert all(r["n_shingles"] > 0 for r in got.values())


def test_semantic_dedup_keeps_one_per_neighborhood(spark):
    import math

    def unit(theta):
        return [float(math.cos(theta)), float(math.sin(theta)), 0.0, 0.0]

    def jitter(v, eps):
        return [v[0] + eps, v[1], v[2], v[3]]

    rows = [
        # near-dup group A: three nearly identical vectors
        Row(vec_id=1, embedding=unit(0.0)),
        Row(vec_id=2, embedding=jitter(unit(0.0), 1e-4)),
        Row(vec_id=3, embedding=jitter(unit(0.0), 2e-4)),
        # near-dup group B: two
        Row(vec_id=10, embedding=unit(2.0)),
        Row(vec_id=11, embedding=jitter(unit(2.0), 1e-4)),
        # singletons, pairwise far
        Row(vec_id=20, embedding=unit(4.0)),
        Row(vec_id=21, embedding=[0.0, 0.0, 1.0, 0.0]),
    ]
    emb = spark.createDataFrame(rows)
    out = curation.semantic_dedup(emb, k=3, threshold=0.99, max_iter=4)
    kept = {r["vec_id"] for r in out.where("keep").collect()}
    assert out.count() == 7  # one row per input, always
    assert 1 in kept and len(kept & {1, 2, 3}) == 1
    assert 10 in kept and len(kept & {10, 11}) == 1
    assert {20, 21} <= kept


def test_contamination_on_testdata_self_benchmark(spark):
    """Every doc is fully contaminated against a benchmark containing
    itself — the identity sanity check on real data."""
    d = spark.read.parquet(f"{SF}/documents.parquet").limit(30)
    got = curation.benchmark_contamination(d, d)
    assert got.where("contamination_frac < 1.0").count() == 0
    assert got.count() == 30


def test_weighted_sample_k_bound_and_partition_independence(spark):
    docs = spark.createDataFrame(
        [Row(doc_id=i, lang=f"l{i % 2}", w=1 + i % 5) for i in range(200)]
    )
    out = curation.weighted_sample(
        docs, k=10, weight_col=F.col("w"), strata_col="lang"
    )
    per = {
        r["lang"]: r["n"]
        for r in out.groupBy("lang").agg(F.count("*").alias("n")).collect()
    }
    assert per == {"l0": 10, "l1": 10}
    again = curation.weighted_sample(
        docs.repartition(17), k=10, weight_col=F.col("w"), strata_col="lang"
    )
    assert {r["doc_id"] for r in out.collect()} == {
        r["doc_id"] for r in again.collect()
    }


def test_weighted_sample_prefers_heavy_rows(spark):
    # One row carries ~all the corpus weight: priority u/w collapses to
    # ~0 for it, so it must be drawn; and a k-sized stratum returns whole.
    docs = spark.createDataFrame(
        [Row(doc_id=i, lang="en", w=1_000_000_000 if i == 42 else 1)
         for i in range(100)]
        + [Row(doc_id=900, lang="tiny", w=3)]
    )
    out = curation.weighted_sample(
        docs, k=10, weight_col=F.col("w"), strata_col="lang"
    ).collect()
    assert 42 in {r["doc_id"] for r in out}
    assert {r["doc_id"] for r in out if r["lang"] == "tiny"} == {900}
