"""Training-shard export sink: token-budget shard spans, exactly-once doc
membership, deterministic (seed-reproducible) manifests, seed-sensitivity,
and conservation of docs/tokens through the write."""

import shutil

from pyspark.sql import Row, functions as F

from shifts_etl_spark.sinks.shards import assign_shards, write_training_shards


def _docs(spark, n=60, words=5):
    return spark.createDataFrame(
        [Row(doc_id=i, text=" ".join(f"w{i}t{j}" for j in range(words))) for i in range(n)],
        "doc_id bigint, text string",
    )


def test_assign_shards_spans_and_budget(spark):
    docs = _docs(spark, n=60, words=5)  # 300 tokens total
    out = assign_shards(docs, tokens_per_shard=50).collect()
    assert len(out) == 60  # every doc exactly once
    by_shard = {}
    for r in out:
        by_shard.setdefault(r["shard_id"], 0)
        by_shard[r["shard_id"]] += r["n_tokens"]
    # 300 tokens / 50 per shard -> exactly 6 full shards (uniform 5-token docs)
    assert sorted(by_shard) == list(range(6))
    assert all(v == 50 for v in by_shard.values())


def test_assign_shards_boundary_spill(spark):
    # doc sizes 30+30: cum_before of doc2 = 30 -> shard floor(30/40)=0;
    # doc3 cum_before=60 -> shard 1: boundary docs spill forward, never split
    docs = _docs(spark, n=3, words=30)
    out = {r["doc_id"]: r["shard_id"] for r in assign_shards(docs, 40).collect()}
    assert sorted(out.values()) == [0, 0, 1]


def test_write_shards_manifest_and_determinism(spark, tmp_path):
    docs = _docs(spark, n=40, words=7)
    m1 = write_training_shards(docs, tmp_path / "a", tokens_per_shard=70).collect()
    total_docs = sum(r["n_docs"] for r in m1)
    total_tokens = sum(r["n_tokens"] for r in m1)
    assert total_docs == 40 and total_tokens == 280
    # re-run, same seed -> identical shard membership and checksums
    m2 = write_training_shards(docs, tmp_path / "b", tokens_per_shard=70).collect()
    assert sorted(map(tuple, m1)) == sorted(map(tuple, m2))
    # different seed -> different hash order -> different membership
    m3 = write_training_shards(
        docs, tmp_path / "c", tokens_per_shard=70, seed=1
    ).collect()
    assert sorted(map(tuple, m1)) != sorted(map(tuple, m3))
    # conservation holds under any seed
    assert sum(r["n_docs"] for r in m3) == 40
    assert sum(r["n_tokens"] for r in m3) == 280


def test_written_data_matches_manifest(spark, tmp_path):
    docs = _docs(spark, n=25, words=4)
    manifest = {
        r["shard_id"]: r
        for r in write_training_shards(docs, tmp_path / "d", 20).collect()
    }
    data = spark.read.parquet(str(tmp_path / "d" / "data"))
    per_shard = {
        r["shard_id"]: (r["nd"], r["nt"])
        for r in data.groupBy("shard_id")
        .agg(F.count(F.lit(1)).alias("nd"), F.sum("n_tokens").alias("nt"))
        .collect()
    }
    assert set(per_shard) == set(manifest)
    for sid, (nd, nt) in per_shard.items():
        assert manifest[sid]["n_docs"] == nd
        assert manifest[sid]["n_tokens"] == nt
    # no doc lost or duplicated through the partitioned write
    assert data.select("doc_id").distinct().count() == 25
    assert data.count() == 25
