"""Bloom-filter join pruning (operators/bloom.py): no false negatives,
real pruning, and exact semi-join equivalence."""

import pytest
from pyspark.sql import functions as F

from shifts_etl_spark.operators import bloom


def _tables(spark):
    big = spark.range(0, 5000).select(
        F.col("id").alias("k"), (F.col("id") % 7).alias("v")
    )
    # small side: 2% of the key space, plus keys outside it entirely
    small = spark.range(0, 5000, 50).select(F.col("id").alias("k"))
    return big, small


def test_no_false_negatives(spark):
    big, small = _tables(spark)
    bf = bloom.build_bloom(small, "k", num_bits=1 << 12, num_hashes=5)
    survivors = {
        r["k"] for r in big.where(bloom.might_contain(bf, F.col("k"))).collect()
    }
    true_keys = {r["k"] for r in small.collect()}
    assert true_keys <= survivors


def test_prune_is_selective_superset(spark):
    big, small = _tables(spark)
    pruned = bloom.bloom_prune(big, small, "k", num_bits=1 << 12)
    n = pruned.count()
    # 100 true keys; a correctly sized filter keeps far less than the
    # full 5000 even with false positives
    assert 100 <= n < 1000


def test_semi_join_exact_equivalence(spark):
    big, small = _tables(spark)
    got = sorted(
        (r["k"], r["v"])
        for r in bloom.bloom_semi_join(big, small, "k").collect()
    )
    want = sorted(
        (r["k"], r["v"])
        for r in big.join(small, "k", "left_semi").collect()
    )
    assert got == want and len(got) == 100


def test_empty_small_side_prunes_everything(spark):
    big, small = _tables(spark)
    empty = small.where(F.lit(False))
    assert bloom.bloom_semi_join(big, empty, "k").count() == 0


def test_null_keys_never_match(spark):
    big, small = _tables(spark)
    with_null = big.withColumn(
        "k", F.when(F.col("k") < 2500, F.col("k"))
    )
    got = bloom.bloom_semi_join(with_null, small, "k").count()
    want = with_null.join(small, "k", "left_semi").count()
    assert got == want


def test_repetition_stats_ranks_repetitive_doc(spark):
    from pyspark.sql import Row

    from shifts_etl_spark.operators.textstats import repetition_stats

    df = spark.createDataFrame(
        [
            Row(doc_id=1, text="the cat sat on the mat and then ran far away"),
            Row(doc_id=2, text="spam spam spam spam spam spam spam spam"),
            Row(doc_id=3, text="one"),
        ]
    )
    got = {r["doc_id"]: r for r in repetition_stats(df).collect()}
    assert got[2]["top_token_frac"] == 1.0
    assert got[2]["dup_bigram_frac"] == pytest.approx(6 / 7)
    assert got[1]["distinct_token_ratio"] > got[2]["distinct_token_ratio"]
    # single-token doc: no bigrams → fraction defined as 0
    assert got[3]["n_tokens"] == 1 and got[3]["dup_bigram_frac"] == 0.0


def test_mixed_key_width_has_no_false_negatives(spark):
    big = spark.range(0, 1000).select(F.col("id").cast("int").alias("k"))
    small = spark.range(0, 1000, 10).select(F.col("id").alias("k"))  # bigint
    got = {r["k"] for r in bloom.bloom_semi_join(big, small, "k").collect()}
    assert got == set(range(0, 1000, 10))
