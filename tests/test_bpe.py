"""BPE merge trainer: canonical Sennrich merge sequence, left-to-right
greedy non-overlapping merge application, early stop, determinism."""

from pyspark.sql import Row, functions as F

from shifts_etl_spark.operators.bpe import (
    END,
    _apply_merge,
    _initial_symbols,
    bpe_train,
    word_vocab,
)


def _corpus(spark, weighted_words):
    rows, i = [], 0
    for w, c in weighted_words:
        for _ in range(c):
            rows.append(Row(doc_id=i, text=w))
            i += 1
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def test_sennrich_merge_sequence(spark):
    docs = _corpus(spark, [("low", 5), ("lower", 2), ("newest", 6), ("widest", 3)])
    merges = bpe_train(docs, 5)
    # the canonical example: es(9) -> est(9) -> est</w>(9) -> lo(7) -> low(7)
    assert merges == [
        ("e", "s", 9),
        ("es", "t", 9),
        ("est", END, 9),
        ("l", "o", 7),
        ("lo", "w", 7),
    ]


def test_apply_merge_greedy_nonoverlapping(spark):
    # 'aaaa' with merge (a,a): greedy left-to-right -> [aa, aa], never [a, aa, a]
    df = spark.createDataFrame([Row(word="aaaa")])
    out = df.select(
        _apply_merge(_initial_symbols(F.col("word")), "a", "a").alias("s")
    ).collect()[0]["s"]
    assert out == ["aa", "aa", END]
    # odd count leaves the trailing singleton
    df3 = spark.createDataFrame([Row(word="aaa")])
    out3 = df3.select(
        _apply_merge(_initial_symbols(F.col("word")), "a", "a").alias("s")
    ).collect()[0]["s"]
    assert out3 == ["aa", "a", END]


def test_early_stop_on_unique_pairs(spark):
    # every word is a distinct single char -> no pair reaches freq 2
    docs = _corpus(spark, [("a", 1), ("b", 1), ("c", 1)])
    assert bpe_train(docs, 5) == []


def test_vocab_weighting_and_determinism(spark):
    docs = _corpus(spark, [("ab", 3), ("cd", 2)])
    v = {r["word"]: r["weight"] for r in word_vocab(docs).collect()}
    assert v == {"ab": 3, "cd": 2}
    m1 = bpe_train(docs, 3)
    m2 = bpe_train(docs, 3)
    assert m1 == m2 == [("a", "b", 3), ("ab", END, 3), ("c", "d", 2)]


def test_bpe_encode_counts(spark):
    docs = _corpus(spark, [("low", 5), ("lower", 2), ("newest", 6), ("widest", 3)])
    merges = bpe_train(docs, 5)
    from shifts_etl_spark.operators.bpe import bpe_encode_counts

    out = {r["doc_id"]: r for r in bpe_encode_counts(docs, merges).collect()}
    # after es/est/est▁/lo/low: "low" -> [low, ▁] = 2 pieces;
    # "newest" -> [n, e, w, est▁] = 4; "lower" -> [low, e, r, ▁] = 4
    # (the lo/low merges fire inside "lower" too); "widest" -> 4
    by_word = {"low": 2, "lower": 4, "newest": 4, "widest": 4}
    i = 0
    for w, c in [("low", 5), ("lower", 2), ("newest", 6), ("widest", 3)]:
        for _ in range(c):
            r = out[i]
            assert r["n_words"] == 1 and r["n_pieces"] == by_word[w], (w, dict(r.asDict()))
            i += 1
