"""Round-3 operators: stupid-backoff bigram LM, hard-negative mining,
embedding covariance, cross-split n-gram contamination."""

import hashlib
import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from shifts_etl_spark.operators.dedup import split_ngram_contamination
from shifts_etl_spark.operators.profile import embedding_covariance
from shifts_etl_spark.operators.simsearch import hard_negative_topk
from shifts_etl_spark.operators.textstats import (
    backoff_bigram_logprob,
    positioned_bigrams,
)


# ----------------------------------------------------------------- y1 ----

def test_positioned_bigrams_order_and_short_docs(spark):
    docs = spark.createDataFrame(
        [(1, "a b c"), (2, "solo"), (3, ""), (4, None)],
        "doc_id long, text string",
    )
    rows = sorted(
        (r.doc_id, r.w1, r.w2) for r in positioned_bigrams(docs).collect()
    )
    # only doc 1 has transitions; order a->b, b->c
    assert rows == [(1, "a", "b"), (1, "b", "c")]


def test_backoff_bigram_logprob_exact_values(spark):
    train = spark.createDataFrame(
        [(1, "a b c"), (2, "a b d")], "doc_id long, text string"
    )
    score = spark.createDataFrame(
        [(10, "a b zz")], "doc_id long, text string"
    )
    out = {r.doc_id: r for r in backoff_bigram_logprob(train, score).collect()}
    r = out[10]
    # train counts: c1(a)=2, c1(b)=2, c1(c)=1, c1(d)=1; N=6, V=4
    # (a,b): seen twice -> ln(2/2) = 0
    # (b,zz): unseen bigram, zz OOV -> ln(0.4 * (0+1)/(6+4))
    expected = (0.0 + math.log(0.4 * 1.0 / 10.0)) / 2
    assert r.n_transitions == 2
    assert r.n_backoff == 1
    assert r.mean_logscore == pytest.approx(round(expected, 4), abs=1e-9)


def test_backoff_never_fires_on_self_scored_corpus(spark):
    docs = spark.createDataFrame(
        [(1, "the quick brown fox"), (2, "the quick red fox")],
        "doc_id long, text string",
    )
    out = backoff_bigram_logprob(docs, docs).agg(
        F.sum("n_backoff").alias("nb")
    ).collect()[0]
    assert out.nb == 0


# ----------------------------------------------------------------- y2 ----

def test_hard_negative_topk_planted(spark):
    # all-positive sign pattern -> every vector lands in bucket 255
    base = [1.0] * 8
    near = [1.0, 1.0, 1.0, 1.0, 1.0, 1.0, 1.0, 0.9]
    far = [1.0, 0.2, 1.0, 0.1, 1.0, 0.3, 1.0, 0.2]
    emb = spark.createDataFrame(
        [
            (0, base, "pos"),
            (1, near, "neg"),  # hardest negative for 0
            (2, far, "neg"),
            (3, base, "pos"),  # same label as 0 -> never a negative for 0
        ],
        "vec_id long, embedding array<double>, label string",
    )
    out = hard_negative_topk(emb, k=2)
    rows = {(r.anchor_id, r.rank): r for r in out.collect()}
    assert rows[(0, 1)].neg_id == 1  # most similar cross-label first
    assert rows[(0, 2)].neg_id == 2
    # anchors never see same-label rows
    assert all(r.anchor_label != r.neg_label for r in rows.values())


def test_hard_negative_topk_bucket_blocks(spark):
    # opposite sign pattern -> different bucket -> no pair emitted
    emb = spark.createDataFrame(
        [
            (0, [1.0] * 8, "a"),
            (1, [-1.0] * 8, "b"),
        ],
        "vec_id long, embedding array<double>, label string",
    )
    assert hard_negative_topk(emb).count() == 0


# ----------------------------------------------------------------- y3 ----

def test_embedding_covariance_matches_numpy(spark):
    rng = np.random.default_rng(7)
    m = rng.normal(size=(40, 5))
    emb = spark.createDataFrame(
        [(i, [float(x) for x in m[i]]) for i in range(40)],
        "vec_id long, embedding array<double>",
    ).repartition(4)  # force multiple Arrow batches / partial merges
    out = {(r.i, r.j): r.cov for r in embedding_covariance(emb).collect()}
    expect = np.cov(m, rowvar=False, bias=True)  # population covariance
    assert len(out) == 5 * 6 // 2
    for (i, j), cov in out.items():
        assert cov == pytest.approx(round(expect[i, j], 6), abs=2e-6)


def test_embedding_covariance_empty_raises(spark):
    emb = spark.createDataFrame([], "vec_id long, embedding array<double>")
    with pytest.raises(ValueError):
        embedding_covariance(emb)


# ----------------------------------------------------------------- y4 ----

def _md5_split(doc_id: int) -> str:
    h = hashlib.md5(str(doc_id).encode()).hexdigest()
    b = (ord(h[0]) * 256 + ord(h[1])) % 100
    return "val" if b < 5 else "test" if b < 15 else "train"


def test_split_ngram_contamination_planted(spark):
    # find ids landing in train and in a held-out split
    train_id = next(i for i in range(1000) if _md5_split(i) == "train")
    held_id = next(i for i in range(1000) if _md5_split(i) != "train")
    clean_id = next(
        i for i in range(1000) if _md5_split(i) != "train" and i != held_id
    )
    shared_text = "one two three four five six seven"
    docs = spark.createDataFrame(
        [
            (train_id, shared_text),
            (held_id, shared_text),  # fully contaminated from train
            (clean_id, "alpha beta gamma delta epsilon zeta eta"),
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in split_ngram_contamination(docs).collect()}
    assert set(out) == {held_id, clean_id}  # train docs emit no rows
    assert out[held_id].shared_frac == 1.0
    assert out[held_id].contaminated
    assert out[clean_id].n_shared == 0
    assert not out[clean_id].contaminated
    assert out[held_id].split == _md5_split(held_id)


def test_split_ngram_contamination_zero_token_docs_absent(spark):
    held = [i for i in range(1000) if _md5_split(i) != "train"][:2]
    docs = spark.createDataFrame(
        [(held[0], "real words here right now"), (held[1], "!!! ...")],
        "doc_id long, text string",
    )
    out = split_ngram_contamination(docs)
    ids = {r.doc_id for r in out.collect()}
    assert held[0] in ids and held[1] not in ids
