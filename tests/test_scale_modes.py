"""100 TB modes for the block-quadratic family (docs/SCALE.md round-6
tail): auto-sized kNN vote buckets (occupancy fixed at
~target_bucket_rows, so pair work grows linearly with the corpus),
fixed-count sampled IVF centroids (assignment stays |corpus| × n_cells),
and the LSH-band-blocked embedding NN (bucket-geometry-bounded pair
work). Since round 8 these ARE the operator defaults (VERDICT r7 #3);
the tests pin the paths under explicit args either way.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from shifts_etl_spark.operators.curation import _hex_uniform_int
from shifts_etl_spark.operators.profile import (
    _knn_votes,
    knn_classifier_report,
    retrieval_exposure,
)
from shifts_etl_spark.operators.simsearch import ivf_probe_sweep

SF_DIR = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def emb(spark):
    df = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    df.persist().count()
    return df


def test_auto_buckets_bound_occupancy(spark, emb):
    n = emb.count()
    target = 64
    votes = _knn_votes(emb, k=3, n_buckets=None, target_bucket_rows=target)
    # every node emits at most k edges
    over = votes.groupBy("vec_id").count().where(F.col("count") > 3).count()
    assert over == 0
    # occupancy bound: recompute the same md5 buckets with the derived
    # bucket count; max occupancy stays within 2x the target (md5 uniform)
    n_buckets = max(1, -(-n // target))
    occ = (
        emb.select(
            (
                _hex_uniform_int(
                    F.concat(F.col("vec_id").cast("string"), F.lit("-knb"))
                )
                % n_buckets
            ).alias("blk")
        )
        .groupBy("blk")
        .count()
    )
    assert occ.agg(F.max("count")).collect()[0][0] <= 2 * target
    # and the bucket count actually scales with N, not a constant 16
    assert n_buckets == -(-n // target) and n_buckets > 1


def test_auto_buckets_same_contract_as_fixed(emb):
    auto = _knn_votes(emb, k=3, n_buckets=None, target_bucket_rows=64)
    fixed = _knn_votes(emb, k=3, n_buckets=16)
    assert auto.columns == fixed.columns
    # both modes produce edges for (almost) every vector; auto mode's
    # smaller buckets may strand a vector alone only in tiny corpora
    n = emb.count()
    assert auto.select("vec_id").distinct().count() >= n * 0.9
    assert fixed.select("vec_id").distinct().count() >= n * 0.9


def test_report_and_exposure_accept_auto_mode(emb):
    rep = knn_classifier_report(emb, k=3, n_buckets=None)
    rows = rep.where(F.col("label").isNotNull()).collect()
    assert rows
    n = emb.count()
    assert sum(r.support for r in rows) == n
    for r in rows:
        for m in ("precision", "recall", "f1"):
            v = r[m]
            assert v is None or 0.0 <= v <= 1.0
    expo = retrieval_exposure(emb, k=3, n_buckets=None).collect()
    assert expo
    assert abs(sum(r.exposure_share for r in expo) - 1.0) < 1e-6


def test_ivf_fixed_cells_full_probe_is_exact(spark, emb):
    """With n_cells fixed and n_probe == n_cells every cell is probed,
    so the sweep's last point must be the exact scan: candidates =
    corpus-1 and recall = 1 for every query."""
    qids = [r.vec_id for r in emb.select("vec_id").orderBy("vec_id").limit(3).collect()]
    n = emb.count()
    out = ivf_probe_sweep(
        emb, qids, k=3, probes=(1, 2, 4), n_cells=4
    ).collect()
    by_probe = {}
    for r in out:
        by_probe.setdefault(r.n_probe, []).append(r)
    assert set(by_probe) == {1, 2, 4}
    for r in by_probe[4]:
        assert r.n_candidates == n - 1
        assert r.recall == 1.0
    # recall and candidate count are monotone in n_probe per query
    for q in qids:
        seq = [r for r in out if r.query_id == q]
        seq.sort(key=lambda r: r.n_probe)
        recalls = [r.recall for r in seq]
        cands = [r.n_candidates for r in seq]
        assert recalls == sorted(recalls)
        assert cands == sorted(cands)


def test_label_agreement_auto_mode(emb):
    from shifts_etl_spark.operators.profile import knn_label_agreement

    rows = knn_label_agreement(emb, n_buckets=None).collect()
    assert rows
    for r in rows:
        assert 0.0 <= r.agreement <= 1.0
        assert r.n_agree <= r.n_vectors


def test_embedding_nn_lsh_planted_neardup(spark):
    """Two nearly-identical vectors share every sign-LSH band bucket, so
    each picks the other as its approximate NN and the near-dup flag
    fires at cosine ~1; the pair survives any label blocking because
    LSH mode ignores labels entirely."""
    from pyspark.sql import Row

    from shifts_etl_spark.operators.dedup import embedding_nn_pairs_lsh

    rows = [
        Row(vec_id=1, embedding=[1.0, 0.0, 0.0, 0.0], label=0),
        Row(vec_id=2, embedding=[1.0, 0.001, 0.0, 0.0], label=1),
        Row(vec_id=3, embedding=[0.0, 0.0, 1.0, 0.0], label=0),
    ]
    out = {
        r.vec_id: r
        for r in embedding_nn_pairs_lsh(
            spark.createDataFrame(rows), dim=4
        ).collect()
    }
    assert out[1].neighbor_id == 2 and out[1].is_near_dup
    assert out[2].neighbor_id == 1 and out[2].is_near_dup
    assert out[1].cosine >= 0.999


def test_embedding_nn_lsh_hot_bucket_cap(spark):
    """Buckets hotter than the cap drop out of candidate generation (the
    x3 convention): five identical vectors fill every one of their band
    buckets past cap=3 and vanish from the output, while a small
    near-dup pair in other buckets is unaffected."""
    from pyspark.sql import Row

    from shifts_etl_spark.operators.dedup import embedding_nn_pairs_lsh

    pile = [
        Row(vec_id=i, embedding=[1.0, 1.0, 0.0, 0.0], label=0)
        for i in range(1, 6)
    ]
    pair = [
        Row(vec_id=10, embedding=[-1.0, 0.0, -1.0, 0.0], label=0),
        Row(vec_id=11, embedding=[-1.0, 0.001, -1.0, 0.0], label=0),
    ]
    out = {
        r.vec_id: r
        for r in embedding_nn_pairs_lsh(
            spark.createDataFrame(pile + pair), dim=4, hot_bucket_cap=3
        ).collect()
    }
    assert not any(v in out for v in range(1, 6))
    assert out[10].neighbor_id == 11 and out[10].is_near_dup
    assert out[11].neighbor_id == 10 and out[11].is_near_dup
